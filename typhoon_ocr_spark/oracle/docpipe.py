"""Per-document extraction oracle: payload bytes → kind, pages, text.

This is the single-document, pure-Python definition of what the Spark
pipeline must produce per url — the fixture generator computes
``expected`` tables with it, and the engine's pandas UDFs call the same
underlying functions, making the byte-identical anti-join meaningful.

Routing replaces the reference's extension dispatch
(/root/reference/packages/typhoon_ocr/typhoon_ocr/ocr_utils.py:562-563)
with content sniffing (magic bytes), since the engine's input is a
binary column, not a filename. Assembly joins page texts with "\n\n"
in page order (/root/reference/app.py:581).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

from .htmlstrip import strip_html_boilerplate
from .images import image_dimensions, sniff_image_kind
from .linearize import (
    DEFAULT_ANCHOR_BUDGET,
    anchor_from_image_dims,
    linearize_page,
    truncation_rng,
)
from .pdfmini import parse_pdf
from .tables import detect_table

KIND_PDF = "pdf"
KIND_HTML = "html"
KIND_IMAGE = "image"
KIND_JUNK = "junk"

_SNIFF_WINDOW = 256


def sniff_kind(payload: Optional[Union[bytes, bytearray]]) -> str:
    """Route a raw payload: %PDF- magic → pdf; PNG/JPEG/GIF/WebP magic
    → image (the reference's raster allowlist, routes/ocr.py:75-82);
    leading '<' after a lossy utf-8 decode of the first 256 bytes
    (whitespace allowed) → html; anything else → junk."""
    if not payload:
        return KIND_JUNK
    head = bytes(payload[:_SNIFF_WINDOW])
    if head.startswith(b"%PDF-"):
        return KIND_PDF
    if sniff_image_kind(head) is not None:
        return KIND_IMAGE
    text_head = head.decode("utf-8", errors="replace").lstrip()
    if text_head.startswith("<"):
        return KIND_HTML
    return KIND_JUNK


@dataclass
class PageResult:
    page: int
    anchor_text: Optional[str]
    text: str
    success: bool
    error: Optional[str]
    table_md: Optional[str] = None  # deterministic table-cell grouping (pdf pages)


@dataclass
class DocResult:
    url: str
    kind: str
    pages: List[PageResult]
    extracted_text: str
    page_count: int
    success: bool


def extract_document(
    url: str,
    payload: Optional[bytes],
    anchor_budget: int = DEFAULT_ANCHOR_BUDGET,
) -> DocResult:
    kind = sniff_kind(payload)

    if kind == KIND_HTML:
        text = strip_html_boilerplate(payload)
        pages = [PageResult(1, None, text, True, None)]
    elif kind == KIND_IMAGE:
        # Whole-image anchor from the header dimensions — the raster
        # analog of the reference's image_to_pdf → get_anchor_text_from_
        # image path (ocr_utils.py:502-506, 562-579).
        try:
            w, h = image_dimensions(payload)
            anchor = anchor_from_image_dims(w, h)
            pages = [PageResult(1, anchor, anchor, True, None)]
        except Exception as exc:
            pages = [PageResult(1, None, "", False, f"Error processing document: {exc}")]
    elif kind == KIND_PDF:
        try:
            reports = parse_pdf(payload)
            pages = []
            for idx, report in enumerate(reports, start=1):
                anchor = linearize_page(
                    report, max_length=anchor_budget, rng=truncation_rng(url, idx)
                )
                table = detect_table(report.text_elements)
                pages.append(PageResult(idx, anchor, anchor, True, None, table))
            if not pages:
                pages = [PageResult(1, None, "", False, "empty pdf")]
        except Exception as exc:  # error → failed row, never an exception
            # (mirrors /root/reference/backend/services/ocr_service.py:254-262)
            pages = [PageResult(1, None, "", False, f"Error processing document: {exc}")]
    else:
        pages = [PageResult(1, None, "", False, "unsupported payload")]

    ok_pages = [p for p in pages if p.success]
    extracted = "\n\n".join(p.text for p in sorted(ok_pages, key=lambda p: p.page))
    return DocResult(
        url=url,
        kind=kind,
        pages=pages,
        extracted_text=extracted,
        page_count=len(pages),
        success=all(p.success for p in pages),
    )
