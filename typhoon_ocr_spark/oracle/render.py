"""Page rasterization: PageReport layout → real grayscale PNG.

The reference renders pages to base64 PNG for the LLM via pdftoppm/
pypdfium (`render_pdf_to_base64png`, ocr_utils.py:119-146) using the
resolution formula ``target_longest * 72 / longest_dim``. No system
font stack exists in this sandbox, so text runs rasterize through the
engine's builtin deterministic 5x7 bitmap face (oracle/font.py):
legible ASCII (distinct lowercase) plus a feature-schematic Thai face
covering U+0E01-U+0E5B with shaped combining marks — each character
draws its own glyph in a 6x12pt cell, so two pages that differ only in
text differ in pixels (the round-2 renderer drew runs as solid boxes —
equal-length runs were indistinguishable). Image
placements render as gray boxes; background is white. Swap in pypdfium
for typographically-true output; every byte after the bitmap (PNG
encode, base64, prompt assembly) is production-real.

Deterministic: integer box math, fixed fill values, filter-None PNG.
"""

from __future__ import annotations

import base64
from typing import Tuple

from .elements import PageReport
from .font import (
    GLYPH_COLS,
    GLYPH_ROWS,
    glyph_rows,
    is_combining_above,
    is_combining_below,
)
from .images import encode_png_gray
from .pdfmini import parse_pdf

# sandbox-scale default; the reference uses 2048+ (ocr_utils.py:138) —
# same formula, 16x the pixels. Dial, not semantics.
DEFAULT_TARGET_LONGEST = 512

TEXT_FILL = 0x20
IMAGE_FILL = 0x80
GLYPH_W_PT = 6.0   # estimated advance per char (12pt font, avg 0.5em)
GLYPH_H_PT = 12.0


def render_page_bitmap(
    report: PageReport, target_longest: int = DEFAULT_TARGET_LONGEST
) -> Tuple[int, int, bytes]:
    """(width_px, height_px, grayscale pixels) for one page."""
    mb = report.mediabox
    page_w = max(mb.x1 - mb.x0, 1.0)
    page_h = max(mb.y1 - mb.y0, 1.0)
    scale = target_longest / max(page_w, page_h)
    width = max(int(page_w * scale), 1)
    height = max(int(page_h * scale), 1)
    canvas = bytearray(b"\xff" * (width * height))

    def fill(x0: float, y0: float, x1: float, y1: float, value: int) -> None:
        # PDF user space is y-up; raster rows are y-down
        px0 = max(int((x0 - mb.x0) * scale), 0)
        px1 = min(int((x1 - mb.x0) * scale), width)
        py0 = max(int(height - (y1 - mb.y0) * scale), 0)
        py1 = min(int(height - (y0 - mb.y0) * scale), height)
        if px1 <= px0 or py1 <= py0:
            return
        row = bytes([value]) * (px1 - px0)
        for py in range(py0, py1):
            base = py * width
            canvas[base + px0 : base + px1] = row

    for img in report.image_elements:
        b = img.bbox
        fill(b.x0, b.y0, b.x1, b.y1, IMAGE_FILL)

    # glyph rasterization: each char's 5x7 bitmap stretches over its
    # 6x12pt cell; rows are y-up (font row 0 = TOP of the cell). Thai
    # combining marks (above vowels / tone marks / below vowels) carry
    # ZERO advance and render over/under the preceding base cell — the
    # same shaping a real rasterizer applies.
    cell_w = GLYPH_W_PT / GLYPH_COLS
    cell_h = GLYPH_H_PT / GLYPH_ROWS

    def draw_glyph(ch: str, gx: float, gy: float) -> None:
        rows = glyph_rows(ch)
        for r in range(GLYPH_ROWS):
            bits = rows[r]
            if "1" not in bits:
                continue
            y0 = gy + (GLYPH_ROWS - 1 - r) * cell_h
            for c in range(GLYPH_COLS):
                if bits[c] == "1":
                    fill(
                        gx + c * cell_w,
                        y0,
                        gx + (c + 1) * cell_w,
                        y0 + cell_h,
                        TEXT_FILL,
                    )

    for el in report.text_elements:
        if not el.text.strip():
            continue
        pen = el.x
        for ch in el.text:
            if is_combining_above(ch):
                draw_glyph(ch, pen - GLYPH_W_PT, el.y + GLYPH_H_PT)
            elif is_combining_below(ch):
                draw_glyph(ch, pen - GLYPH_W_PT, el.y - GLYPH_H_PT)
            else:
                draw_glyph(ch, pen, el.y)
                pen += GLYPH_W_PT
    return width, height, bytes(canvas)


def render_page_to_png(
    report: PageReport, target_longest: int = DEFAULT_TARGET_LONGEST
) -> bytes:
    width, height, pixels = render_page_bitmap(report, target_longest)
    return encode_png_gray(width, height, pixels)


def render_pdf_to_base64png(
    pdf_bytes: bytes, page_num: int, target_longest: int = DEFAULT_TARGET_LONGEST
) -> str:
    """The reference's signature (ocr_utils.py:119-146): 1-indexed page
    of a PDF → base64-encoded PNG at the target resolution."""
    report = parse_pdf(pdf_bytes)[page_num - 1]
    return base64.b64encode(render_page_to_png(report, target_longest)).decode("ascii")


def page_ocr_message(
    url: str,
    report: PageReport,
    page_num: int,
    task_type: str = "default",
    anchor_budget: int = 4000,
) -> list:
    """The COMPLETE per-page LLM request envelope the reference builds
    (prepare_ocr_messages, ocr_utils.py:582-619): anchor text → prompt
    template + the page's base64 PNG render as the image part. Returns
    the message list (role/content structure byte-compatible with the
    reference's)."""
    from .linearize import linearize_page, truncation_rng
    from .prompts import build_messages, render_prompt

    anchor = linearize_page(report, anchor_budget, truncation_rng(url, page_num))
    prompt = render_prompt(task_type, anchor)
    image_b64 = base64.b64encode(render_page_to_png(report)).decode("ascii")
    return build_messages(prompt, image_b64)


def page_ocr_message_sha(url: str, report: PageReport, page_num: int) -> str:
    """sha256 of the canonical-JSON envelope — the compact fingerprint
    the correctness gate compares (the envelope itself embeds a
    multi-KB base64 image; goldens store 64 hex chars instead)."""
    import hashlib
    import json

    payload = json.dumps(
        page_ocr_message(url, report, page_num),
        ensure_ascii=False,
        separators=(",", ":"),
    )
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()
