"""Anchor-text linearization — the flagship operator.

Re-expresses the reference's page linearization semantics
(/root/reference/packages/typhoon_ocr/typhoon_ocr/ocr_utils.py:149-250)
plus the image-input anchor (ocr_utils.py:502-506). Behavior matched:

- header line ``Page dimensions: {mediabox.x1:.1f}x{mediabox.y1:.1f}``
  (note: x1/y1, NOT width/height — differs for non-origin mediaboxes;
  copied as-is per SURVEY.md §7.5).
- budgets < 20 chars return the header alone (ocr_utils.py:153-154).
- images are merged first (elements.merge_image_elements), formatted
  ``[Image {x0:.0f}x{y0:.0f} to {x1:.0f}x{y1:.0f}]``; text runs whose
  ``strip()`` is empty are dropped, the rest cleaned
  (textops.cleanup_element_text) and formatted ``[{x:.0f}x{y:.0f}]text``.
- under budget: emit in extraction order, all images before all texts,
  NO sort (ocr_utils.py:185-191).
- over budget: coordinate-extreme "edge" elements are kept first
  (min/max of image x0/x1/y0/y1 and text x/y — up to 8 winners, by
  *value equality*, so value-duplicate elements all qualify), then the
  remaining pool is randomly shuffled and taken greedily while the
  budget holds, and the final selection is sorted by (x, y) ascending
  (ocr_utils.py:193-250).

Determinism convention (ours — the reference uses the global RNG and is
nondeterministic on this path, SURVEY.md §7.3): callers pass the rng
from ``truncation_rng(url, page)`` so oracle and engine shuffle
identically. ``rng=None`` reproduces the reference's use of the global
``random`` module.
"""

from __future__ import annotations

import hashlib
import random
from typing import List, Optional, Tuple

from .elements import ImageElement, PageReport, TextElement, merge_image_elements
from .textops import cleanup_element_text

DEFAULT_ANCHOR_BUDGET = 4000
_MIN_USEFUL_BUDGET = 20


def truncation_rng(url: str, page: int) -> random.Random:
    """Deterministic per-(url, page) RNG for the truncation shuffle.

    Seed = first 8 bytes (big-endian) of sha256("{url}|{page}"), a
    stable convention shared by fixture oracle and engine UDF.
    """
    digest = hashlib.sha256(f"{url}|{page}".encode("utf-8")).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def anchor_from_image_dims(width: float, height: float) -> str:
    """Whole-image anchor for raster inputs (ocr_utils.py:502-506)."""
    w, h = float(width), float(height)
    return f"Page dimensions: {w:.1f}x{h:.1f}\n[Image 0x0 to {w:.0f}x{h:.0f}]\n"


def _image_line(img: ImageElement) -> str:
    b = img.bbox
    return f"[Image {b.x0:.0f}x{b.y0:.0f} to {b.x1:.0f}x{b.y1:.0f}]\n"


def _text_line(el: TextElement) -> str:
    return f"[{el.x:.0f}x{el.y:.0f}]{cleanup_element_text(el.text)}\n"


def linearize_page(
    report: PageReport,
    max_length: int = DEFAULT_ANCHOR_BUDGET,
    rng: Optional[random.Random] = None,
) -> str:
    header = f"Page dimensions: {report.mediabox.x1:.1f}x{report.mediabox.y1:.1f}\n"
    if max_length < _MIN_USEFUL_BUDGET:
        return header

    merged_images = merge_image_elements(report.image_elements)

    # Renderable pool: (element, line, (sort_x, sort_y)) — images first,
    # then non-blank texts, both in extraction order.
    pool: List[Tuple[object, str, Tuple[float, float]]] = []
    for img in merged_images:
        pool.append((img, _image_line(img), (img.bbox.x0, img.bbox.y0)))
    for el in report.text_elements:
        if not el.text.strip():
            continue
        pool.append((el, _text_line(el), (el.x, el.y)))

    if len(header) + sum(len(line) for _, line, _ in pool) <= max_length:
        return header + "".join(line for _, line, _ in pool)

    # --- over budget: edge-element priority + seeded random fill ---
    edge_winners: set = set()
    if merged_images:
        edge_winners.add(min(merged_images, key=lambda e: e.bbox.x0))
        edge_winners.add(max(merged_images, key=lambda e: e.bbox.x1))
        edge_winners.add(min(merged_images, key=lambda e: e.bbox.y0))
        edge_winners.add(max(merged_images, key=lambda e: e.bbox.y1))
    nonblank_texts = [e for e in report.text_elements if e.text.strip()]
    if nonblank_texts:
        edge_winners.add(min(nonblank_texts, key=lambda e: e.x))
        edge_winners.add(max(nonblank_texts, key=lambda e: e.x))
        edge_winners.add(min(nonblank_texts, key=lambda e: e.y))
        edge_winners.add(max(nonblank_texts, key=lambda e: e.y))

    # Identity (not value) tracking of what's been taken, so value-equal
    # duplicates of an edge winner each get selected once — matching the
    # reference's `elem in set` + `id(elem)` bookkeeping
    # (ocr_utils.py:212-227) with list positions as identities.
    taken_idx: set = set()
    selection: List[Tuple[int, str, Tuple[float, float]]] = []
    for idx, (elem, line, pos) in enumerate(pool):
        if elem in edge_winners and idx not in taken_idx:
            selection.append((idx, line, pos))
            taken_idx.add(idx)

    used = len(header) + sum(len(line) for _, line, _ in selection)

    rest = [(idx, line, pos) for idx, (elem, line, pos) in enumerate(pool) if idx not in taken_idx]
    (rng.shuffle if rng is not None else random.shuffle)(rest)

    for idx, line, pos in rest:
        if used + len(line) > max_length:
            break
        selection.append((idx, line, pos))
        taken_idx.add(idx)
        used += len(line)

    # Stable sort by (x, y); ties keep selection order (edge elements in
    # pool order first, then shuffled fills) — same as the reference.
    selection.sort(key=lambda item: (item[2][0], item[2][1]))
    return header + "".join(line for _, line, _ in selection)
