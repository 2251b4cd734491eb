"""Page-range expression parsing: ``"1-3,5"`` → sorted unique page list.

Re-expresses /root/reference/backend/routes/ocr.py:85-103: comma-split,
``-`` ranges with endpoint swap when reversed, blank parts skipped,
result sorted and de-duplicated. Invalid tokens raise ValueError (the
reference converts this to an HTTP 400).
"""

from __future__ import annotations

from typing import List, Optional


def parse_page_ranges(expr: Optional[str]) -> Optional[List[int]]:
    if not expr:
        return None
    pages: List[int] = []
    for token in expr.split(","):
        token = token.strip()
        if not token:
            continue
        if "-" in token:
            lo, hi = (int(v) for v in token.split("-"))
            if lo > hi:
                lo, hi = hi, lo
            pages.extend(range(lo, hi + 1))
        else:
            pages.append(int(token))
    return sorted(set(pages))


def target_pages(requested: Optional[List[int]], page_count: int, is_pdf: bool) -> List[int]:
    """When a page list was requested, keep only its in-range members
    (possibly none); otherwise all pages for PDFs and [1] for images
    (/root/reference/backend/services/ocr_service.py:287-292)."""
    if requested:
        return [p for p in requested if 1 <= p <= page_count]
    return list(range(1, page_count + 1)) if is_pdf else [1]
