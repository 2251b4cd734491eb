"""Table-cell grouping: positioned text runs → markdown tables.

The north star names "table-cell grouping into markdown tables" as
part of the layout parse. The reference gets its markdown tables from
the LLM (the `default` prompt demands them, ocr_utils.py:403-407) —
its deterministic path has no table detector — so this module is the
engine's own deterministic rendering of that capability over the same
PageReport IR the anchor linearization consumes.

Algorithm (deterministic, tolerance-based grid clustering):
1. cluster non-blank text runs into ROWS by y (descending = reading
   order) with ``y_tol``;
2. cluster run x-origins into COLUMNS with ``x_tol`` across all rows;
3. accept the grid as a table when it has >= ``min_rows`` rows,
   >= ``min_cols`` columns, and cell fill ratio >= ``min_fill``
   (sparse scatter plots of text are NOT tables);
4. emit GitHub markdown: first row is the header, cells joined with
   a space when several runs land in one cell, '|' escaped.

Same function feeds the fixture goldens and the Spark UDF, keeping the
byte-identical gate meaningful.
"""

from __future__ import annotations

from bisect import bisect_left

from typing import List, Optional, Sequence, Tuple

from .elements import TextElement
from .textops import cleanup_element_text

Y_TOL = 3.0
X_TOL = 3.0
MIN_ROWS = 2
MIN_COLS = 2
MIN_FILL = 0.6


def _cluster(values: Sequence[float], tol: float) -> List[float]:
    """1-D single-linkage clustering; returns sorted cluster centers
    (means). Deterministic: values sorted, split where gap > tol."""
    if not values:
        return []
    ordered = sorted(values)
    centers: List[float] = []
    start = 0
    for i in range(1, len(ordered) + 1):
        if i == len(ordered) or ordered[i] - ordered[i - 1] > tol:
            group = ordered[start:i]
            centers.append(sum(group) / len(group))
            start = i
    return centers


def _nearest(centers: List[float], v: float) -> int:
    # centers are sorted ascending: binary-search the insertion point
    # and compare the two neighbors (ties keep the lower index, same
    # as the previous linear scan's strict-< update rule)
    i = bisect_left(centers, v)
    if i == 0:
        return 0
    if i == len(centers):
        return i - 1
    return i - 1 if v - centers[i - 1] <= centers[i] - v else i


def detect_table(
    texts: Sequence[TextElement],
    y_tol: float = Y_TOL,
    x_tol: float = X_TOL,
    min_rows: int = MIN_ROWS,
    min_cols: int = MIN_COLS,
    min_fill: float = MIN_FILL,
) -> Optional[str]:
    """Markdown table from positioned runs, or None when the page's
    runs don't form a grid."""
    runs = [t for t in texts if t.text.strip()]
    if len(runs) < min_rows * min_cols:
        return None

    row_centers = _cluster([t.y for t in runs], y_tol)       # ascending y
    col_centers = _cluster([t.x for t in runs], x_tol)       # ascending x
    n_rows, n_cols = len(row_centers), len(col_centers)
    if n_rows < min_rows or n_cols < min_cols:
        return None

    grid: List[List[List[Tuple[float, str]]]] = [
        [[] for _ in range(n_cols)] for _ in range(n_rows)
    ]
    for t in runs:
        r = _nearest(row_centers, t.y)
        c = _nearest(col_centers, t.x)
        grid[r][c].append((t.x, t.text))

    filled = sum(1 for row in grid for cell in row if cell)
    if filled / (n_rows * n_cols) < min_fill:
        return None

    def render_cell(cell: List[Tuple[float, str]]) -> str:
        cell.sort(key=lambda item: item[0])
        joined = " ".join(cleanup_element_text(text) for _, text in cell)
        return joined.replace("|", "\\|").strip()

    # rows in reading order: descending y (PDF origin is bottom-left)
    lines: List[str] = []
    for r in range(n_rows - 1, -1, -1):
        cells = [render_cell(grid[r][c]) for c in range(n_cols)]
        lines.append("| " + " | ".join(cells) + " |")
        if len(lines) == 1:
            lines.append("|" + "---|" * n_cols)
    return "\n".join(lines)
