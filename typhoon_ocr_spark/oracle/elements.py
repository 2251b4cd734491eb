"""Page-layout element model + geometry primitives.

Matches the reference's data model and merge semantics (cited, not
copied):
- element dataclasses: /root/reference/packages/typhoon_ocr/typhoon_ocr/
  ocr_utils.py:25-59
- affine point transform / 6-float matrix product: ocr_utils.py:343-356
- overlapping-image merge (union-find, 0.5pt tolerance, envelope bbox,
  "+"-joined names, first-seen-root group order): ocr_utils.py:278-341
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

MERGE_TOLERANCE_PT = 0.5


@dataclass(frozen=True)
class BoundingBox:
    x0: float
    y0: float
    x1: float
    y1: float


@dataclass(frozen=True)
class TextElement:
    text: str
    x: float
    y: float


@dataclass(frozen=True)
class ImageElement:
    name: str
    bbox: BoundingBox


@dataclass(frozen=True)
class PageReport:
    mediabox: BoundingBox
    text_elements: List[TextElement]
    image_elements: List[ImageElement]


def transform_point(x: float, y: float, m: Sequence[float]) -> tuple:
    """Apply a PDF 6-float affine matrix to a point (ocr_utils.py:343-346).

    Row-vector convention: (x', y') = (x, y, 1) · [[a b][c d][e f]].
    """
    return (m[0] * x + m[2] * y + m[4], m[1] * x + m[3] * y + m[5])


def mat_mult(m: Sequence[float], n: Sequence[float]) -> list:
    """Compose two 6-float affine matrices: apply ``m`` first, then ``n``
    (ocr_utils.py:348-356)."""
    a, b, c, d, e, f = m
    p, q, r, s, t, u = n
    return [
        a * p + b * r,
        a * q + b * s,
        c * p + d * r,
        c * q + d * s,
        e * p + f * r + t,
        e * q + f * s + u,
    ]


def _boxes_near(b1: BoundingBox, b2: BoundingBox, tol: float) -> bool:
    # Gap between the boxes along each axis; 0 when they overlap.
    gap_x = max(0.0, max(b1.x0, b2.x0) - min(b1.x1, b2.x1))
    gap_y = max(0.0, max(b1.y0, b2.y0) - min(b1.y1, b2.y1))
    return gap_x <= tol and gap_y <= tol


def merge_image_elements(
    images: Sequence[ImageElement], tolerance: float = MERGE_TOLERANCE_PT
) -> List[ImageElement]:
    """Merge images whose bboxes touch within ``tolerance`` points into
    envelope boxes with "+"-joined names (ocr_utils.py:278-341).

    Group ordering follows the reference exactly: connected components
    via union-find over all pairs, groups emitted in order of the first
    member index whose root is first seen when scanning i = 0..n-1, and
    within a group members keep ascending index order (so the envelope
    grows and the name joins in index order).
    """
    n = len(images)
    root = list(range(n))

    def find(i: int) -> int:
        r = i
        while root[r] != r:
            r = root[r]
        # path compression
        while root[i] != i:
            root[i], i = r, root[i]
        return r

    for i in range(n):
        for j in range(i + 1, n):
            if _boxes_near(images[i].bbox, images[j].bbox, tolerance):
                ri, rj = find(i), find(j)
                if ri != rj:
                    root[ri] = rj

    groups: dict = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)

    merged: List[ImageElement] = []
    for members in groups.values():
        first = images[members[0]]
        x0, y0, x1, y1 = first.bbox.x0, first.bbox.y0, first.bbox.x1, first.bbox.y1
        name = first.name
        for idx in members[1:]:
            b = images[idx].bbox
            x0, y0 = min(x0, b.x0), min(y0, b.y0)
            x1, y1 = max(x1, b.x1), max(y1, b.y1)
            name = f"{name}+{images[idx].name}"
        merged.append(ImageElement(name=name, bbox=BoundingBox(x0, y0, x1, y1)))
    return merged
