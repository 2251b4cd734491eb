"""Linearization + merge + anchor goldens.

Ports the reference's assertions from
/root/reference/backend/tests/test_pdf_processing.py (TestLinearizePdfReport)
and test_unit_ocr_utils.py (anchor-from-image), plus determinism checks
for the seeded truncation path (our convention, SURVEY.md §7.5).
"""

import random

from typhoon_ocr_spark.oracle import (
    BoundingBox,
    ImageElement,
    PageReport,
    TextElement,
    anchor_from_image_dims,
    linearize_page,
    merge_image_elements,
    truncation_rng,
)
from typhoon_ocr_spark.oracle.elements import mat_mult, transform_point


def _report(texts=(), images=(), mediabox=BoundingBox(0, 0, 612, 792)):
    return PageReport(mediabox=mediabox, text_elements=list(texts), image_elements=list(images))


class TestLinearize:
    def test_empty_report(self):
        out = linearize_page(_report())
        assert "Page dimensions: 612.0x792.0" in out
        assert len(out) < 100

    def test_text_elements(self):
        out = linearize_page(
            _report(texts=[TextElement("Hello", 100, 200), TextElement("World", 100, 220)])
        )
        assert "Page dimensions: 612.0x792.0" in out
        assert "[100x200]Hello" in out
        assert "[100x220]World" in out

    def test_image_elements(self):
        out = linearize_page(_report(images=[ImageElement("img1", BoundingBox(50, 60, 150, 160))]))
        assert "[Image 50x60 to 150x160]" in out

    def test_budget_truncation(self):
        texts = [TextElement(f"Text{i}", i * 10, i * 10) for i in range(100)]
        out = linearize_page(_report(texts=texts), max_length=100, rng=random.Random(7))
        assert len(out) <= 100
        assert "Page dimensions" in out

    def test_mixed_elements(self):
        out = linearize_page(
            _report(
                texts=[TextElement("Text1", 200, 200), TextElement("Text2", 100, 100)],
                images=[ImageElement("img1", BoundingBox(150, 150, 250, 250))],
            )
        )
        assert "[100x100]Text2" in out
        assert "[Image 150x150 to 250x250]" in out
        assert "[200x200]Text1" in out

    def test_under_budget_order_is_extraction_order_images_first(self):
        # under budget there is NO sort (ocr_utils.py:185-191)
        out = linearize_page(
            _report(
                texts=[TextElement("zz", 500, 500), TextElement("aa", 1, 1)],
                images=[ImageElement("im", BoundingBox(300, 300, 310, 310))],
            )
        )
        lines = out.splitlines()
        assert lines[1].startswith("[Image")
        assert lines[2] == "[500x500]zz"
        assert lines[3] == "[1x1]aa"

    def test_over_budget_sorted_and_edges_kept(self):
        texts = [TextElement(f"t{i:03d}", float(i), float(1000 - i)) for i in range(200)]
        out = linearize_page(_report(texts=texts), max_length=400, rng=random.Random(3))
        assert len(out) <= 400
        # edge winners by x and y must be present
        assert "[0x1000]t000" in out
        assert "[199x801]t199" in out
        body = out.splitlines()[1:]
        xs = [int(line[1:].split("x", 1)[0]) for line in body]
        assert xs == sorted(xs)

    def test_tiny_budget_returns_header_only(self):
        out = linearize_page(_report(texts=[TextElement("abc", 1, 2)]), max_length=19)
        assert out == "Page dimensions: 612.0x792.0\n"

    def test_blank_text_filtered(self):
        out = linearize_page(_report(texts=[TextElement("   ", 5, 5), TextElement("ok", 6, 6)]))
        assert "[5x5]" not in out
        assert "[6x6]ok" in out

    def test_seeded_determinism(self):
        texts = [TextElement(f"t{i}", float(i % 17), float(i % 13)) for i in range(300)]
        a = linearize_page(_report(texts=texts), 500, truncation_rng("u", 1))
        b = linearize_page(_report(texts=texts), 500, truncation_rng("u", 1))
        c = linearize_page(_report(texts=texts), 500, truncation_rng("u", 2))
        assert a == b
        assert a != c  # different page seed → different fill selection

    def test_nonorigin_mediabox_header_uses_x1_y1(self):
        # header is x1/y1, not width/height (ocr_utils.py:151; SURVEY §7.5)
        out = linearize_page(_report(mediabox=BoundingBox(-50, -100, 562, 692)))
        assert out.startswith("Page dimensions: 562.0x692.0\n")


class TestMergeImages:
    def test_overlapping_merge(self):
        merged = merge_image_elements(
            [
                ImageElement("a", BoundingBox(0, 0, 10, 10)),
                ImageElement("b", BoundingBox(10.4, 0, 20, 10)),  # within 0.5pt
                ImageElement("c", BoundingBox(100, 100, 110, 110)),
            ]
        )
        assert len(merged) == 2
        names = {m.name for m in merged}
        assert "a+b" in names and "c" in names
        ab = next(m for m in merged if m.name == "a+b")
        assert (ab.bbox.x0, ab.bbox.y0, ab.bbox.x1, ab.bbox.y1) == (0, 0, 20, 10)

    def test_disjoint_untouched(self):
        imgs = [
            ImageElement("a", BoundingBox(0, 0, 1, 1)),
            ImageElement("b", BoundingBox(5, 5, 6, 6)),
        ]
        assert merge_image_elements(imgs) == imgs

    def test_transitive_chain(self):
        merged = merge_image_elements(
            [
                ImageElement("a", BoundingBox(0, 0, 10, 10)),
                ImageElement("b", BoundingBox(10, 0, 20, 10)),
                ImageElement("c", BoundingBox(20, 0, 30, 10)),
            ]
        )
        assert len(merged) == 1
        assert merged[0].name == "a+b+c"
        assert merged[0].bbox == BoundingBox(0, 0, 30, 10)


class TestGeometry:
    def test_transform_point_translation(self):
        assert transform_point(0, 0, [1, 0, 0, 1, 100, 200]) == (100, 200)

    def test_transform_point_scale(self):
        assert transform_point(1, 1, [100, 0, 0, 50, 10, 20]) == (110, 70)

    def test_mat_mult_identity(self):
        m = [2, 0, 0, 3, 5, 7]
        assert mat_mult(m, [1, 0, 0, 1, 0, 0]) == m
        assert mat_mult([1, 0, 0, 1, 0, 0], m) == m

    def test_mat_mult_composition_matches_pointwise(self):
        m = [2, 0.5, -1, 3, 5, 7]
        n = [0.5, 0, 0, 2, -3, 4]
        composed = mat_mult(m, n)
        for x, y in [(0, 0), (1, 1), (-2, 3.5)]:
            step = transform_point(*transform_point(x, y, m), n)
            direct = transform_point(x, y, composed)
            assert abs(step[0] - direct[0]) < 1e-9
            assert abs(step[1] - direct[1]) < 1e-9


class TestAnchorFromImage:
    def test_reference_goldens(self):
        out = anchor_from_image_dims(1920, 1080)
        assert "Page dimensions: 1920.0x1080.0" in out
        assert "[Image 0x0 to 1920x1080]" in out

    def test_small(self):
        out = anchor_from_image_dims(10, 5)
        assert "10.0x5.0" in out and "10x5" in out
