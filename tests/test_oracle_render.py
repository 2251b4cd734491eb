"""Page rasterization (oracle/render.py): real PNGs of page layout."""

import base64

from typhoon_ocr_spark.oracle.images import decode_png
from typhoon_ocr_spark.oracle.pdfmini import MiniPdfWriter, parse_pdf
from typhoon_ocr_spark.oracle.render import (
    IMAGE_FILL,
    TEXT_FILL,
    render_page_bitmap,
    render_page_to_png,
    render_pdf_to_base64png,
)


def _page(with_image=False):
    w = MiniPdfWriter().add_page((0, 0, 400, 200)).text(100, 100, "hello")
    if with_image:
        w.image("Im1", 200, 20, 300, 80)
    return parse_pdf(w.build())[0]


def test_bitmap_dims_follow_target_and_aspect():
    w, h, px = render_page_bitmap(_page(), target_longest=200)
    assert (w, h) == (200, 100)
    assert len(px) == 200 * 100


def test_text_box_lands_where_the_run_is():
    report = _page()
    w, h, px = render_page_bitmap(report, target_longest=400)  # scale 1.0
    # text at (100,100) in a 400x200 page, glyph cell 5 chars * 6pt x 12pt
    # → raster rows h-112..h-100, cols 100..130
    def at(x, y):
        return px[y * w + x]
    assert at(105, h - 105) == TEXT_FILL
    assert at(50, 50) == 0xFF  # background white
    assert at(350, h - 105) == 0xFF


def test_image_box_fill_distinct_from_text():
    report = _page(with_image=True)
    w, h, px = render_page_bitmap(report, target_longest=400)
    assert px[(h - 50) * w + 250] == IMAGE_FILL


def test_png_round_trips_through_own_decoder():
    report = _page(with_image=True)
    png = render_page_to_png(report, target_longest=256)
    gw, gh, channels, pixels = decode_png(png)
    assert channels == 1
    _, _, raw = render_page_bitmap(report, target_longest=256)
    assert pixels == raw  # encode→decode is lossless


def test_base64_api_shape_and_determinism():
    w = MiniPdfWriter()
    w.add_page().text(72, 700, "page one")
    # glyphless layout render: page 2 must differ in LAYOUT (position/
    # length), not just characters, to produce different pixels
    w.add_page().text(200, 300, "page two with a longer run")
    data = w.build(compress=True)
    b64a = render_pdf_to_base64png(data, 1)
    b64b = render_pdf_to_base64png(data, 1)
    assert b64a == b64b
    assert base64.b64decode(b64a).startswith(b"\x89PNG")
    assert render_pdf_to_base64png(data, 2) != b64a
