"""Raster-image sniffing + header dimension parse (round 2).

Reference behavior: image files are first-class inputs
(/root/reference/backend/routes/ocr.py:75-82 allowlist; dispatch
ocr_utils.py:562-579) and their anchor is the whole-image frame
(get_anchor_text_from_image, ocr_utils.py:502-506).
"""

import pytest

from typhoon_ocr_spark.oracle.docpipe import extract_document, sniff_kind
from typhoon_ocr_spark.oracle.images import (
    ImageError,
    image_dimensions,
    sniff_image_kind,
    write_gif,
    write_jpeg,
    write_png,
    write_webp,
)

WRITERS = {
    "png": write_png,
    "jpeg": write_jpeg,
    "gif": write_gif,
    "webp": write_webp,
}


@pytest.mark.parametrize("kind,writer", sorted(WRITERS.items()))
def test_dims_round_trip(kind, writer):
    data = writer(321, 87, seed=7)
    assert sniff_image_kind(data) == kind
    assert image_dimensions(data) == (321, 87)


def test_webp_vp8l_and_vp8_lossy_variants():
    # VP8L: 14-bit minus-one dims packed little-endian after 0x2F
    bits = (199 - 1) | ((83 - 1) << 14)
    vp8l = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8L" + (9).to_bytes(4, "little")
    vp8l += bytes([0x2F]) + bits.to_bytes(4, "little") + bytes(4)
    assert image_dimensions(vp8l) == (199, 83)
    # classic lossy VP8: start code 9d 01 2a then 14-bit LE dims
    vp8 = b"RIFF" + (22).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (12).to_bytes(4, "little")
    vp8 += bytes(3) + b"\x9d\x01\x2a" + (640).to_bytes(2, "little") + (480).to_bytes(2, "little") + bytes(2)
    assert image_dimensions(vp8) == (640, 480)


def test_sniff_kind_routes_images():
    assert sniff_kind(write_png(10, 10)) == "image"
    assert sniff_kind(write_jpeg(10, 10)) == "image"
    assert sniff_kind(write_gif(10, 10)) == "image"
    assert sniff_kind(write_webp(10, 10)) == "image"
    # PDFs and HTML still route as before
    assert sniff_kind(b"%PDF-1.4 x") == "pdf"
    assert sniff_kind(b"<html></html>") == "html"


def test_extract_document_image_anchor():
    doc = extract_document("http://t/img", write_png(200, 150, seed=3))
    assert doc.kind == "image"
    assert doc.success and doc.page_count == 1
    assert doc.extracted_text == (
        "Page dimensions: 200.0x150.0\n[Image 0x0 to 200x150]\n"
    )
    assert doc.pages[0].anchor_text == doc.pages[0].text


def test_truncated_image_is_error_row():
    doc = extract_document("http://t/bad", write_png(50, 50)[:14])
    assert doc.kind == "image"
    assert not doc.success
    assert "Error processing document" in doc.pages[0].error


def test_jpeg_dims_skip_app_segments():
    data = write_jpeg(1024, 768, seed=1)
    assert image_dimensions(data) == (1024, 768)
    with pytest.raises(ImageError):
        image_dimensions(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF
