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


def test_png_real_decode_round_trip():
    """decode_png must recover the exact deterministic pixel pattern
    write_png emitted (true decode, not a fake)."""
    from typhoon_ocr_spark.oracle.images import decode_png, png_pixel_stats

    w, h, seed = 37, 11, 5
    data = write_png(w, h, seed=seed)
    gw, gh, channels, pixels = decode_png(data)
    assert (gw, gh, channels) == (w, h, 1)
    expected = bytes(
        (x * 31 + y * 17 + seed) & 0xFF for y in range(h) for x in range(w)
    )
    assert pixels == expected

    n, mean_pm, spread_pm = png_pixel_stats(data)
    assert n == w * h
    assert mean_pm == round(1000 * sum(expected) / (n * 255))
    assert 0 <= spread_pm <= 1000


def test_decode_media_codecs_real_webp_loud():
    from typhoon_ocr_spark.operators.multimodal import decode_media

    w, h, ch, px = decode_media(write_png(9, 4, seed=1), "png")
    assert (w, h, ch) == (9, 4, 1) and len(px) == 36
    w, h, ch, px = decode_media(write_gif(9, 4, seed=1), "gif")
    assert (w, h, ch) == (9, 4, 3) and len(px) == 108
    w, h, ch, px = decode_media(write_jpeg(9, 4, seed=1), "jpeg")
    assert (w, h, ch) == (9, 4, 1) and len(px) == 36
    # even seed -> real VP8L lossless decode (RGBA)
    w, h, ch, px = decode_media(write_webp(5, 5, seed=2), "webp")
    assert (w, h, ch) == (5, 5, 4) and len(px) == 100
    # odd seed -> VP8X shell (lossy stand-in): loud ImageError, not junk
    from typhoon_ocr_spark.oracle.images import ImageError

    with pytest.raises(ImageError):
        decode_media(write_webp(5, 5, seed=3), "webp")


def test_gif_lzw_round_trip_pixel_exact():
    """Real LZW: every decoded palette value equals the encoder's
    deterministic pattern."""
    from typhoon_ocr_spark.oracle.images import decode_gif

    w, h, ch, px = decode_gif(write_gif(101, 43, seed=3))
    assert (w, h, ch) == (101, 43, 3)
    assert all(
        px[3 * (y * 101 + x)] == (x * 31 + y * 17 + 3) & 0xFF
        for y in range(43)
        for x in range(101)
    )
    # gray palette: all three channels equal
    assert all(px[3 * i] == px[3 * i + 1] == px[3 * i + 2] for i in range(101 * 43))


def test_jpeg_baseline_round_trip_block_means():
    """Real baseline JPEG: the DC-only fixture stream decodes to flat
    8x8 blocks carrying each block's quantized mean."""
    from typhoon_ocr_spark.oracle.images import _JPEG_Q, decode_jpeg

    w, h, ch, px = decode_jpeg(write_jpeg(60, 41, seed=5))
    assert (w, h, ch) == (60, 41, 1)

    def block_val(bx, by):
        total = sum(
            (min(bx * 8 + xx, 59) * 31 + min(by * 8 + yy, 40) * 17 + 5) & 0xFF
            for yy in range(8)
            for xx in range(8)
        )
        dc = round((total - 128 * 64) / 8 / _JPEG_Q)
        return max(0, min(255, int(round(dc * _JPEG_Q * 0.125 + 128))))

    assert all(
        px[y * 60 + x] == block_val(x // 8, y // 8)
        for y in range(41)
        for x in range(60)
    )


def test_jpeg_ac_coefficient_path():
    """The general AC decode path (run/size symbols, ZRL, coefficient
    extend, full IDCT) — dead code for the DC-only fixture encoder, but
    hit by any real-world JPEG. A single 8x8 block is hand-assembled
    with DC=8, a ZRL (16 zeros), and AC=+1 at zigzag index 17; the
    decoded pixels must equal an INDEPENDENTLY computed inverse DCT."""
    import math
    import struct

    from typhoon_ocr_spark.oracle.images import (
        _BitWriter,
        _huff_codes,
        _JPEG_Q,
        _ZIGZAG,
        decode_jpeg,
    )

    # tables: DC cats 0-11 at 4 bits; AC canonical: '0'=EOB, '10'=(0,1), '110'=ZRL
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_bits = [1, 1, 1] + [0] * 13
    ac_vals = [0x00, 0x01, 0xF0]
    dc = _huff_codes(dc_bits, dc_vals)
    ac = _huff_codes(ac_bits, ac_vals)

    w = _BitWriter()
    w.write(*dc[4])      # DC category 4
    w.write(8, 4)        # DC diff = +8
    w.write(*ac[0xF0])   # ZRL: 16 zero ACs
    w.write(*ac[0x01])   # (run 0, size 1)
    w.write(1, 1)        # AC value +1  (lands at zigzag index 17)
    w.write(*ac[0x00])   # EOB
    scan = w.flush()

    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([_JPEG_Q] * 64)
    dht = (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 17 + len(dc_vals) + 17 + len(ac_vals))
        + b"\x00" + bytes(dc_bits) + bytes(dc_vals)
        + b"\x10" + bytes(ac_bits) + bytes(ac_vals)
    )
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00"
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    jpg = b"\xff\xd8" + dqt + dht + sof0 + sos + scan + b"\xff\xd9"

    gw, gh, ch, px = decode_jpeg(jpg)
    assert (gw, gh, ch) == (8, 8, 1)

    # independent reference IDCT (textbook formula, no shared code path)
    coef = [0] * 64
    coef[0] = 8 * _JPEG_Q
    coef[_ZIGZAG[17]] = 1 * _JPEG_Q

    def c(u):
        return 1 / math.sqrt(2) if u == 0 else 1.0

    expected = []
    for y in range(8):
        for x in range(8):
            s = sum(
                c(u) * c(v) / 4 * coef[v * 8 + u]
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * math.cos((2 * y + 1) * v * math.pi / 16)
                for u in range(8)
                for v in range(8)
            )
            expected.append(max(0, min(255, int(round(s + 128)))))
    assert list(px) == expected
    assert coef[_ZIGZAG[17]] != 0 and len(set(px)) > 1  # AC really landed


def test_jpeg_restart_intervals_round_trip():
    """DRI/RSTn path: pixels must be identical with and without restart
    markers (predictor resets + byte alignment handled per spec E.2.4);
    a stream whose restarts are missing raises loudly."""
    from typhoon_ocr_spark.oracle.images import decode_jpeg

    plain = decode_jpeg(write_jpeg(60, 41, seed=5))
    restarted = decode_jpeg(write_jpeg(60, 41, seed=5, restart_interval=3))
    assert restarted == plain
    # a decoder that ignored the DC reset would drift: prove the DRI
    # file really contains restart markers
    data = write_jpeg(60, 41, seed=5, restart_interval=3)
    assert any(
        data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
        for i in range(2, len(data) - 2)
    )


def test_gif_small_first_frame_reports_frame_dims():
    """A GIF whose first frame is smaller than its logical screen must
    report the DECODED frame's dims so width*height*channels ==
    n_samples stays internally consistent."""
    import struct

    from typhoon_ocr_spark.oracle.images import image_stats_row

    g = bytearray(write_gif(10, 8, seed=1))
    # enlarge the logical screen only (bytes 6-9: width, height LE)
    g[6:10] = struct.pack("<HH", 100, 90)
    row = image_stats_row(bytes(g))
    assert row[-1] == "real"
    assert (row[1], row[2]) == (10, 8)          # frame, not screen
    assert row[3] == 10 * 8 * 3                 # n_samples consistent


def test_resize_image_payload_real_pixels():
    """Pixel-true resize: nearest-neighbor samples land exactly where
    the integer mapping says, for both the gray (PNG/JPEG) and RGB
    (GIF) re-encode paths; the small-image fast path returns no new
    payload; the reference's asymmetric int() truncation holds."""
    from typhoon_ocr_spark.oracle.images import (
        decode_png,
        resize_image_payload,
        write_gif,
        write_png,
    )

    # small image: untouched (reference's <=300 px fast path; the rule
    # is strictly >300 on either side)
    w, h, nw, nh, png = resize_image_payload(write_png(100, 50, seed=1))
    assert (w, h, nw, nh, png) == (100, 50, 100, 50, None)
    assert resize_image_payload(write_png(263, 131, seed=3), max_size=64)[4] is None

    big = write_gif(310, 40, seed=4)  # wide GIF over the 300 px trigger
    w, h, nw, nh, png = resize_image_payload(big, max_size=62)
    assert (w, h) == (310, 40)
    assert (nw, nh) == (62, int(40 * (62 / 310)))  # asymmetric int()
    dw, dh, ch, px = decode_png(png)
    assert (dw, dh, ch) == (nw, nh, 3)  # GIF decodes RGB → RGB PNG
    # nearest-neighbor exactness: dst (x,y) == src (x*310//62, y*40//8)
    ok = all(
        px[3 * (y * nw + x)] == ((x * 310 // nw) * 31 + (y * 40 // nh) * 17 + 4) & 0xFF
        for y in range(nh)
        for x in range(nw)
    )
    assert ok


def test_resize_images_operator(spark):
    """The Spark surface: image rows resize for real (PNG payload out),
    under-threshold rows keep no new payload, lossless-WebP rows
    resize for real, lossy-WebP (VP8X) rows become error rows — never
    task failures."""
    from typhoon_ocr_spark.oracle.images import decode_png, write_jpeg, write_webp
    from typhoon_ocr_spark.operators.multimodal import resize_images

    rows = [
        ("u-big", bytearray(write_jpeg(310, 150, seed=6))),
        ("u-small", bytearray(write_png(40, 20, seed=6))),
        ("u-vp8l", bytearray(write_webp(400, 300, seed=2))),
        ("u-vp8x", bytearray(write_webp(400, 300, seed=3))),
        ("u-html", bytearray(b"<html><body>x</body></html>")),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r.asDict() for r in resize_images(df, max_size=64).collect()}
    assert set(got) == {"u-big", "u-small", "u-vp8l", "u-vp8x"}
    big = got["u-big"]
    assert (big["new_width"], big["new_height"]) == (64, int(150 * 64 / 310))
    dw, dh, ch, _ = decode_png(bytes(big["resized_png"]))
    assert (dw, dh, ch) == (big["new_width"], big["new_height"], 1)
    assert big["error"] is None
    assert got["u-small"]["resized_png"] is None and got["u-small"]["error"] is None
    vp8l = got["u-vp8l"]
    assert vp8l["error"] is None and (vp8l["new_width"], vp8l["new_height"]) == (64, 48)
    dw, dh, ch, _ = decode_png(bytes(vp8l["resized_png"]))
    assert (dw, dh, ch) == (64, 48, 3)  # alpha plane stripped pre-encode
    vp8x = got["u-vp8x"]
    assert vp8x["resized_png"] is None and vp8x["error"]
    assert vp8x["width"] == 400  # header dims still reported


def test_truncated_bodies_decode_error_not_crash():
    from typhoon_ocr_spark.oracle.images import image_stats_row

    gif = write_gif(40, 40, seed=1)
    jpg = write_jpeg(40, 40, seed=1)
    assert image_stats_row(gif[:60] + b"\x00\x3b")[-1] == "decode-error"
    # intact header, entropy data cut mid-scan → decode-error row
    assert image_stats_row(jpg[:-10])[-1] == "decode-error"
    # header itself unparseable → not an image row at all
    assert image_stats_row(jpg[: len(jpg) // 4]) is None


def test_media_features_real_for_decodable_fake_otherwise(spark):
    """extract_media_features computes REAL pixel statistics for
    payloads the stdlib codecs decode (marker 1.0 in the last slot,
    mean in [0,1]); undecodable payloads keep the marked sha fake."""
    from typhoon_ocr_spark.operators.multimodal import extract_media_features

    rows = [
        (1, bytearray(write_png(16, 16, seed=7))),
        (2, bytearray(write_gif(16, 16, seed=7))),
        (3, bytearray(b"not an image at all, just text bytes")),
        (4, bytearray(write_webp(16, 16, seed=2))),  # VP8L: decodes now
        (5, bytearray(write_webp(16, 16, seed=3))),  # VP8X: lossy stand-in
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: list(r["features"]) for r in
           extract_media_features(df).collect()}
    for mid in (1, 2, 4):
        f = got[mid]
        assert f[-1] == 1.0  # real-decode marker
        assert 0.0 <= f[0] <= 1.0 and f[2] == 1.0  # mean, square aspect
    for mid in (3, 5):  # text + lossy WebP: sha fake, marker absent
        assert got[mid][-1] != 1.0
    # pixel-derived, not sha-derived: the real vector must differ from
    # what the sha fallback would have produced for the same payload
    from typhoon_ocr_spark.operators.multimodal import _fake_decode_features

    assert got[1] != _fake_decode_features(bytes(rows[0][1]))


def test_page_image_features_matches_golden(spark, fixture_dir):
    """page_image_features (the driver-gated media_features query) must
    reproduce the fixture golden exactly — vectors included."""
    import math
    import os

    from typhoon_ocr_spark.operators.multimodal import page_image_features

    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    got = {
        r["url"]: [int(math.floor(x * 1000 + 0.5)) for x in r["features"]]
        for r in page_image_features(pages).collect()
    }
    golden = spark.read.parquet(os.path.join(fixture_dir, "expected_features.parquet"))
    exp = {r["url"]: list(r["features_pm"]) for r in golden.collect()}
    assert got == exp and len(got) > 5
    # every fixture raster decodes for real except the lossy-VP8 shells
    real = [v for v in got.values() if v[-1] == 1000]
    assert len(real) > len(got) * 0.6


def test_image_pixel_stats_operator(spark):
    from typhoon_ocr_spark.operators.multimodal import image_pixel_stats

    rows = [
        ("u-png", bytearray(write_png(20, 10, seed=2))),
        ("u-gif", bytearray(write_gif(64, 32))),
        ("u-jpg", bytearray(write_jpeg(24, 16))),
        ("u-vp8l", bytearray(write_webp(30, 20, seed=2))),
        ("u-vp8x", bytearray(write_webp(30, 20, seed=3))),
        ("u-html", bytearray(b"<html><body>x</body></html>")),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r.asDict() for r in image_pixel_stats(df).collect()}
    assert set(got) == {"u-png", "u-gif", "u-jpg", "u-vp8l", "u-vp8x"}
    assert got["u-png"]["decoded"] == "real"
    assert got["u-png"]["n_samples"] == 200
    assert got["u-gif"]["decoded"] == "real"
    assert got["u-gif"]["n_samples"] == 64 * 32 * 3
    assert got["u-jpg"]["decoded"] == "real"
    assert got["u-jpg"]["n_samples"] == 24 * 16
    assert got["u-vp8l"]["decoded"] == "real"
    assert got["u-vp8l"]["n_samples"] == 30 * 20 * 4  # RGBA
    assert got["u-vp8x"]["decoded"] == "header-only"
    assert got["u-vp8x"]["width"] == 30 and got["u-vp8x"]["n_samples"] is None


def test_palette_png_is_decode_error_row_not_task_failure(spark):
    """Header parses (dims OK) but the body is undecodable (palette
    color type) — must become decoded='decode-error', never an
    exception out of the UDF."""
    import struct as _struct
    import zlib as _zlib

    from typhoon_ocr_spark.oracle.images import PNG_MAGIC, _png_chunk
    from typhoon_ocr_spark.operators.multimodal import image_pixel_stats

    ihdr = _struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)  # color type 3
    palette_png = (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", bytes(9))
        + _png_chunk(b"IDAT", _zlib.compress(bytes(20)))
        + _png_chunk(b"IEND", b"")
    )
    df = spark.createDataFrame(
        [("u-pal", bytearray(palette_png))], "url string, html binary"
    )
    (row,) = image_pixel_stats(df).collect()
    assert row["decoded"] == "decode-error"
    assert (row["width"], row["height"]) == (4, 4)
    assert row["n_samples"] is None


# ---------------------------------------------------------------------------
# WebP lossless (VP8L) codec
# ---------------------------------------------------------------------------

def _vp8l_header_bits(bw, width, height):
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def test_vp8l_round_trip_pixel_exact():
    from typhoon_ocr_spark.oracle.images import (
        _vp8l_palette,
        _vp8l_pattern_bits,
        decode_image,
        write_webp_lossless,
    )

    for seed in (0, 4, 10):
        # non-multiple-of-8 widths exercise bit alignment
        data = write_webp_lossless(13, 7, seed=seed)
        w, h, ch, px = decode_image(data)
        assert (w, h, ch) == (13, 7, 4)
        gp, rp, bp = _vp8l_palette(seed)
        for y in range(7):
            for x in range(13):
                g, r, b = _vp8l_pattern_bits(x, y, seed)
                i = 4 * (y * 13 + x)
                assert tuple(px[i : i + 4]) == (rp[r], gp[g], bp[b], 255), (x, y)


def test_vp8l_truncated_is_image_error():
    from typhoon_ocr_spark.oracle.images import (
        ImageError,
        decode_image,
        write_webp_lossless,
    )

    data = write_webp_lossless(40, 40, seed=2)
    with pytest.raises(ImageError):
        decode_image(data[:40])


def test_vp8l_2d_distance_map_rejected_loudly():
    """Round 5 closed the transform subset; the remaining documented
    loud gap is the 120-entry 2D LZ77 distance map (its normative
    offset table is not reconstructible in-sandbox — a wrong table
    would silently corrupt pixels reported as decoded='real').
    Duplicate transforms also reject."""
    from typhoon_ocr_spark.oracle.images import (
        ImageError,
        _Vp8lBitWriter,
        _vp8l_container,
        decode_image,
    )

    # distance code <= 120 -> 2D neighborhood mapping -> loud error.
    # Same normal green code as the LZ77 test (100/120/length-259) but
    # the distance prefix decodes to dist_code 1 (mapped range).
    bw = _Vp8lBitWriter()
    _vp8l_header_bits(bw, 4, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    bw.write(0, 1)  # green: not simple
    bw.write(1, 4)  # num_codes = 5
    for ln in (0, 2, 0, 1, 2):  # order 17,18,0,1,2
        bw.write(ln, 3)
    bw.write(0, 1)  # no explicit max_symbol

    def clc(bits_, extra=None, nbits=7):
        for b in bits_:
            bw.write(b, 1)
        if extra is not None:
            bw.write(extra, nbits)

    clc((1, 1), 100 - 11)   # 18: symbols 0..99 length 0
    clc((0,))               # symbol 100 -> length 1
    clc((1, 1), 19 - 11)    # 101..119 -> 0
    clc((1, 0))             # symbol 120 -> length 2
    clc((1, 1), 138 - 11)   # 121..258 -> 0
    clc((1, 0))             # symbol 259 -> length 2
    clc((1, 1), 20 - 11)    # 260..279 -> 0
    bw.simple1(10)
    bw.simple1(20)
    bw.simple1(255)
    bw.simple1(0)   # distance prefix symbol 0 -> dist_code 1 (mapped)
    bw.write(0, 1)  # pixel 0: literal green 100
    bw.write(1, 1)  # green "11" -> 259: back-reference length 4
    bw.write(1, 1)
    with pytest.raises(ImageError, match="distance map"):
        decode_image(_vp8l_container(bw.finish()))

    # duplicate transform types reject
    bw2 = _Vp8lBitWriter()
    _vp8l_header_bits(bw2, 4, 4)
    bw2.write(1, 1)
    bw2.write(2, 2)  # SUBTRACT_GREEN
    bw2.write(1, 1)
    bw2.write(2, 2)  # SUBTRACT_GREEN again
    with pytest.raises(ImageError, match="duplicate"):
        decode_image(_vp8l_container(bw2.finish()))


def test_vp8l_lz77_backreference_and_normal_prefix_code():
    """Hand-assembled stream: a NORMAL (code-length-coded) green prefix
    code with three symbols (greens 100 and 120, plus length-code 259)
    and an LZ77 back-reference (length 4, plain distance 4 = code 124)
    that copies the first four pixels."""
    from typhoon_ocr_spark.oracle.images import (
        _Vp8lBitWriter,
        _vp8l_container,
        decode_image,
    )

    bw = _Vp8lBitWriter()
    _vp8l_header_bits(bw, 4, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix

    # GREEN: normal code. Code-length code over (17,18,0,1,2):
    # lengths 18->2, 1->1, 2->2 (CLC canonical: 1->"0", 2->"10", 18->"11")
    bw.write(0, 1)  # not simple
    bw.write(1, 4)  # num_codes = 5
    for ln in (0, 2, 0, 1, 2):  # order 17,18,0,1,2
        bw.write(ln, 3)
    bw.write(0, 1)  # no explicit max_symbol

    def clc_1():  # code "0"
        bw.write(0, 1)

    def clc_2():  # code "10"
        bw.write(1, 1)
        bw.write(0, 1)

    def clc_18(repeat):  # code "11" + 7 extra bits (11 + extra zeros)
        bw.write(1, 1)
        bw.write(1, 1)
        bw.write(repeat - 11, 7)

    clc_18(100)  # symbols 0..99 -> length 0
    clc_1()      # symbol 100 -> length 1
    clc_18(19)   # 101..119 -> 0
    clc_2()      # symbol 120 -> length 2
    clc_18(138)  # 121..258 -> 0
    clc_2()      # symbol 259 (length code 3 -> copy length 4) -> length 2
    clc_18(20)   # 260..279 -> 0
    # green canonical codes: 100->"0", 120->"10", 259->"11"

    # RED / BLUE / ALPHA: single-symbol simple codes (0 bits per use)
    bw.simple1(10)
    bw.simple1(20)
    bw.simple1(255)
    # DISTANCE: single symbol 13 (-> 5 extra bits; 27 => dist_code 124)
    bw.simple1(13)

    # pixels: literals green 100,120,100,120 then backref(len 4, dist 4)
    for code_bits in ((0,), (1, 0), (0,), (1, 0)):
        for bit in code_bits:
            bw.write(bit, 1)
    bw.write(1, 1)  # green "11" -> symbol 259
    bw.write(1, 1)
    bw.write(27, 5)  # distance extra bits: 96 + 27 + 1 = 124 -> dist 4

    w, h, ch, px = decode_image(_vp8l_container(bw.finish()))
    assert (w, h, ch) == (4, 2, 4)
    greens = [px[4 * i + 1] for i in range(8)]
    assert greens == [100, 120, 100, 120, 100, 120, 100, 120]
    assert all(px[4 * i] == 10 and px[4 * i + 2] == 20 for i in range(8))




def test_vp8l_color_cache_hit():
    """Literal pixel, then a color-cache symbol re-emitting it. The
    green alphabet grows to 296 (256 + 24 + 2^4 cache entries); the
    cache symbol (>255) needs a normal code, built here with the
    explicit max_symbol shortcut."""
    from typhoon_ocr_spark.oracle.images import (
        _VP8L_CACHE_MULT,
        _Vp8lBitWriter,
        _vp8l_container,
        decode_image,
    )

    cache_bits = 4
    argb = (255 << 24) | (10 << 16) | (100 << 8) | 20
    idx = (_VP8L_CACHE_MULT * argb & 0xFFFFFFFF) >> (32 - cache_bits)
    cache_sym = 280 + idx

    bw = _Vp8lBitWriter()
    _vp8l_header_bits(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta prefix
    # GREEN: normal code, lengths 100->1 and cache_sym->1.
    # CLC over order (17,18,0,1): lengths 18->1, 1->1
    # (canonical: symbol 1 -> "0", symbol 18 -> "1")
    bw.write(0, 1)  # not simple
    bw.write(0, 4)  # num_codes = 4
    for ln in (0, 1, 0, 1):  # order 17,18,0,1
        bw.write(ln, 3)
    bw.write(1, 1)  # explicit max_symbol
    bw.write(3, 3)  # length_nbits = 2 + 2*3 = 8
    bw.write(3, 8)  # max_symbol = 2 + 3 = 5 code-length reads
    # reads: 18(repeat 100), 1, 18(repeat 138), 18(repeat cache_sym-239), 1
    bw.write(1, 1)          # 18
    bw.write(100 - 11, 7)
    bw.write(0, 1)          # 1 -> green symbol 100 gets length 1
    bw.write(1, 1)          # 18
    bw.write(138 - 11, 7)
    bw.write(1, 1)          # 18: zeros from 239 to cache_sym-1
    bw.write((cache_sym - 239) - 11, 7)
    bw.write(0, 1)          # 1 -> cache_sym gets length 1
    # green canonical: 100 -> "0", cache_sym -> "1"

    bw.simple1(10)   # red
    bw.simple1(20)   # blue
    bw.simple1(255)  # alpha
    bw.simple1(13)   # distance (unused)

    bw.write(0, 1)  # literal: green 100 (+ 0-bit red/blue/alpha)
    bw.write(1, 1)  # cache hit -> same ARGB again

    w, h, ch, px = decode_image(_vp8l_container(bw.finish()))
    assert (w, h, ch) == (2, 1, 4)
    assert tuple(px[0:4]) == (10, 100, 20, 255)
    assert tuple(px[4:8]) == tuple(px[0:4])


def test_vp8l_literal_channel_read_order():
    """Spec read order is green, red, blue, alpha (RFC 9649). With
    2-symbol red AND alpha codes the orders are distinguishable: the
    fixture encoder's 0-bit alpha code can't catch a transposition
    (found by review — an inline or-expression read alpha first)."""
    from typhoon_ocr_spark.oracle.images import (
        _Vp8lBitWriter,
        _vp8l_container,
        decode_image,
    )

    bw = _Vp8lBitWriter()
    _vp8l_header_bits(bw, 1, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    bw.simple2(100, 101)  # green
    bw.simple2(10, 11)    # red
    bw.simple1(20)        # blue
    bw.simple2(200, 201)  # alpha
    bw.simple1(1)         # distance
    bw.write(0, 1)  # green -> 100
    bw.write(1, 1)  # red   -> 11
    bw.write(0, 1)  # alpha -> 200 (blue consumes no bits)
    w, h, ch, px = decode_image(_vp8l_container(bw.finish()))
    assert (w, h, ch) == (1, 1, 4)
    assert tuple(px) == (11, 100, 20, 200)


def test_vp8l_incomplete_prefix_code_rejected():
    """Kraft-incomplete / over-full canonical codes must raise (the
    error-as-row contract: corrupt bodies may not decode to junk
    reported as 'real')."""
    from typhoon_ocr_spark.oracle.images import ImageError, _VP8LPrefixCode

    with pytest.raises(ImageError):
        _VP8LPrefixCode([1, 1, 1])  # over-full
    with pytest.raises(ImageError):
        _VP8LPrefixCode([2, 2, 2])  # incomplete
    # complete codes still build
    assert _VP8LPrefixCode([1, 2, 2]).max_len == 2


# ---------------------------------------------------------------------------
# Audio/video metadata (oracle/media.py + multimodal.media_meta)
# ---------------------------------------------------------------------------

def test_wav_decode_pixel_exact():
    """WAV stats must equal an independent recomputation from the
    synth formula (real decode, not a fake)."""
    from typhoon_ocr_spark.oracle.media import (
        synth_samples,
        wav_stats,
        write_wav,
    )

    rate, ch, n, dur, mean_pm, spread_pm = wav_stats(
        write_wav(seed=9, n_frames=500, channels=2, rate=16000)
    )
    assert (rate, ch, n) == (16000, 2, 1000)
    assert dur == round(1000 * 500 / 16000)
    s = synth_samples(9, 500, 2)
    assert mean_pm == round(1000 * (sum(abs(x) for x in s) / len(s)) / 32768)
    assert spread_pm == round(1000 * (max(s) - min(s)) / 65535)


def test_mp4_mvhd_versions():
    from typhoon_ocr_spark.oracle.media import (
        MediaError,
        parse_mp4_meta,
        write_mp4,
    )
    import struct as _struct

    ts, units, dur = parse_mp4_meta(write_mp4(seed=4, duration_ms=12345))
    assert dur == 12345 and units == round(12345 * ts / 1000)
    # hand-built version-1 mvhd (64-bit fields)
    body = bytes([1, 0, 0, 0]) + bytes(16) + _struct.pack(">IQ", 90000, 450000)
    mvhd = _struct.pack(">I", 8 + len(body)) + b"mvhd" + body
    moov = _struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = _struct.pack(">I", 16) + b"ftyp" + b"isom" + bytes(4)
    assert parse_mp4_meta(ftyp + moov) == (90000, 450000, 5000)
    with pytest.raises(MediaError):
        parse_mp4_meta(ftyp)  # no moov


def test_media_meta_operator(spark):
    from typhoon_ocr_spark.oracle.media import write_mp4, write_wav
    from typhoon_ocr_spark.operators.multimodal import media_meta

    rows = [
        (1, bytearray(write_wav(seed=1, n_frames=400))),
        (2, bytearray(write_mp4(seed=2, duration_ms=2500))),
        (3, bytearray(write_wav(seed=3)[:45])),   # truncated -> error row
        (4, bytearray(b"not media at all")),      # dropped
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in media_meta(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["decoded"] == "real" and got[1]["n_samples"] == 400
    assert got[2]["decoded"] == "header-only" and got[2]["duration_ms"] == 2500
    assert got[3]["decoded"] == "decode-error" and got[3]["n_samples"] is None


def test_frame_plan_values(spark):
    from typhoon_ocr_spark.oracle.media import write_mp4, write_wav
    from typhoon_ocr_spark.operators.multimodal import frame_plan, media_meta

    rows = [
        (1, bytearray(write_mp4(seed=0, duration_ms=3500))),   # 3 frames
        (2, bytearray(write_mp4(seed=1, duration_ms=500))),    # 0 frames
        (3, bytearray(write_mp4(seed=2, duration_ms=120000))), # capped at 64
        (4, bytearray(write_wav(seed=4))),                     # audio: excluded
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {}
    for r in frame_plan(media_meta(df)).collect():
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(got) == [1, 3]
    assert sorted(got[1]) == [0, 1, 2]
    assert sorted(got[3]) == list(range(64))


def test_mp4_rawg_sample_table_roundtrip():
    """Real ISO-BMFF sample-table walk: writer → parser round-trip,
    frame bytes exact, truncation/mis-size → MediaError."""
    import pytest as _pytest

    from typhoon_ocr_spark.oracle.media import (
        MediaError,
        frame_stats_rows,
        parse_mp4_frames,
        write_mp4,
        write_mp4_video,
    )

    p = write_mp4_video(seed=9, width=20, height=10, n_frames=8, fps=2)
    w, h, fps, frames = parse_mp4_frames(p)
    assert (w, h, fps, len(frames)) == (20, 10, 2, 8)
    assert all(len(f) == 200 for f in frames)
    # independent recomputation of one sampled frame's stats
    rows = frame_stats_rows(p)
    assert rows and rows[0][:4] == (0, 0, 20, 10)
    px = frames[0]
    assert rows[0][4] == round(1000 * (sum(px) / len(px)) / 255)
    assert rows[0][5] == round(1000 * (max(px) - min(px)) / 255)
    # sampling contract: one row per second of media time, src = i*fps
    assert [r[0] for r in rows] == list(range(len(frames) // 2))
    assert [r[1] for r in rows] == [i * 2 for i in range(len(rows))]
    # metadata-only shells have no sample tables
    with _pytest.raises(MediaError):
        parse_mp4_frames(write_mp4(seed=1))
    assert frame_stats_rows(write_mp4(seed=1)) is None
    # truncated mdat -> loud error through the parser, None through rows
    with _pytest.raises(MediaError):
        parse_mp4_frames(p[:60])
    assert frame_stats_rows(p[:-40]) is None


def test_frame_pixel_stats_operator(spark):
    """The Spark operator drops non-video rows and reproduces the
    shared-oracle rows for real videos."""
    from typhoon_ocr_spark.operators.multimodal import frame_pixel_stats
    from typhoon_ocr_spark.oracle.media import (
        frame_stats_rows,
        write_mp4,
        write_mp4_video,
        write_wav,
    )

    payloads = [
        (1, bytearray(write_mp4_video(seed=4, n_frames=10, fps=2))),
        (2, bytearray(write_mp4(seed=2))),        # shell: dropped
        (3, bytearray(write_wav(seed=3))),        # audio: dropped
        (4, bytearray(b"junk")),                  # junk: dropped
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    got = sorted(
        tuple(r) for r in frame_pixel_stats(df).collect()
    )
    expected = sorted(
        (1,) + row for row in frame_stats_rows(bytes(payloads[0][1]))
    )
    assert got == expected and got


# --- VP8L pixel transforms (round 5: subset gap closed) ---------------------

def _vp8l_decode_rgba(body_bits: bytes):
    from typhoon_ocr_spark.oracle.images import _vp8l_container, decode_webp

    w, h, ch, px = decode_webp(_vp8l_container(body_bits))
    assert ch == 4
    return w, h, [tuple(px[4 * i : 4 * i + 4]) for i in range(w * h)]


def test_vp8l_subtract_green_writer_roundtrip():
    """subtract_green=True emits identical stored bits behind the
    transform header; decoded red/blue gain green mod 256."""
    from typhoon_ocr_spark.oracle.images import decode_webp, write_webp_lossless

    plain = decode_webp(write_webp_lossless(5, 4, seed=9))
    sg = decode_webp(write_webp_lossless(5, 4, seed=9, subtract_green=True))
    assert plain[:2] == sg[:2]
    pp, ps = plain[3], sg[3]
    for i in range(0, len(pp), 4):
        r, g, b, a = pp[i], pp[i + 1], pp[i + 2], pp[i + 3]
        assert ps[i + 1] == g and ps[i + 3] == a
        assert ps[i] == (r + g) % 256
        assert ps[i + 2] == (b + g) % 256


def test_vp8l_predictor_transform_hand_stream():
    """3×2 image, one predictor block in mode 3 (top-right): exercises
    the black/L/T border rules AND the flat-array TR addressing (the
    last column's TR is the current row's first pixel). Expected pixels
    hand-derived."""
    from typhoon_ocr_spark.oracle.images import _Vp8lBitWriter

    bw = _Vp8lBitWriter()
    bw.write(0x2F, 8)
    bw.write(2, 14)   # width 3
    bw.write(1, 14)   # height 2
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)    # transform present
    bw.write(0, 2)    # PREDICTOR
    bw.write(0, 3)    # size_bits = 2 -> 4x4 blocks -> 1x1 sub-image
    bw.write(0, 1)    # sub: no color cache
    bw.simple1(3)     # sub green = predictor mode 3 (TR)
    bw.simple1(0)     # sub red
    bw.simple1(0)     # sub blue
    bw.simple1(0)     # sub alpha
    bw.simple1(1)     # sub distance
    bw.write(0, 1)    # no more transforms
    bw.write(0, 1)    # main: no color cache
    bw.write(0, 1)    # main: no meta prefix
    bw.simple2(0, 1)  # green residuals
    bw.simple2(0, 1)  # red residuals
    bw.simple2(0, 1)  # blue residuals
    bw.simple1(0)     # alpha residual constant 0
    bw.simple1(1)     # distance
    g_res = [1, 0, 1, 1, 1, 0]
    r_res = [0, 1, 1, 0, 1, 1]
    b_res = [1, 1, 0, 1, 0, 1]
    for i in range(6):
        bw.write(g_res[i], 1)
        bw.write(r_res[i], 1)
        bw.write(b_res[i], 1)
    w, h, px = _vp8l_decode_rgba(bw.finish())
    assert (w, h) == (3, 2)
    # p0=black+res; row0: L; p3: T; p4: TR=p2; p5: TR=p3
    assert px == [
        (0, 1, 1, 255),
        (1, 1, 2, 255),
        (2, 2, 2, 255),
        (0, 2, 2, 255),
        (3, 3, 2, 255),
        (1, 2, 3, 255),
    ]


def test_vp8l_color_transform_hand_stream():
    """2×2 image, one color-transform block with green_to_red=32 (so
    the red delta is exactly the signed green value); green_to_blue and
    red_to_blue zero. Expected pixels hand-derived."""
    from typhoon_ocr_spark.oracle.images import _Vp8lBitWriter

    bw = _Vp8lBitWriter()
    bw.write(0x2F, 8)
    bw.write(1, 14)
    bw.write(1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)    # transform present
    bw.write(1, 2)    # COLOR
    bw.write(0, 3)    # size_bits 2 -> 1x1 sub
    bw.write(0, 1)    # sub: no cache
    bw.simple1(0)     # sub green  = green_to_blue 0
    bw.simple1(0)     # sub red    = red_to_blue 0
    bw.simple1(32)    # sub blue   = green_to_red 32 -> delta == s8(green)
    bw.simple1(0)
    bw.simple1(1)
    bw.write(0, 1)    # no more transforms
    bw.write(0, 1)    # main: no cache
    bw.write(0, 1)    # main: no meta
    bw.simple2(0, 1)  # green
    bw.simple2(5, 6)  # stored red
    bw.simple1(7)     # stored blue
    bw.simple1(255)   # alpha
    bw.simple1(1)
    for gbit, rbit in ((0, 0), (1, 1), (1, 0), (0, 1)):
        bw.write(gbit, 1)
        bw.write(rbit, 1)
    w, h, px = _vp8l_decode_rgba(bw.finish())
    assert (w, h) == (2, 2)
    assert px == [
        (5, 0, 7, 255),
        (7, 1, 7, 255),
        (6, 1, 7, 255),
        (6, 0, 7, 255),
    ]


def test_vp8l_color_indexing_hand_stream():
    """8×1 two-color palette: indices bit-pack 8/byte (leftmost pixel
    in the least-significant bit), palette entries delta-coded."""
    from typhoon_ocr_spark.oracle.images import _Vp8lBitWriter

    bw = _Vp8lBitWriter()
    bw.write(0x2F, 8)
    bw.write(7, 14)   # width 8
    bw.write(0, 14)   # height 1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)     # transform present
    bw.write(3, 2)     # COLOR_INDEXING
    bw.write(1, 8)     # palette size 2
    # palette stream (2x1 image): entry0 = (r10,g20,b30,a255);
    # entry1 coded as the delta (+1,+1,+1,+0)
    bw.write(0, 1)     # no cache
    bw.simple2(20, 1)  # green: 20 then +1
    bw.simple2(10, 1)  # red
    bw.simple2(30, 1)  # blue
    bw.simple2(255, 0) # alpha: 255 then +0
    bw.simple1(1)
    for bit in (0, 1):  # entry index: channel order green,red,blue,alpha
        bw.write(bit, 1)
        bw.write(bit, 1)
        bw.write(bit, 1)
        bw.write(bit, 1)
    bw.write(0, 1)     # no more transforms
    # main image at packed width 1: one literal green byte 0b01011010
    bw.write(0, 1)     # no cache
    bw.write(0, 1)     # no meta
    bw.simple1(90)
    bw.simple1(0)
    bw.simple1(0)
    bw.simple1(0)
    bw.simple1(1)
    w, h, px = _vp8l_decode_rgba(bw.finish())
    assert (w, h) == (8, 1)
    A, B = (10, 20, 30, 255), (11, 21, 31, 255)
    assert px == [A, B, A, B, B, A, B, A]
