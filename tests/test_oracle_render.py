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


def test_text_glyphs_land_where_the_run_is():
    report = _page()
    w, h, px = render_page_bitmap(report, target_longest=400)  # scale 1.0
    # text at (100,100) in a 400x200 page, glyph cell 5 chars * 6pt x 12pt
    # → raster rows h-112..h-100, cols 100..130
    def box(x0, x1, y0, y1):
        return {px[y * w + x] for y in range(y0, y1) for x in range(x0, x1)}

    run = box(100, 130, h - 112, h - 100)
    assert TEXT_FILL in run  # glyph dots inside the run's cell box
    assert 0xFF in run       # ...which is no longer a solid box
    assert box(40, 60, 40, 60) == {0xFF}           # background white
    assert box(340, 360, h - 112, h - 100) == {0xFF}  # beyond the run


def test_different_text_different_pixels():
    """The round-2 glyphless renderer drew equal-length runs as
    identical boxes; with the builtin font, two pages differing ONLY in
    their characters must produce different pixels."""
    a = MiniPdfWriter().add_page((0, 0, 400, 200)).text(100, 100, "HELLO")
    b = MiniPdfWriter().add_page((0, 0, 400, 200)).text(100, 100, "WORLD")
    ra = parse_pdf(a.build())[0]
    rb = parse_pdf(b.build())[0]
    _, _, pa = render_page_bitmap(ra, target_longest=400)
    _, _, pb = render_page_bitmap(rb, target_longest=400)
    assert pa != pb
    # and the render is still deterministic per input
    assert pa == render_page_bitmap(parse_pdf(a.build())[0], target_longest=400)[2]


def test_non_ascii_chars_render_distinct_nonblank_glyphs():
    """Thai (and any non-ASCII) codepoints fall back to md5-derived
    patterns: never blank, distinct per character."""
    from typhoon_ocr_spark.oracle.font import glyph_rows

    ka, kha = glyph_rows("ก"), glyph_rows("ข")
    assert any("1" in r for r in ka) and any("1" in r for r in kha)
    assert ka != kha
    a = MiniPdfWriter().add_page((0, 0, 400, 200)).text(100, 100, "กกก")
    b = MiniPdfWriter().add_page((0, 0, 400, 200)).text(100, 100, "ขขข")
    _, _, pa = render_page_bitmap(parse_pdf(a.build())[0], target_longest=400)
    _, _, pb = render_page_bitmap(parse_pdf(b.build())[0], target_longest=400)
    assert pa != pb


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


class TestThaiFace:
    """Round-4: the Thai block renders through the feature-schematic
    face — structured glyphs per codepoint, never md5 noise — and
    combining marks shape over/under their base consonant."""

    def test_every_thai_codepoint_distinct_and_deterministic(self):
        from typhoon_ocr_spark.oracle.font import _THAI_SPECS, glyph_rows

        seen = {}
        for cp in sorted(_THAI_SPECS):
            rows = glyph_rows(chr(cp))
            assert rows == glyph_rows(chr(cp))  # deterministic
            key = tuple(rows)
            assert key not in seen, f"{hex(cp)} collides with {hex(seen[key])}"
            seen[key] = cp
            assert any("1" in r for r in rows)
        # the whole spacing repertoire is covered: consonants, spacing
        # vowels, signs, digits
        assert len(seen) >= 70

    def test_thai_not_md5_noise(self):
        """A structural glyph, not a hash pattern: the arch-frame
        consonants share their frame ink (ก ⊂ ค as bitmaps would never
        happen for independent md5 draws)."""
        from typhoon_ocr_spark.oracle.font import glyph_rows

        ko_kai = glyph_rows("ก")    # plain arch
        kho_khwai = glyph_rows("ค")  # arch + head
        for r_plain, r_head in zip(ko_kai, kho_khwai):
            for b_plain, b_head in zip(r_plain, r_head):
                if b_plain == "1":
                    assert b_head == "1"  # frame preserved under features
        assert kho_khwai != ko_kai

    def test_combining_marks_zero_advance_and_position(self):
        from typhoon_ocr_spark.oracle.font import (
            is_combining_above,
            is_combining_below,
        )

        assert is_combining_above("้") and is_combining_below("ุ")
        base = MiniPdfWriter()
        base.add_page().text(100, 400, "กา")
        marked = MiniPdfWriter()
        marked.add_page().text(100, 400, "ก้า")  # tone mark over ก
        w0, h0, p0 = render_page_bitmap(parse_pdf(base.build())[0], 400)
        w1, h1, p1 = render_page_bitmap(parse_pdf(marked.build())[0], 400)
        assert (w0, h0) == (w1, h1)
        # zero advance: the baseline band (ก + า ink) is unchanged...
        ink0 = {i for i, v in enumerate(p0) if v != 0xFF}
        ink1 = {i for i, v in enumerate(p1) if v != 0xFF}
        assert ink0 <= ink1
        extra = ink1 - ink0
        assert extra  # ...and the mark added ink
        # every added pixel sits ABOVE all baseline ink (smaller row)
        assert max(i // w1 for i in extra) < min(i // w0 for i in ink0)

    def test_below_vowel_renders_under_base(self):
        plain = MiniPdfWriter()
        plain.add_page().text(100, 400, "ก")
        below = MiniPdfWriter()
        below.add_page().text(100, 400, "กุ")  # sara u under ก
        w0, h0, p0 = render_page_bitmap(parse_pdf(plain.build())[0], 400)
        w1, h1, p1 = render_page_bitmap(parse_pdf(below.build())[0], 400)
        ink0 = {i for i, v in enumerate(p0) if v != 0xFF}
        ink1 = {i for i, v in enumerate(p1) if v != 0xFF}
        assert ink0 <= ink1
        extra = ink1 - ink0
        assert extra
        assert min(i // w1 for i in extra) > max(i // w0 for i in ink0)


def test_latin_accents_compose_not_noise():
    """Accented Latin letters render as base glyph + diacritic (NFD
    composition), never md5 noise; the accent is additive over the
    x-height base and tall bases squash to make room."""
    from typhoon_ocr_spark.oracle.font import glyph_rows

    e, eacute = glyph_rows("e"), glyph_rows("é")
    # base ink preserved under the accent
    for r in range(2, 7):
        for c in range(5):
            if e[r][c] == "1":
                assert eacute[r][c] == "1"
    assert eacute != e and "1" in eacute[0] + eacute[1]  # accent present
    # distinct accents -> distinct glyphs
    assert len({tuple(glyph_rows(ch)) for ch in "eéèêëē"}) == 6
    assert glyph_rows("ç") != glyph_rows("c")
    # determinism
    assert glyph_rows("à") == glyph_rows("à")
