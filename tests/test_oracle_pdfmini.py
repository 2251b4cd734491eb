"""MiniPdf writer/parser round-trip + visitor-semantics goldens.

Goldens mirror /root/reference/backend/tests/test_pdf_processing.py:
text placed by tm=[1,0,0,1,100,200] lands at (100,200); `Do` of an
/Subtype /Image xobject yields a unit square through the CTM; mediabox
(incl. negative-origin) read as-is.
"""

from typhoon_ocr_spark.oracle import linearize_page
from typhoon_ocr_spark.oracle.docpipe import extract_document, sniff_kind
from typhoon_ocr_spark.oracle.pdfmini import (
    MiniPdfWriter,
    page_count,
    parse_pdf,
    parse_pdf_page,
)


def test_single_text_run_golden():
    pdf = MiniPdfWriter().add_page().text(100, 200, "Hello").build()
    assert pdf.startswith(b"%PDF-")
    reports = parse_pdf(pdf)
    assert len(reports) == 1
    (el,) = reports[0].text_elements
    assert (el.text, el.x, el.y) == ("Hello", 100.0, 200.0)
    # linearized golden from test_pdf_processing.py:427-443
    assert "[100x200]Hello" in linearize_page(reports[0])


def test_tm_placement():
    pdf = MiniPdfWriter().add_page().text(100, 200, "Hello World", mode="Tm").build()
    (el,) = parse_pdf(pdf)[0].text_elements
    assert (el.text, el.x, el.y) == ("Hello World", 100.0, 200.0)


def test_mediabox_variants():
    w = MiniPdfWriter()
    w.add_page(mediabox=(0, 0, 612, 792)).text(10, 20, "a")
    w.add_page(mediabox=(0, 0, 400, 600)).text(10, 20, "b")
    w.add_page(mediabox=(-50, -100, 562, 692)).text(10, 20, "c")
    reports = parse_pdf(w.build())
    assert [r.mediabox.x1 for r in reports] == [612.0, 400.0, 562.0]
    assert reports[2].mediabox.x0 == -50.0
    # header uses x1/y1 even for non-origin boxes
    assert linearize_page(reports[2]).startswith("Page dimensions: 562.0x692.0\n")


def test_image_placement_golden():
    pdf = MiniPdfWriter().add_page().image("Im1", 50, 60, 150, 160).build()
    (img,) = parse_pdf(pdf)[0].image_elements
    assert (img.bbox.x0, img.bbox.y0, img.bbox.x1, img.bbox.y1) == (50, 60, 150, 160)
    assert "[Image 50x60 to 150x160]" in linearize_page(parse_pdf(pdf)[0])


def test_nested_cm_composition():
    # q 2 0 0 2 0 0 cm q 1 0 0 1 10 20 cm /Im1 Do Q Q
    # inner translate then outer scale: unit square → (20,40)-(22,42)
    w = MiniPdfWriter().add_page()
    w._page()["images"]["Im1"] = (8, 8)
    w.raw_ops(b"q 2 0 0 2 0 0 cm q 1 0 0 1 10 20 cm /Im1 Do Q Q")
    (img,) = parse_pdf(w.build())[0].image_elements
    assert (img.bbox.x0, img.bbox.y0, img.bbox.x1, img.bbox.y1) == (20, 40, 22, 42)


def test_non_image_xobject_ignored():
    w = MiniPdfWriter().add_page().text(5, 5, "t")
    w.raw_ops(b"q 10 0 0 10 0 0 cm /NoSuch Do Q")
    assert parse_pdf(w.build())[0].image_elements == []


def test_tj_array_concatenation():
    pdf = MiniPdfWriter().add_page().text_tj(10, 20, ["Hel", "lo"]).build()
    (el,) = parse_pdf(pdf)[0].text_elements
    assert (el.text, el.x, el.y) == ("Hello", 10.0, 20.0)


def test_tl_tstar_multiline():
    pdf = MiniPdfWriter().add_page().text_lines(72, 700, 14, ["line1", "line2", "line3"]).build()
    els = parse_pdf(pdf)[0].text_elements
    assert [e.text for e in els] == ["line1", "line2", "line3"]
    assert [e.y for e in els] == [700.0, 686.0, 672.0]
    assert all(e.x == 72.0 for e in els)


def test_unicode_hex_string():
    pdf = MiniPdfWriter().add_page().text(10, 10, "ไทย test").build()
    (el,) = parse_pdf(pdf)[0].text_elements
    assert el.text == "ไทย test"


def test_escaped_literal_string():
    pdf = MiniPdfWriter().add_page().text(1, 2, "a(b)c\\d [e]").build()
    (el,) = parse_pdf(pdf)[0].text_elements
    assert el.text == "a(b)c\\d [e]"


def test_page_count_and_multi_page():
    w = MiniPdfWriter()
    for i in range(10):
        w.add_page().text(10, 10 + i, f"page{i + 1}")
    data = w.build()
    assert page_count(data) == 10
    assert parse_pdf_page(data, 10).text_elements[0].text == "page10"


def test_page_count_error_swallowed():
    assert page_count(b"not a pdf at all") == 1


def test_sniff_kind():
    pdf = MiniPdfWriter().add_page().text(1, 1, "x").build()
    assert sniff_kind(pdf) == "pdf"
    assert sniff_kind(b"<!DOCTYPE html><html><body>hi</body></html>") == "html"
    assert sniff_kind(b"  \n <div>x</div>") == "html"
    assert sniff_kind(b"\x00\x01\x02garbage") == "junk"
    assert sniff_kind(b"") == "junk"
    assert sniff_kind(None) == "junk"


def test_extract_document_pdf_assembly():
    w = MiniPdfWriter()
    w.add_page().text(100, 200, "Hello")
    w.add_page().text(50, 60, "World")
    doc = extract_document("http://t/1", w.build())
    assert doc.kind == "pdf"
    assert doc.page_count == 2
    assert doc.success
    assert "[100x200]Hello" in doc.pages[0].anchor_text
    assert "[50x60]World" in doc.pages[1].anchor_text
    # per-document assembly joins page texts with \n\n (app.py:581)
    assert doc.extracted_text == doc.pages[0].text + "\n\n" + doc.pages[1].text


def test_extract_document_junk():
    doc = extract_document("http://t/j", b"\xde\xad\xbe\xef")
    assert doc.kind == "junk"
    assert not doc.success
    assert doc.extracted_text == ""


# --------------------------------------------------------------------------
# Compressed streams / xref streams / ObjStm (round 2; pypdf handles
# these transparently for the reference — ocr_utils.py:358-388)
# --------------------------------------------------------------------------

def _rich_writer() -> MiniPdfWriter:
    w = MiniPdfWriter()
    w.add_page((0, 0, 400, 600)).text(72, 500, "hello world")
    w.text_tj(80, 300, ["split", " joined"])
    w.image("Im1", 50, 60, 100, 110)
    w.add_page().text_lines(90, 680, 16, ["l1 alpha", "l2 beta"])
    w.text(100, 100, "thai ไทย", mode="Tm")
    return w


def test_flate_golden_matches_uncompressed_twin():
    plain = _rich_writer().build()
    flate = _rich_writer().build(compress=True)
    assert b"/FlateDecode" in flate and b"/FlateDecode" not in plain
    assert repr(parse_pdf(flate)) == repr(parse_pdf(plain))
    # byte-identical anchors, page for page
    for a, b in zip(parse_pdf(plain), parse_pdf(flate)):
        assert linearize_page(a) == linearize_page(b)


def test_xref_stream_with_png_predictor():
    plain = _rich_writer().build()
    xs = _rich_writer().build(compress=True, xref_stream=True)
    assert b"/Type /XRef" in xs and b"/Predictor 12" in xs and b"trailer" not in xs
    assert repr(parse_pdf(xs)) == repr(parse_pdf(plain))
    assert page_count(xs) == 2


def test_objstm_packed_objects():
    plain = _rich_writer().build()
    packed = _rich_writer().build(compress=True, objstm=True)
    assert b"/Type /ObjStm" in packed
    # catalog/pages/page dicts no longer appear as top-level plaintext
    assert b"/Type /Catalog" not in packed.replace(b"/Type /ObjStm", b"")[:200]
    assert repr(parse_pdf(packed)) == repr(parse_pdf(plain))


def test_unknown_filter_is_loud():
    import pytest

    from typhoon_ocr_spark.oracle.pdfmini import MiniPdfError

    bad = _rich_writer().build(compress=True).replace(
        b"/Filter /FlateDecode", b"/Filter /LZWDecode00"
    )
    with pytest.raises(MiniPdfError):
        parse_pdf(bad)
    # ...and through the pipeline it becomes an error row, not empty text
    doc = extract_document("http://t/filt", bad)
    assert doc.kind == "pdf" and not doc.success
    assert "unsupported stream filter" in doc.pages[0].error


def test_corrupt_flate_is_loud():
    import pytest

    from typhoon_ocr_spark.oracle.pdfmini import MiniPdfError

    data = _rich_writer().build(compress=True)
    # corrupt the first compressed content stream's bytes
    idx = data.find(b"stream\n", data.find(b"/FlateDecode")) + len(b"stream\n")
    bad = data[:idx] + b"\x00\x00\x00\x00" + data[idx + 4 :]
    with pytest.raises(MiniPdfError):
        parse_pdf(bad)


def test_classic_xref_prev_chain_ignores_regex_false_positives():
    # compressed bytes may contain 'N 0 obj'-like patterns; the xref
    # table, not the brute-force scan, must drive object resolution
    data = _rich_writer().build(compress=True)
    assert repr(parse_pdf(data)) == repr(parse_pdf(_rich_writer().build()))


def test_asciihex_filter():
    plain = _rich_writer().build()
    # hand-convert the first content stream to ASCIIHexDecode
    start = plain.find(b"stream\n") + 7
    end = plain.find(b"\nendstream", start)
    body = plain[start:end]
    hexed = body.hex().encode() + b">"
    patched = (
        plain[: plain.rfind(b"<<", 0, start)]
        + b"<< /Filter /ASCIIHexDecode /Length %d >>\nstream\n%s\nendstream"
        % (len(hexed), hexed)
        + plain[end + len(b"\nendstream") :]
    )
    reports = parse_pdf(patched)  # offsets shifted → regex fallback path
    assert reports[0].text_elements[0].text == "hello world"
