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
