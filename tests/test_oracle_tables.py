"""Deterministic table-cell grouping (oracle/tables.py)."""

from typhoon_ocr_spark.oracle.elements import TextElement
from typhoon_ocr_spark.oracle.pdfmini import MiniPdfWriter, parse_pdf
from typhoon_ocr_spark.oracle.tables import detect_table


def _grid(rows, cols, x0=50, y0=700, dx=80, dy=20, text=lambda r, c: f"r{r}c{c}"):
    out = []
    for r in range(rows):
        for c in range(cols):
            out.append(TextElement(text(r, c), x0 + c * dx, y0 - r * dy))
    return out


def test_simple_grid_golden():
    md = detect_table(_grid(3, 2))
    assert md == (
        "| r0c0 | r0c1 |\n"
        "|---|---|\n"
        "| r1c0 | r1c1 |\n"
        "| r2c0 | r2c1 |"
    )


def test_single_column_is_not_a_table():
    runs = [TextElement(f"line{i}", 72, 700 - 18 * i) for i in range(8)]
    assert detect_table(runs) is None


def test_single_row_is_not_a_table():
    runs = [TextElement(f"w{i}", 50 + 60 * i, 700) for i in range(6)]
    assert detect_table(runs) is None


def test_sparse_scatter_rejected_by_fill_ratio():
    # 4x4 grid positions but only the diagonal filled (fill 0.25)
    runs = [TextElement(f"d{i}", 50 + 80 * i, 700 - 20 * i) for i in range(4)]
    assert detect_table(runs) is None


def test_jitter_within_tolerance_clusters():
    runs = _grid(3, 3)
    jittered = [TextElement(t.text, t.x + (0.8 if i % 2 else -0.9), t.y + (1.1 if i % 3 else 0))
                for i, t in enumerate(runs)]
    md = detect_table(jittered)
    assert md is not None
    assert md.splitlines()[0] == "| r0c0 | r0c1 | r0c2 |"


def test_pipe_escaped_and_cells_joined():
    runs = _grid(2, 2)
    runs.append(TextElement("a|b", 50, 700))  # second run in cell (0,0)
    md = detect_table(runs)
    assert "r0c0 a\\|b" in md or "a\\|b r0c0" in md


def test_blank_runs_ignored():
    runs = _grid(2, 2) + [TextElement("   ", 400, 700)]
    md = detect_table(runs)
    assert md.splitlines()[0] == "| r0c0 | r0c1 |"


def test_end_to_end_pdf_grid():
    w = MiniPdfWriter()
    w.add_page()
    for r in range(4):
        for c in range(3):
            w.text(40 + c * 90, 720 - r * 22, f"cell{r}{c}")
    (report,) = parse_pdf(w.build(compress=True))
    md = detect_table(report.text_elements)
    assert md.startswith("| cell00 | cell01 | cell02 |")
    assert md.count("\n") == 4  # header + separator + 3 body rows


def test_prose_page_not_a_table():
    w = MiniPdfWriter()
    w.add_page()
    for i in range(6):
        w.text(72, 700 - 18 * i, f"paragraph line {i} with words")
    (report,) = parse_pdf(w.build())
    assert detect_table(report.text_elements) is None
