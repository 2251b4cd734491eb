"""Print the builtin 5x7 face as terminal art and write a demo page
render PNG — quick visual evidence for the glyph work (no Spark).

Usage: python tools/font_preview.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from typhoon_ocr_spark.oracle.font import GLYPH_ROWS, glyph_rows  # noqa: E402


def show(text: str) -> None:
    lines = [""] * GLYPH_ROWS
    for ch in text:
        g = glyph_rows(ch)
        for r in range(GLYPH_ROWS):
            lines[r] += g[r].replace("0", " ").replace("1", "█") + " "
    print("\n".join(lines))
    print()


def main() -> None:
    show("The quick brown fox 123")
    show("jumps over the lazy dog!")
    show("กขคงจฉชซญ")          # consonant sample (feature-schematic)
    show("ดตถทนบปผฝ")
    show("ภมยรลวสหอ")
    show("๐๑๒๓๔๕๖๗๘๙")          # Thai digits
    if len(sys.argv) > 1:
        from typhoon_ocr_spark.oracle.pdfmini import MiniPdfWriter, parse_pdf
        from typhoon_ocr_spark.oracle.render import render_page_to_png

        w = MiniPdfWriter()
        page = w.add_page()
        page.text(40, 700, "Typhoon OCR Spark - font demo")
        page.text(40, 660, "ASCII: The quick brown fox jumps over the lazy dog")
        page.text(40, 620, "Thai: ข้อมูล เอกสาร ภาษาไทย ประมวลผล")
        page.text(40, 580, "Marks: กิ กี กึ กื กุ กู ก่ ก้ ก๊ ก๋ ก์")
        png = render_page_to_png(parse_pdf(w.build())[0], 1024)
        with open(sys.argv[1], "wb") as fh:
            fh.write(png)
        print(f"wrote {sys.argv[1]} ({len(png)} bytes)")


if __name__ == "__main__":
    main()
