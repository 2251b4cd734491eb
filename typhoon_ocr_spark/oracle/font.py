"""Builtin deterministic 3x5 bitmap micro-font for page rasters.

The reference renders pages through a real font rasterizer (pdftoppm /
pypdfium behind ``render_pdf_to_base64png``, ocr_utils.py:115-146); no
font stack exists in this sandbox, so the engine ships its own minimal
dot-matrix font: hand-designed 3x5 glyphs for ASCII letters (lowercase
maps to the uppercase form, as micro-fonts conventionally do), digits,
and punctuation. Codepoints outside the table (Thai and anything else
non-ASCII) get a deterministic md5-derived 3x5 pattern — not legible
typography, but a stable, per-character-distinct glyph so two pages
differing only in text always differ in pixels (the glyphless round-2
renderer drew equal-length runs as identical boxes).

Every glyph is 5 rows (top to bottom) of 3-character '0'/'1' strings.
Pure data + one lookup function; zero dependencies.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import List

GLYPH_COLS = 3
GLYPH_ROWS = 5

_F = {
    " ": ("000", "000", "000", "000", "000"),
    "A": ("010", "101", "111", "101", "101"),
    "B": ("110", "101", "110", "101", "110"),
    "C": ("011", "100", "100", "100", "011"),
    "D": ("110", "101", "101", "101", "110"),
    "E": ("111", "100", "110", "100", "111"),
    "F": ("111", "100", "110", "100", "100"),
    "G": ("011", "100", "101", "101", "011"),
    "H": ("101", "101", "111", "101", "101"),
    "I": ("111", "010", "010", "010", "111"),
    "J": ("001", "001", "001", "101", "010"),
    "K": ("101", "110", "100", "110", "101"),
    "L": ("100", "100", "100", "100", "111"),
    "M": ("101", "111", "101", "101", "101"),
    "N": ("110", "101", "101", "101", "101"),
    "O": ("010", "101", "101", "101", "010"),
    "P": ("110", "101", "110", "100", "100"),
    "Q": ("010", "101", "101", "010", "001"),
    "R": ("110", "101", "110", "110", "101"),
    "S": ("011", "100", "010", "001", "110"),
    "T": ("111", "010", "010", "010", "010"),
    "U": ("101", "101", "101", "101", "111"),
    "V": ("101", "101", "101", "101", "010"),
    "W": ("101", "101", "101", "111", "101"),
    "X": ("101", "101", "010", "101", "101"),
    "Y": ("101", "101", "010", "010", "010"),
    "Z": ("111", "001", "010", "100", "111"),
    "0": ("111", "101", "101", "101", "111"),
    "1": ("010", "110", "010", "010", "111"),
    "2": ("110", "001", "010", "100", "111"),
    "3": ("111", "001", "011", "001", "111"),
    "4": ("101", "101", "111", "001", "001"),
    "5": ("111", "100", "110", "001", "110"),
    "6": ("011", "100", "111", "101", "111"),
    "7": ("111", "001", "010", "010", "010"),
    "8": ("111", "101", "111", "101", "111"),
    "9": ("111", "101", "111", "001", "110"),
    ".": ("000", "000", "000", "000", "010"),
    ",": ("000", "000", "000", "010", "100"),
    ":": ("000", "010", "000", "010", "000"),
    ";": ("000", "010", "000", "010", "100"),
    "!": ("010", "010", "010", "000", "010"),
    "?": ("110", "001", "010", "000", "010"),
    "-": ("000", "000", "111", "000", "000"),
    "+": ("000", "010", "111", "010", "000"),
    "=": ("000", "111", "000", "111", "000"),
    "_": ("000", "000", "000", "000", "111"),
    "/": ("001", "001", "010", "100", "100"),
    "\\": ("100", "100", "010", "001", "001"),
    "(": ("001", "010", "010", "010", "001"),
    ")": ("100", "010", "010", "010", "100"),
    "[": ("011", "010", "010", "010", "011"),
    "]": ("110", "010", "010", "010", "110"),
    "{": ("001", "010", "110", "010", "001"),
    "}": ("100", "010", "011", "010", "100"),
    "*": ("101", "010", "111", "010", "101"),
    "'": ("010", "010", "000", "000", "000"),
    '"': ("101", "101", "000", "000", "000"),
    "`": ("100", "010", "000", "000", "000"),
    "%": ("101", "001", "010", "100", "101"),
    "#": ("101", "111", "101", "111", "101"),
    "@": ("010", "101", "111", "100", "011"),
    "&": ("010", "101", "010", "101", "011"),
    "$": ("010", "111", "010", "111", "010"),
    "<": ("001", "010", "100", "010", "001"),
    ">": ("100", "010", "001", "010", "100"),
    "|": ("010", "010", "010", "010", "010"),
    "^": ("010", "101", "000", "000", "000"),
    "~": ("000", "011", "110", "000", "000"),
}


@lru_cache(maxsize=4096)
def glyph_rows(ch: str) -> List[str]:
    """3x5 bitmap for one character, top row first. ASCII letters fold
    to the uppercase table; unknown codepoints hash to a deterministic
    non-blank pattern (bit k of the md5 of the codepoint)."""
    up = ch.upper()
    if up in _F:
        return list(_F[up])
    bits = bin(
        int(hashlib.md5(f"glyph|{ord(ch)}".encode()).hexdigest()[:4], 16)
    )[2:].zfill(16)[:GLYPH_COLS * GLYPH_ROWS]
    if "1" not in bits:  # never render an unknown char as blank
        bits = "1" + bits[1:]
    return [
        bits[r * GLYPH_COLS : (r + 1) * GLYPH_COLS] for r in range(GLYPH_ROWS)
    ]
