"""Builtin deterministic 5x7 bitmap font for page rasters.

The reference renders pages through a real font rasterizer (pdftoppm /
pypdfium behind ``render_pdf_to_base64png``, ocr_utils.py:115-146) and
its prompts target Thai documents (ocr_utils.py:440-465); no font stack
exists in this sandbox, so the engine ships its own face:

- ASCII: a hand-designed 5x7 dot-matrix face (the classic LED-matrix
  proportions) with DISTINCT lowercase forms — legible at render scale.
- Thai (U+0E01-U+0E5B): a feature-schematic face. Every glyph is built
  from the structural features Thai typography actually distinguishes
  letters by — base frame (arch ∩ / cup ∪ / double forms / bowl),
  head-loop placement (the small circle that starts most letters,
  inner/outer at a specific corner), top serrations (ฃ ฅ ซ ต ฒ ...),
  right ascenders (ช ซ ป ฝ ฟ ...), and base trays (ฎ ฏ ฐ ญ). The
  result evokes rather than reproduces type-quality outlines, but
  every codepoint is visually distinct, deterministic, and built from
  its real letterform structure — not hash noise.
- Thai combining marks (above vowels/tone marks U+0E31,34-37,47-4E;
  below vowels U+0E38-3A) carry zero advance and render over/under the
  preceding base consonant (oracle/render.py), as real shaping does.
- Anything else non-ASCII/non-Thai still gets the deterministic
  md5-derived pattern (stable, per-character-distinct, never blank) so
  unknown scripts remain text-sensitive in renders.

Every glyph is 7 rows (top to bottom) of 5-character '0'/'1' strings.
Pure data + deterministic builders; zero dependencies.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import Dict, List, Tuple

GLYPH_COLS = 5
GLYPH_ROWS = 7

# ---------------------------------------------------------------------------
# ASCII 5x7 face (distinct lowercase)
# ---------------------------------------------------------------------------

_F: Dict[str, Tuple[str, ...]] = {
    " ": ("00000",) * 7,
    "A": ("01110", "10001", "10001", "11111", "10001", "10001", "10001"),
    "B": ("11110", "10001", "10001", "11110", "10001", "10001", "11110"),
    "C": ("01110", "10001", "10000", "10000", "10000", "10001", "01110"),
    "D": ("11110", "10001", "10001", "10001", "10001", "10001", "11110"),
    "E": ("11111", "10000", "10000", "11110", "10000", "10000", "11111"),
    "F": ("11111", "10000", "10000", "11110", "10000", "10000", "10000"),
    "G": ("01110", "10001", "10000", "10111", "10001", "10001", "01111"),
    "H": ("10001", "10001", "10001", "11111", "10001", "10001", "10001"),
    "I": ("01110", "00100", "00100", "00100", "00100", "00100", "01110"),
    "J": ("00111", "00010", "00010", "00010", "00010", "10010", "01100"),
    "K": ("10001", "10010", "10100", "11000", "10100", "10010", "10001"),
    "L": ("10000", "10000", "10000", "10000", "10000", "10000", "11111"),
    "M": ("10001", "11011", "10101", "10101", "10001", "10001", "10001"),
    "N": ("10001", "11001", "10101", "10011", "10001", "10001", "10001"),
    "O": ("01110", "10001", "10001", "10001", "10001", "10001", "01110"),
    "P": ("11110", "10001", "10001", "11110", "10000", "10000", "10000"),
    "Q": ("01110", "10001", "10001", "10001", "10101", "10010", "01101"),
    "R": ("11110", "10001", "10001", "11110", "10100", "10010", "10001"),
    "S": ("01111", "10000", "10000", "01110", "00001", "00001", "11110"),
    "T": ("11111", "00100", "00100", "00100", "00100", "00100", "00100"),
    "U": ("10001", "10001", "10001", "10001", "10001", "10001", "01110"),
    "V": ("10001", "10001", "10001", "10001", "10001", "01010", "00100"),
    "W": ("10001", "10001", "10001", "10101", "10101", "11011", "10001"),
    "X": ("10001", "10001", "01010", "00100", "01010", "10001", "10001"),
    "Y": ("10001", "10001", "01010", "00100", "00100", "00100", "00100"),
    "Z": ("11111", "00001", "00010", "00100", "01000", "10000", "11111"),
    "a": ("00000", "00000", "01110", "00001", "01111", "10001", "01111"),
    "b": ("10000", "10000", "10110", "11001", "10001", "10001", "11110"),
    "c": ("00000", "00000", "01110", "10000", "10000", "10001", "01110"),
    "d": ("00001", "00001", "01101", "10011", "10001", "10001", "01111"),
    "e": ("00000", "00000", "01110", "10001", "11111", "10000", "01110"),
    "f": ("00110", "01001", "01000", "11100", "01000", "01000", "01000"),
    "g": ("00000", "01111", "10001", "10001", "01111", "00001", "01110"),
    "h": ("10000", "10000", "10110", "11001", "10001", "10001", "10001"),
    "i": ("00100", "00000", "01100", "00100", "00100", "00100", "01110"),
    "j": ("00010", "00000", "00110", "00010", "00010", "10010", "01100"),
    "k": ("10000", "10000", "10010", "10100", "11000", "10100", "10010"),
    "l": ("01100", "00100", "00100", "00100", "00100", "00100", "01110"),
    "m": ("00000", "00000", "11010", "10101", "10101", "10101", "10101"),
    "n": ("00000", "00000", "10110", "11001", "10001", "10001", "10001"),
    "o": ("00000", "00000", "01110", "10001", "10001", "10001", "01110"),
    "p": ("00000", "00000", "11110", "10001", "11110", "10000", "10000"),
    "q": ("00000", "00000", "01101", "10011", "01111", "00001", "00001"),
    "r": ("00000", "00000", "10110", "11001", "10000", "10000", "10000"),
    "s": ("00000", "00000", "01110", "10000", "01110", "00001", "11110"),
    "t": ("01000", "01000", "11100", "01000", "01000", "01001", "00110"),
    "u": ("00000", "00000", "10001", "10001", "10001", "10011", "01101"),
    "v": ("00000", "00000", "10001", "10001", "10001", "01010", "00100"),
    "w": ("00000", "00000", "10001", "10001", "10101", "10101", "01010"),
    "x": ("00000", "00000", "10001", "01010", "00100", "01010", "10001"),
    "y": ("00000", "00000", "10001", "10001", "01111", "00001", "01110"),
    "z": ("00000", "00000", "11111", "00010", "00100", "01000", "11111"),
    "0": ("01110", "10001", "10011", "10101", "11001", "10001", "01110"),
    "1": ("00100", "01100", "00100", "00100", "00100", "00100", "01110"),
    "2": ("01110", "10001", "00001", "00010", "00100", "01000", "11111"),
    "3": ("11111", "00010", "00100", "00010", "00001", "10001", "01110"),
    "4": ("00010", "00110", "01010", "10010", "11111", "00010", "00010"),
    "5": ("11111", "10000", "11110", "00001", "00001", "10001", "01110"),
    "6": ("00110", "01000", "10000", "11110", "10001", "10001", "01110"),
    "7": ("11111", "00001", "00010", "00100", "01000", "01000", "01000"),
    "8": ("01110", "10001", "10001", "01110", "10001", "10001", "01110"),
    "9": ("01110", "10001", "10001", "01111", "00001", "00010", "01100"),
    ".": ("00000", "00000", "00000", "00000", "00000", "01100", "01100"),
    ",": ("00000", "00000", "00000", "00000", "01100", "00100", "01000"),
    ":": ("00000", "01100", "01100", "00000", "01100", "01100", "00000"),
    ";": ("00000", "01100", "01100", "00000", "01100", "00100", "01000"),
    "!": ("00100", "00100", "00100", "00100", "00100", "00000", "00100"),
    "?": ("01110", "10001", "00001", "00010", "00100", "00000", "00100"),
    "-": ("00000", "00000", "00000", "11111", "00000", "00000", "00000"),
    "+": ("00000", "00100", "00100", "11111", "00100", "00100", "00000"),
    "=": ("00000", "00000", "11111", "00000", "11111", "00000", "00000"),
    "_": ("00000", "00000", "00000", "00000", "00000", "00000", "11111"),
    "/": ("00001", "00001", "00010", "00100", "01000", "10000", "10000"),
    "\\": ("10000", "10000", "01000", "00100", "00010", "00001", "00001"),
    "(": ("00010", "00100", "01000", "01000", "01000", "00100", "00010"),
    ")": ("01000", "00100", "00010", "00010", "00010", "00100", "01000"),
    "[": ("01110", "01000", "01000", "01000", "01000", "01000", "01110"),
    "]": ("01110", "00010", "00010", "00010", "00010", "00010", "01110"),
    "{": ("00010", "00100", "00100", "01000", "00100", "00100", "00010"),
    "}": ("01000", "00100", "00100", "00010", "00100", "00100", "01000"),
    "*": ("00000", "00100", "10101", "01110", "10101", "00100", "00000"),
    "'": ("01100", "00100", "01000", "00000", "00000", "00000", "00000"),
    '"': ("01010", "01010", "01010", "00000", "00000", "00000", "00000"),
    "`": ("01000", "00100", "00000", "00000", "00000", "00000", "00000"),
    "%": ("11000", "11001", "00010", "00100", "01000", "10011", "00011"),
    "#": ("01010", "01010", "11111", "01010", "11111", "01010", "01010"),
    "@": ("01110", "10001", "00001", "01101", "10101", "10101", "01110"),
    "&": ("01100", "10010", "10100", "01000", "10101", "10010", "01101"),
    "$": ("00100", "01111", "10100", "01110", "00101", "11110", "00100"),
    "<": ("00010", "00100", "01000", "10000", "01000", "00100", "00010"),
    ">": ("01000", "00100", "00010", "00001", "00010", "00100", "01000"),
    "|": ("00100", "00100", "00100", "00100", "00100", "00100", "00100"),
    "^": ("00100", "01010", "10001", "00000", "00000", "00000", "00000"),
    "~": ("00000", "00000", "01000", "10101", "00010", "00000", "00000"),
}


# ---------------------------------------------------------------------------
# Thai feature-schematic face
# ---------------------------------------------------------------------------
# Builders operate on a 7x5 bit grid; the letter body occupies rows 1-6
# (row 0 is reserved for ascender flags and top serrations), matching
# Thai's x-height-dominant proportions.


def _grid() -> List[List[int]]:
    return [[0] * GLYPH_COLS for _ in range(GLYPH_ROWS)]


def _v(g, c, r0, r1):
    for r in range(r0, r1 + 1):
        g[r][c] = 1


def _h(g, r, c0, c1):
    for c in range(c0, c1 + 1):
        g[r][c] = 1


def _dot(g, r, c):
    if 0 <= r < GLYPH_ROWS and 0 <= c < GLYPH_COLS:
        g[r][c] = 1


def _head(g, r, c):
    """The head loop (2x2 blob) that starts most Thai letters."""
    for dr in (0, 1):
        for dc in (0, 1):
            _dot(g, r + dr, c + dc)


def _base(g, kind: str) -> None:
    if kind == "arch":         # ∩: top bar, both stems to baseline
        _h(g, 1, 0, 4); _v(g, 0, 1, 6); _v(g, 4, 1, 6)
    elif kind == "cup":        # ∪: baseline bar, both stems to top
        _h(g, 6, 0, 4); _v(g, 0, 1, 6); _v(g, 4, 1, 6)
    elif kind == "dbl_arch":   # ∩ with centre stem (ท ฑ ม ...)
        _base(g, "arch"); _v(g, 2, 1, 6)
    elif kind == "dbl_cup":    # ∪ with centre stem (ผ พ น ...)
        _base(g, "cup"); _v(g, 2, 1, 6)
    elif kind == "bowl":       # closed oval (อ ฮ)
        _h(g, 1, 1, 3); _h(g, 6, 1, 3); _v(g, 0, 2, 5); _v(g, 4, 2, 5)
    elif kind == "hook":       # ∨ diagonal with right rise (ง ว)
        _dot(g, 2, 0); _dot(g, 3, 1); _dot(g, 4, 2); _dot(g, 5, 3)
        _v(g, 4, 1, 6); _dot(g, 6, 3); _dot(g, 6, 4)
    elif kind == "stem":       # single right-leaning stroke (ร)
        _v(g, 2, 2, 5); _dot(g, 6, 3); _dot(g, 6, 1)


_NOTCH_ROW = 0  # serration drawn above the body's top bar


def _notch(g):
    """Top serration (the zigzag distinguishing ฃ ฅ ซ ต ฒ...)."""
    _dot(g, _NOTCH_ROW, 1)
    _dot(g, _NOTCH_ROW, 3)


def _asc(g, c=4):
    """Right ascender: the stem rises through row 0 with a flag."""
    _v(g, c, 0, 1)
    _dot(g, 0, c - 1)


def _tray(g):
    """Descender tray (ฎ ฏ ฐ ญ base element): open box on row 6."""
    _h(g, 6, 0, 4)
    _dot(g, 5, 0)
    _dot(g, 5, 4)


# Per-letter feature specs: (base, [(feature, args...)...]).
# Head positions are (row, col) of the 2x2 loop — chosen per letter from
# where the real letterform's head sits (inner/outer, top/bottom).
_THAI_SPECS: Dict[int, Tuple[str, Tuple]] = {
    0x0E01: ("arch", ()),                                   # ก plain arch
    0x0E02: ("cup", (("head", 2, 1),)),                     # ข head top-left inner
    0x0E03: ("cup", (("head", 2, 1), ("notch",))),          # ฃ = ข + serration
    0x0E04: ("arch", (("head", 3, 1),)),                    # ค head mid-left inner
    0x0E05: ("arch", (("head", 3, 1), ("notch",))),         # ฅ = ค + serration
    0x0E06: ("dbl_arch", (("head", 3, 0),)),                # ฆ bell: double + head
    0x0E07: ("hook", (("head", 1, 0),)),                    # ง head high-left, hook
    0x0E08: ("cup", (("head", 1, 1), ("dot", 3, 2))),       # จ inward top curl
    0x0E09: ("dbl_cup", (("head", 4, 0), ("asc",))),        # ฉ double + ascender
    0x0E0A: ("cup", (("head", 2, 1), ("asc",))),            # ช = ข + ascender
    0x0E0B: ("cup", (("head", 2, 1), ("notch",), ("asc",))),  # ซ = ช + serration
    0x0E0C: ("dbl_cup", (("head", 4, 0), ("asc",), ("dot", 2, 3))),  # ฌ
    0x0E0D: ("dbl_cup", (("head", 4, 0), ("tray",))),       # ญ double + base tray
    0x0E0E: ("arch", (("head", 5, 1), ("tray",))),          # ฎ = ด + tray
    0x0E0F: ("arch", (("head", 5, 1), ("notch",), ("tray",))),  # ฏ = ต + tray
    0x0E10: ("arch", (("head", 3, 1), ("tray",), ("dot", 4, 3))),  # ฐ
    0x0E11: ("dbl_arch", (("notch",),)),                    # ฑ double + serration
    0x0E12: ("dbl_arch", (("notch",), ("head", 4, 0))),     # ฒ elder
    0x0E13: ("dbl_cup", (("head", 4, 3),)),                 # ณ head right side
    0x0E14: ("arch", (("head", 5, 1),)),                    # ด head bottom inner
    0x0E15: ("arch", (("head", 5, 1), ("notch",))),         # ต = ด + serration
    0x0E16: ("arch", (("head", 4, 1),)),                    # ถ head raised inner-left
    0x0E17: ("dbl_arch", (("dot", 0, 0), ("dot", 0, 1))),   # ท top-left flag
    0x0E18: ("stem", (("head", 1, 1), ("h", 3, 1, 3))),     # ธ bar through stem
    0x0E19: ("dbl_cup", (("head", 5, 1),)),                 # น head at centre base
    0x0E1A: ("cup", (("head", 5, 0),)),                     # บ head bottom-left
    0x0E1B: ("cup", (("head", 5, 0), ("asc",))),            # ป = บ + ascender
    0x0E1C: ("dbl_cup", (("head", 3, 0),)),                 # ผ head mid-left
    0x0E1D: ("dbl_cup", (("head", 3, 0), ("asc",))),        # ฝ = ผ + ascender
    0x0E1E: ("dbl_cup", (("head", 3, 0), ("dot", 4, 3))),   # พ
    0x0E1F: ("dbl_cup", (("head", 3, 0), ("dot", 4, 3), ("asc",))),  # ฟ
    0x0E20: ("arch", (("head", 5, 0), ("v", 1, 4, 6))),     # ภ head outer-left
    0x0E21: ("dbl_arch", (("head", 5, 0),)),                # ม
    0x0E22: ("cup", (("head", 1, 0), ("dot", 3, 2), ("dot", 4, 2))),  # ย
    0x0E23: ("stem", (("head", 1, 1), ("dot", 4, 3))),      # ร head + flared stem
    0x0E24: ("stem", (("head", 1, 1), ("dot", 4, 3), ("v", 4, 4, 6), ("dot", 6, 3))),  # ฤ = ร + leg
    0x0E25: ("cup", (("head", 1, 1), ("dot", 0, 2))),       # ล top curl
    0x0E26: ("cup", (("head", 1, 1), ("dot", 0, 2), ("dot", 4, 2))),  # ฦ inner tick
    0x0E27: ("hook", (("head", 2, 0),)),                    # ว
    0x0E28: ("arch", (("head", 3, 1), ("dot", 0, 2), ("dot", 0, 3))),  # ศ
    0x0E29: ("dbl_cup", (("head", 4, 3), ("notch",))),      # ษ
    0x0E2A: ("cup", (("head", 1, 1), ("dot", 0, 2), ("dot", 3, 3))),  # ส
    0x0E2B: ("dbl_arch", (("head", 1, 0),)),                # ห head high-left
    0x0E2C: ("dbl_arch", (("head", 1, 0), ("asc",))),       # ฬ
    0x0E2D: ("bowl", (("dot", 2, 2),)),                     # อ inner top curl
    0x0E2E: ("bowl", (("dot", 2, 2), ("notch",))),          # ฮ
    # spacing vowels / signs
    0x0E30: ("", (("h", 2, 1, 3), ("h", 3, 1, 3), ("h", 5, 1, 3), ("h", 6, 1, 3))),  # ะ
    0x0E32: ("", (("v", 3, 1, 6), ("dot", 0, 2), ("dot", 0, 1), ("dot", 1, 1))),  # า
    0x0E33: ("", (("v", 3, 2, 6), ("dot", 1, 3), ("dot", 0, 1), ("dot", 1, 0))),  # ำ ring + า
    0x0E40: ("", (("v", 2, 1, 6), ("dot", 1, 1), ("dot", 0, 1))),   # เ
    0x0E41: ("", (("v", 1, 1, 6), ("v", 3, 1, 6), ("dot", 0, 0), ("dot", 0, 2))),  # แ
    0x0E42: ("", (("v", 2, 1, 6), ("dot", 0, 3), ("dot", 1, 3), ("dot", 0, 4))),  # โ
    0x0E43: ("", (("v", 3, 1, 6), ("dot", 0, 2), ("dot", 1, 1), ("dot", 2, 2))),  # ใ
    0x0E44: ("", (("v", 3, 1, 6), ("dot", 0, 2), ("dot", 1, 2), ("dot", 0, 1))),  # ไ
    0x0E45: ("", (("v", 3, 2, 6), ("dot", 1, 2))),          # ๅ
    0x0E2F: ("", (("v", 1, 3, 6), ("dot", 2, 2), ("dot", 2, 3), ("dot", 6, 2))),  # ฯ
    0x0E46: ("", (("v", 2, 2, 6), ("dot", 1, 1), ("dot", 1, 3), ("dot", 6, 3))),  # ๆ
    0x0E3F: ("", (("v", 2, 0, 6), ("h", 2, 1, 3), ("h", 4, 1, 3), ("dot", 3, 4))),  # ฿
    0x0E4F: ("", (("h", 2, 1, 3), ("h", 5, 1, 3), ("v", 0, 3, 4), ("v", 4, 3, 4), ("dot", 3, 2))),  # ๏
    0x0E5A: ("", (("v", 1, 1, 6), ("v", 3, 1, 6), ("dot", 6, 4))),  # ๚
    0x0E5B: ("", (("v", 1, 1, 6), ("v", 3, 1, 6), ("dot", 6, 4), ("dot", 0, 4))),  # ๛
    # Thai digits ๐-๙: oval-derived forms with distinguishing hooks
    0x0E50: ("bowl", ()),                                   # ๐
    0x0E51: ("bowl", (("dot", 3, 2), ("dot", 4, 2))),       # ๑
    0x0E52: ("bowl", (("dot", 0, 3), ("dot", 0, 4))),       # ๒
    0x0E53: ("bowl", (("dot", 0, 1), ("dot", 0, 3))),       # ๓
    0x0E54: ("", (("head", 1, 0), ("v", 3, 1, 6), ("dot", 4, 2), ("dot", 5, 1))),  # ๔
    0x0E55: ("", (("head", 4, 0), ("v", 3, 1, 4), ("h", 1, 2, 3), ("dot", 5, 3), ("dot", 6, 2))),  # ๕
    0x0E56: ("", (("head", 1, 1), ("v", 1, 3, 6), ("h", 6, 1, 3))),  # ๖
    0x0E57: ("", (("head", 4, 0), ("v", 3, 1, 6), ("dot", 1, 2), ("dot", 0, 3))),  # ๗
    0x0E58: ("", (("head", 4, 0), ("v", 3, 2, 6), ("dot", 1, 3), ("dot", 0, 4), ("dot", 2, 2))),  # ๘
    0x0E59: ("", (("head", 1, 0), ("v", 3, 2, 6), ("dot", 1, 3), ("dot", 0, 4))),  # ๙
}

# Combining marks: drawn with zero advance over (above) or under
# (below) the preceding base cell. Above-mark ink sits in the BOTTOM
# rows of a cell rendered one line higher; below-mark ink sits in the
# TOP rows of a cell rendered one line lower (oracle/render.py).
_THAI_ABOVE: Dict[int, Tuple[str, ...]] = {
    0x0E31: ("00000", "00000", "00000", "00000", "01110", "10001", "00000"),  # ั
    0x0E34: ("00000", "00000", "00000", "00000", "01110", "01000", "00000"),  # ิ
    0x0E35: ("00000", "00000", "00000", "00000", "01110", "01010", "00000"),  # ี
    0x0E36: ("00000", "00000", "00000", "00100", "01110", "01000", "00000"),  # ึ
    0x0E37: ("00000", "00000", "00000", "01010", "01110", "01000", "00000"),  # ื
    0x0E47: ("00000", "00000", "00000", "01100", "10010", "01100", "00000"),  # ็
    0x0E48: ("00000", "00000", "00000", "00000", "00100", "00100", "00000"),  # ่
    0x0E49: ("00000", "00000", "00000", "00100", "01010", "00100", "00000"),  # ้
    0x0E4A: ("00000", "00000", "00000", "00100", "01110", "00100", "00000"),  # ๊
    0x0E4B: ("00000", "00000", "00100", "00000", "01110", "00100", "00000"),  # ๋
    0x0E4C: ("00000", "00000", "00000", "01100", "10100", "01000", "00000"),  # ์
    0x0E4D: ("00000", "00000", "00000", "01100", "10010", "01100", "01000"),  # ํ
    0x0E4E: ("00000", "00000", "01010", "10101", "01010", "00000", "00000"),  # ๎
}
_THAI_BELOW: Dict[int, Tuple[str, ...]] = {
    0x0E38: ("00100", "00110", "00000", "00000", "00000", "00000", "00000"),  # ุ
    0x0E39: ("00100", "00110", "01100", "00000", "00000", "00000", "00000"),  # ู
    0x0E3A: ("01100", "01100", "00000", "00000", "00000", "00000", "00000"),  # ฺ
}


def is_combining_above(ch: str) -> bool:
    return ord(ch) in _THAI_ABOVE


def is_combining_below(ch: str) -> bool:
    return ord(ch) in _THAI_BELOW


def _build_thai(cp: int) -> List[str]:
    base, feats = _THAI_SPECS[cp]
    g = _grid()
    if base:
        _base(g, base)
    for feat in feats:
        kind = feat[0]
        if kind == "head":
            _head(g, feat[1], feat[2])
        elif kind == "notch":
            _notch(g)
        elif kind == "asc":
            _asc(g)
        elif kind == "tray":
            _tray(g)
        elif kind == "dot":
            _dot(g, feat[1], feat[2])
        elif kind == "v":
            _v(g, feat[1], feat[2], feat[3])
        elif kind == "h":
            _h(g, feat[1], feat[2], feat[3])
    return ["".join("1" if b else "0" for b in row) for row in g]


# Latin diacritics, composed via NFD: accent ink for the two top rows
# (x-height lowercase leaves rows 0-1 free; tall glyphs get the accent
# merged over whatever row-0 ink they have, as compact faces do).
_LATIN_ACCENTS: Dict[int, Tuple[str, str]] = {
    0x0300: ("01000", "00100"),  # grave
    0x0301: ("00100", "01000"),  # acute
    0x0302: ("00100", "01010"),  # circumflex
    0x0303: ("01101", "10110"),  # tilde
    0x0304: ("00000", "01110"),  # macron
    0x0306: ("10001", "01110"),  # breve
    0x0307: ("00000", "00100"),  # dot above
    0x0308: ("00000", "01010"),  # diaeresis
    0x030A: ("01010", "01010"),  # ring above
    0x030C: ("01010", "00100"),  # caron
    0x030B: ("01010", "10100"),  # double acute
}
_CEDILLA = 0x0327  # rendered as a hook on the bottom row


def _compose_latin(ch: str):
    """Accented Latin letter → base ASCII glyph + accent overlay, or
    None when the decomposition isn't base+known-marks."""
    import unicodedata

    decomp = unicodedata.normalize("NFD", ch)
    base, marks = decomp[0], decomp[1:]
    if base not in _F or not marks:
        return None
    if not all(ord(m) in _LATIN_ACCENTS or ord(m) == _CEDILLA for m in marks):
        return None
    rows = list(_F[base])
    above = [m for m in marks if ord(m) in _LATIN_ACCENTS]
    if above:
        if base in "ij":
            # the dot gives way to the accent (proper typography)
            rows[0] = "00000"
        if rows[0] != "00000" or rows[1] != "00000":
            # tall glyph: squash into rows 2-6 (keep top/middle/bottom
            # structure, drop rows 1 and 5) so the accent sits clear —
            # otherwise Â/Ä/Å would all merge into the letter's own ink
            rows = ["00000", "00000", rows[0], rows[2], rows[3], rows[4], rows[6]]
    for m in marks:
        if ord(m) == _CEDILLA:
            # letter shifts up one row; the hook hangs on the freed
            # bottom row (a merged hook would vanish into bottom bars)
            rows = [rows[0]] + rows[2:7] + ["01100"]
            continue
        top = _LATIN_ACCENTS[ord(m)]
        for r in (0, 1):
            rows[r] = "".join(
                "1" if (top[r][c] == "1" or rows[r][c] == "1") else "0"
                for c in range(GLYPH_COLS)
            )
    return rows


@lru_cache(maxsize=4096)
def glyph_rows(ch: str) -> List[str]:
    """5x7 bitmap for one character, top row first. ASCII comes from
    the hand-designed face (lowercase distinct); accented Latin
    composes base + diacritic via NFD; Thai from the feature-schematic
    builder; combining marks from the mark tables; any other codepoint
    hashes to a deterministic non-blank pattern (bit k of the md5 of
    the codepoint)."""
    if ch in _F:
        return list(_F[ch])
    cp = ord(ch)
    if cp in _THAI_ABOVE:
        return list(_THAI_ABOVE[cp])
    if cp in _THAI_BELOW:
        return list(_THAI_BELOW[cp])
    if cp in _THAI_SPECS:
        return _build_thai(cp)
    if 0x00C0 <= cp <= 0x024F:
        composed = _compose_latin(ch)
        if composed is not None:
            return composed
    bits = bin(
        int(hashlib.md5(f"glyph5x7|{cp}".encode()).hexdigest()[:9], 16)
    )[2:].zfill(36)[: GLYPH_COLS * GLYPH_ROWS]
    if "1" not in bits:  # never render an unknown char as blank
        bits = "1" + bits[1:]
    return [
        bits[r * GLYPH_COLS : (r + 1) * GLYPH_COLS] for r in range(GLYPH_ROWS)
    ]
