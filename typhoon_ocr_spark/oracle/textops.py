"""Text cleanup primitives matching the reference's element-text path.

Reference behavior being matched (cited, not copied):
- head/tail capping with ``" ... "`` joiner:
  /root/reference/packages/typhoon_ocr/typhoon_ocr/ocr_utils.py:253-263
- element cleanup (ftfy repair -> strip -> escape -> 250-char cap):
  ocr_utils.py:266-276

``ftfy`` is not available in this environment and is enormous; per the
documented subset (SURVEY.md §7.4) ``fix_text_lite`` implements exactly:
latin-1<->utf-8 mojibake repair followed by NFC normalization. Fixture
text is constrained to inputs where full ftfy and this subset agree
(guarded by tests).
"""

from __future__ import annotations

import re
import unicodedata

ELEMENT_TEXT_CAP = 250

# Escape table for characters that would corrupt the [XxY]text anchor
# line format (ocr_utils.py:268).
_ESCAPES = {"[": "\\[", "]": "\\]", "\n": "\\n", "\r": "\\r", "\t": "\\t"}
_ESCAPE_RE = re.compile("|".join(re.escape(c) for c in _ESCAPES))


def cap_split_string(text: str, max_length: int) -> str:
    """Cap ``text`` at ``max_length`` by keeping a head and a tail joined
    with ``" ... "`` (ocr_utils.py:253-263).

    The head is the first ``max_length//2 - 3`` characters, backed off to
    the last space inside that window when one exists; the tail is the
    last ``max_length//2 - 3`` characters, advanced past the first space
    inside that window when one exists.
    """
    if len(text) <= max_length:
        return text

    keep = max_length // 2 - 3

    head_window = text[:keep]
    head = head_window.rsplit(" ", 1)[0] or head_window

    tail_window = text[-keep:]
    tail = tail_window.split(" ", 1)[-1] or tail_window

    return f"{head} ... {tail}"


def fix_text_lite(text: str) -> str:
    """Documented ftfy subset (SURVEY.md §7.4): repair the classic
    utf-8-bytes-read-as-latin-1 mojibake, then normalize to NFC.

    The repair is attempted only when the whole string survives a
    latin-1 encode AND the resulting bytes decode as valid utf-8 to a
    *different* string containing at least one non-ASCII character —
    i.e. the text actually looks like mojibake. Plain ASCII and any text
    containing characters outside latin-1 (e.g. Thai) pass through
    untouched, which matches ftfy's behavior on such inputs.
    """
    repaired = text
    try:
        raw = text.encode("latin-1")
        candidate = raw.decode("utf-8")
        if candidate != text and any(ord(ch) > 127 for ch in candidate):
            repaired = candidate
    except (UnicodeEncodeError, UnicodeDecodeError):
        pass
    return unicodedata.normalize("NFC", repaired)


def cleanup_element_text(text: str) -> str:
    """Element-text cleanup: repair -> strip -> escape -> cap at 250
    (ocr_utils.py:266-276)."""
    cleaned = fix_text_lite(text).strip()
    cleaned = _ESCAPE_RE.sub(lambda m: _ESCAPES[m.group(0)], cleaned)
    return cap_split_string(cleaned, ELEMENT_TEXT_CAP)


def is_base64_string(value: str) -> bool:
    """Base64 round-trip validity check (ocr_utils.py:627-632): decode
    leniently, re-encode, compare the first 10 encoded bytes."""
    import base64

    try:
        return base64.b64encode(base64.b64decode(value))[:10] == value.encode()[:10]
    except Exception:
        return False
