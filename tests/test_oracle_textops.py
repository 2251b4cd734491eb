"""Oracle text-op parity tests.

Ports the reference's own unit assertions
(/root/reference/backend/tests/test_unit_ocr_utils.py) against our
pure-Python re-implementations.
"""

import pytest

from typhoon_ocr_spark.oracle import (
    cap_split_string,
    cleanup_element_text,
    fix_text_lite,
)


class TestCapSplitString:
    @pytest.mark.parametrize(
        "text,max_length",
        [("short", 10), ("exact length", 12), ("", 5), ("a", 1)],
    )
    def test_no_truncation(self, text, max_length):
        assert cap_split_string(text, max_length) == text

    def test_truncation_with_space(self):
        text = "This is a long text that needs to be truncated"
        out = cap_split_string(text, 20)
        assert "..." in out
        assert len(out) <= 20
        assert "This" in out
        assert "uncated" in out

    def test_truncation_without_space(self):
        out = cap_split_string("verylongwordwithoutspaces", 10)
        assert "..." in out
        assert len(out) <= 10

    def test_very_small_max_length(self):
        assert isinstance(cap_split_string("some text", 2), str)

    def test_exact_reference_arithmetic(self):
        # head window = first max//2-3 chars backed to last space;
        # tail window = last max//2-3 chars advanced past first space.
        text = "aaaa bbbb cccc dddd eeee"
        out = cap_split_string(text, 20)
        # keep = 7 → head window "aaaa bb" → "aaaa"; tail "dd eeee" → "eeee"
        assert out == "aaaa ... eeee"


class TestCleanupElementText:
    def test_basic(self):
        assert cleanup_element_text("Hello World") == "Hello World"

    def test_escaping(self):
        out = cleanup_element_text("Text with [brackets] and\nnewlines\tand\ttabs")
        assert "\\[" in out and "\\]" in out and "\\n" in out and "\\t" in out
        assert out == "Text with \\[brackets\\] and\\nnewlines\\tand\\ttabs"

    def test_cap_at_250(self):
        out = cleanup_element_text("x" * 300)
        assert len(out) <= 250
        assert "..." in out

    def test_whitespace_stripped(self):
        assert cleanup_element_text("  text with spaces  ") == "text with spaces"

    def test_carriage_return(self):
        assert cleanup_element_text("a\rb") == "a\\rb"


class TestFixTextLite:
    def test_ascii_identity(self):
        assert fix_text_lite("plain ascii text") == "plain ascii text"

    def test_thai_identity(self):
        assert fix_text_lite("ภาษาไทย") == "ภาษาไทย"

    def test_latin1_utf8_mojibake(self):
        # "café" mis-decoded as latin-1
        mojibake = "café".encode("utf-8").decode("latin-1")
        assert fix_text_lite(mojibake) == "café"

    def test_legit_accented_text_untouched(self):
        assert fix_text_lite("café") == "café"

    def test_nfc_normalization(self):
        decomposed = "é"  # e + combining acute
        assert fix_text_lite(decomposed) == "é"
