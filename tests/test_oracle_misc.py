"""Prompts, response parsing, page ranges, markdown flatten goldens —
ported from the reference's unit/integration tests (SURVEY.md §5.1)."""

import pytest

from typhoon_ocr_spark.oracle import (
    get_prompt,
    markdown_to_plain_text,
    parse_page_ranges,
    parse_response_text,
)
from typhoon_ocr_spark.oracle.pagerange import target_pages
from typhoon_ocr_spark.oracle.prompts import (
    API_PARAMS,
    INVALID_PROMPT_TEXT,
    build_messages,
    extract_image_base64,
    render_prompt,
    repetition_penalty_for,
)


class TestPrompts:
    def test_default_and_structure_wrap_anchor(self):
        for name in ("default", "structure"):
            out = get_prompt(name)("sample extracted text")
            assert "sample extracted text" in out
            assert "RAW_TEXT_START" in out and "RAW_TEXT_END" in out
            assert "`natural_text`" in out

    def test_default_mentions_markdown_tables(self):
        assert "tables in markdown format" in render_prompt("default", "x")

    def test_structure_mentions_html_tables_and_figure(self):
        out = render_prompt("structure", "x")
        assert "tables in HTML format" in out
        assert "<figure>IMAGE_ANALYSIS</figure>" in out

    def test_v15_no_anchor_needed(self):
        thai = get_prompt("v1.5")(figure_language="Thai")
        eng = get_prompt("v1.5")(figure_language="English")
        assert "Thai" in thai and "English" in eng and thai != eng
        assert "RAW_TEXT_START" not in thai
        assert "☐" in thai and "☑" in thai
        assert "<page_number>" in thai

    def test_invalid_name(self):
        assert get_prompt("invalid_name")("any input") == INVALID_PROMPT_TEXT

    def test_message_envelope(self):
        msgs = build_messages("prompt!", "QUJD")
        assert msgs[0]["role"] == "user"
        assert msgs[0]["content"][0] == {"type": "text", "text": "prompt!"}
        assert msgs[0]["content"][1]["image_url"]["url"] == "data:image/png;base64,QUJD"
        assert extract_image_base64(msgs) == "QUJD"

    def test_api_parameter_goldens(self):
        # /root/reference/backend/tests/test_integration.py:285-295
        assert API_PARAMS == {"max_tokens": 16384, "temperature": 0.1, "top_p": 0.6}
        assert repetition_penalty_for("v1.5") == 1.1
        assert repetition_penalty_for("default") == 1.2


class TestParseResponseText:
    def test_plain_json(self):
        assert parse_response_text('{"natural_text": "Hello"}') == "Hello"

    def test_fenced_json(self):
        raw = 'Some preamble\n```json\n{"natural_text": "From fence"}\n```\ntail'
        assert parse_response_text(raw) == "From fence"

    def test_fenced_without_lang(self):
        raw = '```\n{"natural_text": "bare fence"}\n```'
        assert parse_response_text(raw) == "bare fence"

    def test_raw_passthrough(self):
        assert parse_response_text("  just markdown **text**  ") == "just markdown **text**"

    def test_figure_tags_dropped(self):
        assert parse_response_text("a <figure>pic of cat</figure> b") == "a pic of cat b"

    def test_none_and_empty(self):
        assert parse_response_text(None) == ""
        assert parse_response_text("   ") == ""

    def test_malformed_json_falls_back_to_raw(self):
        assert parse_response_text('{"natural_text": unquoted}') == '{"natural_text": unquoted}'

    def test_null_natural_text_falls_back(self):
        assert parse_response_text('{"natural_text": null}') == '{"natural_text": null}'


class TestPageRanges:
    def test_reference_example(self):
        assert parse_page_ranges("1-3,5") == [1, 2, 3, 5]

    def test_reversed_range_swapped(self):
        assert parse_page_ranges("5-3") == [3, 4, 5]

    def test_dedup_and_sort(self):
        assert parse_page_ranges("4,1,2-4,2") == [1, 2, 3, 4]

    def test_blank_parts_skipped(self):
        assert parse_page_ranges("1,,3") == [1, 3]

    def test_none(self):
        assert parse_page_ranges(None) is None
        assert parse_page_ranges("") is None

    def test_invalid_raises(self):
        with pytest.raises(ValueError):
            parse_page_ranges("1,a")

    def test_target_pages(self):
        assert target_pages([1, 2, 99], 5, True) == [1, 2]
        assert target_pages([99], 5, True) == []
        assert target_pages(None, 3, True) == [1, 2, 3]
        assert target_pages(None, 3, False) == [1]


class TestMarkdownFlatten:
    def test_headings_and_emphasis(self):
        assert markdown_to_plain_text("# Title\n\n**bold** and _it_") == "Title\n\nbold and it"

    def test_links_and_images(self):
        assert markdown_to_plain_text("See [docs](http://x) and ![alt](y.png)") == "See docs and alt"

    def test_table_flatten(self):
        md = "| a | b |\n|---|---|\n| 1 | 2 |"
        # Exact JS-parity: the reference's regex chain leaves a space
        # before the newline and after it (markdownText.ts:21-24).
        assert markdown_to_plain_text(md) == "a\tb \n 1\t2"

    def test_code_fence_unwrapped(self):
        assert markdown_to_plain_text("```python\nx = 1\n```") == "x = 1"

    def test_html_tags(self):
        assert markdown_to_plain_text("<p>hi</p><div>there</div>") == "hi\nthere"

    def test_br_and_collapse(self):
        assert markdown_to_plain_text("a<br>b\n\n\n\nc") == "a\nb\n\nc"

    def test_bullets_and_tasks(self):
        md = "- item\n* other\n- [x] done\n1. first\n---"
        assert markdown_to_plain_text(md) == "item\nother\ndone\nfirst"

    def test_empty(self):
        assert markdown_to_plain_text("") == ""


def test_mp3_id3v2_footer_flag_skipped():
    """ID3v2.4 footer (header byte 5 bit 4): 10 extra bytes after the
    tag body, NOT counted in the syncsafe size (ADVICE r4)."""
    from typhoon_ocr_spark.oracle.media import parse_mp3_meta, write_mp3

    plain = write_mp3(seed=3, n_frames=6)
    base = write_mp3(seed=3, n_frames=6, id3=True)
    assert base[:3] == b"ID3"
    size = (
        (base[6] & 0x7F) << 21 | (base[7] & 0x7F) << 14
        | (base[8] & 0x7F) << 7 | (base[9] & 0x7F)
    )
    body = base[10:10 + size]
    footer = b"3DI" + base[3:10]
    tagged = (
        b"ID3\x04\x00" + bytes([base[5] | 0x10]) + base[6:10]
        + body + footer + plain
    )
    assert parse_mp3_meta(tagged) == parse_mp3_meta(plain)


def test_mp3_bare_sync_needs_second_frame():
    """A single plausible frame header inside arbitrary bytes must not
    classify as mp3; a real stream (or a stream ending inside frame 1)
    still does (ADVICE r4)."""
    from typhoon_ocr_spark.oracle.media import sniff_media_kind, write_mp3

    real = write_mp3(seed=5, n_frames=4)
    assert sniff_media_kind(real) == "mp3"
    # valid first header, then garbage where frame 2 should start
    first_len = 144 * 128000 // 44100 + (5 % 2)
    fake = bytes(real[:4]) + b"\x00" * (first_len - 4) + b"garbage-tail" * 40
    assert sniff_media_kind(fake) is None
    # stream that ends inside the first frame is still mp3 (truncated
    # cohort contract: sniffed mp3, decode-error row downstream)
    assert sniff_media_kind(bytes(real[:30])) == "mp3"
