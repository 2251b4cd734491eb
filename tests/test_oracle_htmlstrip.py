"""HTML boilerplate-strip oracle: frozen behavior fixtures.

This operator extends the reference's markdown flattener into
tag/text-density + link-density boilerplate removal (north rule); its
byte-identical target is this frozen oracle (SURVEY.md §7.3)."""

from typhoon_ocr_spark.oracle.htmlstrip import strip_html_boilerplate

ARTICLE = (
    "<html><head><title>T</title><script>var x=1;</script>"
    "<style>p{color:red}</style></head><body>"
    "<nav><a href='/'>Home</a> <a href='/b'>Blog</a> <a href='/c'>Contact</a></nav>"
    "<header><div>Site chrome lives here with enough text to trip naive filters</div></header>"
    "<article>"
    "<h1>Real Headline</h1>"
    "<p>This is the first real paragraph of the article body, long enough to keep.</p>"
    "<p>Second paragraph with more substantial content that should also be retained.</p>"
    "<p><a href='/x'>tiny</a></p>"
    "</article>"
    "<aside><p>Related links and promos that must be dropped entirely here.</p></aside>"
    "<footer><p>Copyright 2025 Example Corp. All rights reserved text.</p></footer>"
    "</body></html>"
)


def test_main_content_kept_chrome_dropped():
    out = strip_html_boilerplate(ARTICLE.encode())
    assert "Real Headline" in out
    assert "first real paragraph" in out
    assert "should also be retained" in out
    assert "Home" not in out
    assert "Site chrome" not in out
    assert "Related links" not in out
    assert "Copyright" not in out
    assert "var x=1" not in out
    assert "color:red" not in out


def test_blocks_joined_with_blank_line():
    out = strip_html_boilerplate(ARTICLE.encode())
    parts = out.split("\n\n")
    assert parts[0] == "Real Headline"
    assert parts[1].startswith("This is the first real paragraph")


def test_link_farm_dropped():
    html = (
        "<body><div>"
        "<a href='1'>Link one here</a> <a href='2'>Link two here</a> "
        "<a href='3'>Link three here</a> and"
        "</div>"
        "<p>A genuine paragraph of content without hyperlinks that easily passes.</p></body>"
    )
    out = strip_html_boilerplate(html.encode())
    assert "Link one" not in out
    assert "genuine paragraph" in out


def test_table_rows_tab_joined():
    html = (
        "<body><p>Intro paragraph long enough to be kept around the table.</p>"
        "<table><tr><th>name</th><th>qty</th></tr>"
        "<tr><td>apples</td><td>3</td></tr></table></body>"
    )
    out = strip_html_boilerplate(html.encode())
    assert "name\tqty" in out
    assert "apples\t3" in out


def test_entities_decoded():
    html = "<body><p>Fish &amp; chips &lt;today&gt; for &#3652;&#3607;&#3618; readers now</p></body>"
    out = strip_html_boilerplate(html.encode())
    assert "Fish & chips <today>" in out
    assert "ไทย" in out


def test_short_fragments_dropped():
    html = "<body><p>too short</p><p>This sentence is comfortably longer than the minimum.</p></body>"
    out = strip_html_boilerplate(html.encode())
    assert "too short" not in out
    assert "comfortably longer" in out


def test_bytes_and_str_agree():
    assert strip_html_boilerplate(ARTICLE) == strip_html_boilerplate(ARTICLE.encode())


def test_deterministic():
    assert strip_html_boilerplate(ARTICLE.encode()) == strip_html_boilerplate(ARTICLE.encode())


def test_malformed_tags_no_crash():
    html = b"<body><p>Paragraph with <b unclosed and <i>nested emphasis that runs long enough.</p>"
    out = strip_html_boilerplate(html)
    assert "nested emphasis" in out
