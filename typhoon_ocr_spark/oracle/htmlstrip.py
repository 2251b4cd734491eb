"""DOM-heuristic HTML boilerplate stripping → main-content plaintext.

The reference only ships a markdown flattener
(/root/reference/frontend/utils/markdownText.ts:1-37); the north rule
(BASELINE.json) extends that into tag/text-density + link-density
boilerplate removal in the style of the published jusText / Boilerpipe
heuristics. This module IS the frozen oracle for that branch: its exact
behavior is pinned by fixtures and tests, and the Spark UDF calls this
same function, so "byte-identical per url" is well-defined.

Algorithm (deterministic, stdlib-only, single pass):

1. decode bytes as utf-8 (errors → U+FFFD replacement).
2. drop comments and <script>/<style>/<noscript>/<template>/<svg>
   subtrees.
3. regex-tokenize into tags and text; html.unescape entity decoding.
4. segment into blocks at block-level tag boundaries (p, div, section,
   article, main, li, ul, ol, table, tr, h1-h6, blockquote, pre, br,
   figure, figcaption, dd, dt, dl); track per block:
   - chars of visible text, chars inside <a> (link chars),
   - number of tags seen inside the block (for tag density),
   - whether the block sits inside <nav>/<header>/<footer>/<aside>
     (dropped outright), and whether it is a heading or table row.
5. table rows render as tab-joined cell texts; other blocks as
   whitespace-collapsed text.
6. keep a block iff it is not inside chrome regions and:
   - heading (h1-h6) with >=3 chars and link_density <= 0.5, or
   - table row with >=1 char and link_density <= 0.5, or
   - plain block with text_len >= 25, link_density <= 0.4 and
     tag_density (tags per 100 text chars) <= 15.
7. join kept blocks with "\n\n".
"""

from __future__ import annotations

import html as _html
import re
from typing import List, Union

MIN_TEXT_CHARS = 25
MAX_LINK_DENSITY = 0.4
HEADING_LINK_DENSITY = 0.5
MAX_TAG_DENSITY_PER_100 = 15.0

_DROP_SUBTREES_RE = re.compile(
    r"<!--[\s\S]*?-->|<(script|style|noscript|template|svg)\b[\s\S]*?</\1\s*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)([^>]*)>")
_WS_RE = re.compile(r"\s+")

_BLOCK_TAGS = frozenset(
    "p div section article main li ul ol table tr h1 h2 h3 h4 h5 h6 "
    "blockquote pre br figure figcaption dd dt dl body".split()
)
_CHROME_TAGS = frozenset(("nav", "header", "footer", "aside"))
_HEADING_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))
_CELL_TAGS = frozenset(("td", "th"))


class _Block:
    __slots__ = ("parts", "cell_parts", "link_chars", "tag_count", "in_chrome", "kind")

    def __init__(self, in_chrome: bool, kind: str) -> None:
        self.parts: List[str] = []
        self.cell_parts: List[str] = []
        self.link_chars = 0
        self.tag_count = 0
        self.in_chrome = in_chrome
        self.kind = kind  # "text" | "heading" | "row"

    def text(self) -> str:
        if self.kind == "row":
            cells = [c for c in (s.strip() for s in self.cell_parts) if c]
            return "\t".join(cells)
        return _WS_RE.sub(" ", "".join(self.parts)).strip()


def _keep(block: _Block, text: str) -> bool:
    if block.in_chrome or not text:
        return False
    n = len(text)
    link_density = block.link_chars / n if n else 1.0
    if block.kind == "heading":
        return n >= 3 and link_density <= HEADING_LINK_DENSITY
    if block.kind == "row":
        return n >= 1 and link_density <= HEADING_LINK_DENSITY
    tag_density = 100.0 * block.tag_count / n if n else 1e9
    return (
        n >= MIN_TEXT_CHARS
        and link_density <= MAX_LINK_DENSITY
        and tag_density <= MAX_TAG_DENSITY_PER_100
    )


def strip_html_boilerplate(payload: Union[bytes, str]) -> str:
    markup = (
        payload.decode("utf-8", errors="replace") if isinstance(payload, bytes) else payload
    )
    markup = _DROP_SUBTREES_RE.sub(" ", markup)

    chrome_depth = 0
    anchor_depth = 0
    cell_depth = 0
    kept: List[str] = []
    block = _Block(False, "text")

    def flush(next_kind: str = "text") -> None:
        nonlocal block
        text = block.text()
        if _keep(block, text):
            kept.append(text)
        block = _Block(chrome_depth > 0, next_kind)

    pos = 0
    for match in _TAG_RE.finditer(markup):
        raw_text = markup[pos : match.start()]
        pos = match.end()
        if raw_text:
            text = _html.unescape(raw_text)
            if cell_depth > 0:
                if not block.cell_parts:
                    block.cell_parts.append("")
                block.cell_parts[-1] += text
            block.parts.append(text)
            if anchor_depth > 0:
                block.link_chars += len(_WS_RE.sub(" ", text).strip())

        closing, name = match.group(1) == "/", match.group(2).lower()
        block.tag_count += 1
        if name in _CHROME_TAGS:
            flush()
            chrome_depth = max(0, chrome_depth - 1) if closing else chrome_depth + 1
            block.in_chrome = chrome_depth > 0
        elif name == "a":
            anchor_depth = max(0, anchor_depth - 1) if closing else anchor_depth + 1
        elif name in _CELL_TAGS:
            if closing:
                cell_depth = max(0, cell_depth - 1)
            else:
                cell_depth += 1
                block.cell_parts.append("")
        elif name in _BLOCK_TAGS:
            if name == "tr":
                flush("row" if not closing else "text")
            elif name in _HEADING_TAGS:
                flush("heading" if not closing else "text")
            else:
                flush()

    trailing = markup[pos:]
    if trailing:
        block.parts.append(_html.unescape(trailing))
    flush()

    return "\n\n".join(kept)
