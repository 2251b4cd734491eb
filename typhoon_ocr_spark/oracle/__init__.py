"""Pure-Python oracle: reference-faithful deterministic functions.

No third-party dependencies (stdlib only) so the same code runs on the
driver (fixture generation, pytest goldens) and inside executor-side
pandas UDF bodies, guaranteeing byte-identical output in both places.
"""

from .textops import cap_split_string, cleanup_element_text, fix_text_lite
from .elements import (
    BoundingBox,
    TextElement,
    ImageElement,
    PageReport,
    merge_image_elements,
    transform_point,
    mat_mult,
)
from .linearize import linearize_page, anchor_from_image_dims, truncation_rng
from .prompts import get_prompt, PROMPT_NAMES, build_messages
from .respparse import parse_response_text
from .pagerange import parse_page_ranges
from .mdflatten import markdown_to_plain_text

__all__ = [
    "cap_split_string",
    "cleanup_element_text",
    "fix_text_lite",
    "BoundingBox",
    "TextElement",
    "ImageElement",
    "PageReport",
    "merge_image_elements",
    "transform_point",
    "mat_mult",
    "linearize_page",
    "anchor_from_image_dims",
    "truncation_rng",
    "get_prompt",
    "PROMPT_NAMES",
    "build_messages",
    "parse_response_text",
    "parse_page_ranges",
    "markdown_to_plain_text",
]
