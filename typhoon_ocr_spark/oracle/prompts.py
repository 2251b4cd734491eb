"""Prompt templates + LLM message construction.

Byte-identical re-expression of the reference's prompt surface
(/root/reference/packages/typhoon_ocr/typhoon_ocr/ocr_utils.py:401-465)
and the message wrapper (ocr_utils.py:611-619). The template strings
must match the reference character-for-character — they are part of the
tested correctness surface (reference tests assert RAW_TEXT_START/END
presence, figure-language content, and the invalid-name constant).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

INVALID_PROMPT_TEXT = "Invalid PROMPT_NAME provided."

_DEFAULT_TEMPLATE = (
    "Below is an image of a document page along with its dimensions. "
    "Simply return the markdown representation of this document, presenting tables in markdown format as they naturally appear.\n"
    "If the document contains images, use a placeholder like dummy.png for each image.\n"
    "Your final output must be in JSON format with a single key `natural_text` containing the response.\n"
    "RAW_TEXT_START\n{base_text}\nRAW_TEXT_END"
)

_STRUCTURE_TEMPLATE = (
    "Below is an image of a document page, along with its dimensions and possibly some raw textual content previously extracted from it. "
    "Note that the text extraction may be incomplete or partially missing. Carefully consider both the layout and any available text to reconstruct the document accurately.\n"
    "Your task is to return the markdown representation of this document, presenting tables in HTML format as they naturally appear.\n"
    "If the document contains images or figures, analyze them and include the tag <figure>IMAGE_ANALYSIS</figure> in the appropriate location.\n"
    "Your final output must be in JSON format with a single key `natural_text` containing the response.\n"
    "RAW_TEXT_START\n{base_text}\nRAW_TEXT_END"
)

_V15_TEMPLATE = """Extract all text from the image.


Instructions:
- Only return the clean Markdown.
- Do not include any explanation or extra text.
- You must include all information on the page.


Formatting Rules:
- Tables: Render tables using <table>...</table> in clean HTML format.
- Equations: Render equations using LaTeX syntax with inline ($...$) and block ($$...$$).
- Images/Charts/Diagrams: Wrap any clearly defined visual areas (e.g. charts, diagrams, pictures) in:


<figure>
Describe the image's main elements (people, objects, text), note any contextual clues (place, event, culture), mention visible text and its meaning, provide deeper analysis when relevant (especially for financial charts, graphs, or documents), comment on style or architecture if relevant, then give a concise overall summary. Describe in {figure_language}.
</figure>


- Page Numbers: Wrap page numbers in <page_number>...</page_number> (e.g., <page_number>14</page_number>).
- Checkboxes: Use ☐ for unchecked and ☑ for checked boxes.
    """

PROMPT_NAMES = ("default", "structure", "v1.5")


def render_prompt(
    prompt_name: str,
    base_text: str = "",
    figure_language: str = "Thai",
) -> str:
    """Render the prompt for ``prompt_name``; unknown names yield the
    reference's invalid-name constant (ocr_utils.py:465)."""
    if prompt_name == "default":
        return _DEFAULT_TEMPLATE.format(base_text=base_text)
    if prompt_name == "structure":
        return _STRUCTURE_TEMPLATE.format(base_text=base_text)
    if prompt_name == "v1.5":
        return _V15_TEMPLATE.format(figure_language=figure_language)
    return INVALID_PROMPT_TEXT


def get_prompt(prompt_name: str):
    """Callable-returning form matching the reference API shape
    (ocr_utils.py:440-465): default/structure take base_text, v1.5 takes
    figure_language keyword, unknown names accept anything."""
    if prompt_name in ("default", "structure"):
        return lambda base_text: render_prompt(prompt_name, base_text)
    if prompt_name == "v1.5":
        return lambda base_text=None, figure_language="Thai": render_prompt(
            "v1.5", figure_language=figure_language
        )
    return lambda *_a, **_k: INVALID_PROMPT_TEXT


def build_messages(prompt_text: str, image_base64: str) -> List[Dict[str, Any]]:
    """LLM message envelope (ocr_utils.py:611-619)."""
    return [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": prompt_text},
                {
                    "type": "image_url",
                    "image_url": {"url": f"data:image/png;base64,{image_base64}"},
                },
            ],
        }
    ]


def extract_image_base64(messages: List[Dict[str, Any]]) -> str:
    """Pluck the base64 payload back out of a message envelope
    (/root/reference/backend/services/ocr_service.py:147-154)."""
    try:
        url = messages[0]["content"][1]["image_url"]["url"]
        return url.split(",")[-1] if "," in url else ""
    except Exception:
        return ""


def repetition_penalty_for(task_type: str) -> float:
    """API parameter golden: 1.1 for v1.5, 1.2 otherwise
    (ocr_utils.py:705)."""
    return 1.1 if task_type == "v1.5" else 1.2


# API parameter goldens (ocr_utils.py:700-709; asserted by the
# reference's integration tests).
API_PARAMS = {"max_tokens": 16384, "temperature": 0.1, "top_p": 0.6}
