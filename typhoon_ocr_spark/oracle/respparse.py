"""Model-response parsing to final text.

Re-expresses /root/reference/backend/services/ocr_service.py:156-190:
strip → try whole-string JSON object with a ``natural_text`` key → else
scan ```json fenced blocks for one → else the raw string; finally drop
``<figure>``/``</figure>`` tags and strip.
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

_FENCED_JSON_RE = re.compile(r"```(?:json)?\s*(\{[\s\S]*?\})\s*```", re.IGNORECASE)


def _natural_text_of(candidate: str) -> Optional[str]:
    try:
        obj = json.loads(candidate)
    except (json.JSONDecodeError, TypeError):
        return None
    if isinstance(obj, dict):
        value = obj.get("natural_text")
        if value is not None:
            return str(value)
    return None


def parse_response_text(content: Any) -> str:
    if content is None:
        return ""
    raw = str(content).strip()
    if not raw:
        return ""

    text = _natural_text_of(raw)
    if text is None:
        for block in _FENCED_JSON_RE.findall(raw):
            text = _natural_text_of(block)
            if text is not None:
                break
    if text is None:
        text = raw

    return text.replace("<figure>", "").replace("</figure>", "").strip()
