"""OpenAI-compatible chat endpoint client for the OCR call stage.

The reference drives its model through the OpenAI client against a
configurable base URL (/root/reference/packages/typhoon_ocr/
typhoon_ocr/ocr_utils.py:691-709: ``chat.completions.create`` with
max_tokens=16384 and repetition_penalty/temperature/top_p extra_body).
This module renders that contract as a plain per-prompt callable for
``make_external_call_udf`` — pure stdlib urllib, no client object, so
one instance is safe across the UDF's bounded thread pool and across
executor Python workers.

Wire-up: ``plans/job.py --endpoint-url http://host/v1 --model m`` builds
the callable here and threads ``ocr_pages`` into the extraction job as
its page_transform — the full reference composition (anchor → prompt →
endpoint with bounded retry → parse → assembly) against any
OpenAI-compatible server. The mock-contract test drives the whole CLI
through spark-submit (tests/test_ocr_pipeline.py).
"""

from __future__ import annotations

import json
import os

DEFAULT_MODEL = "typhoon-ocr"
MAX_TOKENS = 16384
# env fallback chain mirrors the reference's key coalesce
# (ocr_utils.py:691); keys come from the environment, never argv —
# command lines leak through process listings
_API_KEY_ENVS = ("TYPHOON_OCR_API_KEY", "TYPHOON_API_KEY", "OPENAI_API_KEY")


def resolve_model_name(cli_model: str | None) -> str:
    """CLI flag > TYPHOON_OCR_MODEL env > default — the reference's
    model-name coalesce (backend/services/ocr_service.py)."""
    return cli_model or os.getenv("TYPHOON_OCR_MODEL") or DEFAULT_MODEL


def resolve_api_key(explicit: str | None = None) -> str | None:
    for value in (explicit, *[os.getenv(k) for k in _API_KEY_ENVS]):
        if value:
            return value
    return None


def make_chat_endpoint_fn(
    endpoint_url: str,
    model: str | None = None,
    api_key: str | None = None,
    task_type: str = "default",
    max_tokens: int = MAX_TOKENS,
    timeout: float = 60.0,
):
    """Per-prompt callable speaking POST {endpoint_url}/chat/completions
    with the reference's exact sampling envelope (ocr_utils.py:700-709:
    repetition_penalty 1.2 — 1.1 for v1.5 — temperature 0.1, top_p
    0.6). Returns choices[0].message.content verbatim;
    ``parse_response_udf`` downstream applies the same
    natural_text-vs-raw split as the reference's task-type branch
    (ocr_utils.py:712-716). Any non-200 or malformed response raises,
    which feeds make_external_call_udf's bounded per-element retry.

    The prompt ships as a text content part; a deployment whose server
    needs the page raster adds an image_url part next to it — the
    base64 render is already built per page (oracle/render.py,
    ocr_message_fingerprints proves the envelope end-to-end)."""
    model = resolve_model_name(model)
    key = resolve_api_key(api_key)
    url = endpoint_url.rstrip("/") + "/chat/completions"
    repetition_penalty = 1.1 if task_type == "v1.5" else 1.2

    def call(prompt: str) -> str:
        from urllib.request import Request, urlopen

        body = json.dumps(
            {
                "model": model,
                "messages": [
                    {
                        "role": "user",
                        "content": [{"type": "text", "text": prompt}],
                    }
                ],
                "max_tokens": max_tokens,
                "repetition_penalty": repetition_penalty,
                "temperature": 0.1,
                "top_p": 0.6,
            }
        ).encode()
        headers = {"Content-Type": "application/json"}
        if key:
            headers["Authorization"] = f"Bearer {key}"
        req = Request(url, data=body, headers=headers, method="POST")
        with urlopen(req, timeout=timeout) as resp:
            payload = json.loads(resp.read().decode())
        return payload["choices"][0]["message"]["content"]

    return call
