"""Counter metrics via Spark's Observation API — the engine's analog of
the reference's SSE progress counters (/root/reference/backend/routes/
ocr.py:275: totals in the `start`/`complete` events).

Observation metrics ride the job itself (no second pass over the data):
the observe node computes the aggregates alongside the action, so a
100 TB run pays zero extra scans for its counters. Per-partition
metrics rows come from ResumableExtractJob (runner.py); these are the
job-level totals.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_page_frame(
    page_frame: DataFrame, name: str = "extract_metrics"
) -> Tuple[DataFrame, Observation]:
    """Attach job-level extraction counters to a page-level frame.
    After any action on the returned frame, ``observation.get`` yields
    {n_pages, n_pdf_pages, n_html, n_image, n_junk, n_errors}.

    ``name`` must be unique per query — callers that observe several
    frames in one job (e.g. the resumable runner, one per bucket) pass
    a distinct name each time."""
    observation = Observation(name)
    observed = page_frame.observe(
        observation,
        F.count(F.lit(1)).alias("n_pages"),
        F.sum((F.col("kind") == "pdf").cast("long")).alias("n_pdf_pages"),
        F.sum((F.col("kind") == "html").cast("long")).alias("n_html"),
        F.sum((F.col("kind") == "image").cast("long")).alias("n_image"),
        F.sum((F.col("kind") == "junk").cast("long")).alias("n_junk"),
        F.sum((~F.col("success")).cast("long")).alias("n_errors"),
    )
    return observed, observation
