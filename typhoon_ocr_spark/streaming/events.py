"""Per-batch progress event rows — the reference's SSE event schema.

The reference streams Server-Sent Events per request: ``start`` with
totals, ``progress`` / ``page_complete`` per page (text preview
truncated to 200 chars), final ``complete``, and ``error``
(/root/reference/backend/routes/ocr.py:199-207, 275-324). The engine's
analog is one event ROW per occurrence per micro-batch, written to an
events table a consumer can tail — same vocabulary, same truncated
previews, queryable instead of push-streamed.

Mapping:
- ``start``          one row per batch, n_total = pages in the batch
- ``page_complete``  one row per successful page, preview = text[:200]
- ``error``          one row per failed page, the error message
- ``complete``       one row per batch, n_done = successful pages
(``progress`` collapses into ``page_complete``: a batch has no
meaningful intra-page await order.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREVIEW_CHARS = 200  # routes/ocr.py:301 truncates text previews to 200


def batch_events(page_frame: DataFrame, batch_id: int) -> DataFrame:
    """Event rows for one micro-batch's page-level frame. Schema:
    (event, url, page, preview, error, n_done, n_total, batch_id)."""
    nul_str = F.lit(None).cast("string")
    nul_long = F.lit(None).cast("long")

    per_page = page_frame.select(
        F.when(F.col("success"), F.lit("page_complete"))
        .otherwise(F.lit("error"))
        .alias("event"),
        F.col("url"),
        F.col("page").cast("long").alias("page"),
        F.when(
            F.col("success"), F.substring(F.coalesce(F.col("text"), F.lit("")), 1, PREVIEW_CHARS)
        ).alias("preview"),
        F.col("error"),
        nul_long.alias("n_done"),
        nul_long.alias("n_total"),
    )

    totals = page_frame.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("success").cast("long")).alias("n_done"),
    )
    start = totals.select(
        F.lit("start").alias("event"), nul_str.alias("url"), nul_long.alias("page"),
        nul_str.alias("preview"), nul_str.alias("error"),
        nul_long.alias("n_done"), F.col("n_total").cast("long").alias("n_total"),
    )
    complete = totals.select(
        F.lit("complete").alias("event"), nul_str.alias("url"), nul_long.alias("page"),
        nul_str.alias("preview"), nul_str.alias("error"),
        F.col("n_done").cast("long").alias("n_done"),
        F.col("n_total").cast("long").alias("n_total"),
    )
    return (
        start.unionByName(per_page).unionByName(complete)
        .withColumn("batch_id", F.lit(batch_id))
    )
