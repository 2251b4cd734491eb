"""Checkpoint-resume, lineage, metrics, and Structured Streaming tests
(north rule: "resumable from checkpoint with per-partition lineage +
metrics"; FIXTURES.md §4)."""

import os

import pytest
from pyspark.sql import functions as F

from typhoon_ocr_spark.streaming.runner import ResumableExtractJob, stream_extract

DOC_KEYS = ["url", "kind", "extracted_text", "page_count", "success"]


@pytest.fixture()
def pages_path(fixture_dir):
    return os.path.join(fixture_dir, "pages.parquet")


def test_resume_after_injected_crash(spark, fixture_dir, pages_path, tmp_path):
    out_root = str(tmp_path / "out")
    job = ResumableExtractJob(spark, pages_path, out_root, n_buckets=8)

    # crash after 3 bucket commits
    with pytest.raises(RuntimeError, match="injected failure"):
        job.run(fail_after=3)
    assert len(job.committed_buckets()) == 3
    partial = job.read_output()
    n_partial = partial.count()
    assert 0 < n_partial < 200

    # rerun: a fresh job instance (new run_id) resumes from the manifest
    job2 = ResumableExtractJob(spark, pages_path, out_root, n_buckets=8)
    summary = job2.run()
    assert summary["processed"] == 5  # only the uncommitted buckets
    assert len(job2.committed_buckets()) == 8

    final = job2.read_output()
    # every url exactly once — no loss, no double-writes
    assert final.count() == 200
    assert final.select("url").distinct().count() == 200
    # committed-by-first-run buckets kept the first run's lineage
    assert final.filter(F.col("run_id") == job.run_id).count() == n_partial

    # byte-identical vs expected even through the crash/resume path
    expected = spark.read.parquet(os.path.join(fixture_dir, "expected_docs.parquet"))
    assert final.select(*DOC_KEYS).join(expected, DOC_KEYS, "left_anti").count() == 0


def test_lineage_columns(spark, pages_path, tmp_path):
    job = ResumableExtractJob(spark, pages_path, str(tmp_path / "o"), n_buckets=4)
    job.run()
    out = job.read_output()
    assert {"run_id", "source_snapshot", "partition_id", "attempt"} <= set(out.columns)
    assert out.select("partition_id").distinct().count() == 4
    snap = out.select("source_snapshot").first()[0]
    assert pages_path in snap


def test_metrics_rows(spark, pages_path, tmp_path):
    job = ResumableExtractJob(spark, pages_path, str(tmp_path / "o"), n_buckets=4)
    job.run()
    metrics = job.metrics()
    assert len(metrics) == 4
    total_html = sum(m["n_html"] for m in metrics)
    total_junk = sum(m["n_junk"] for m in metrics)
    assert total_html > 0 and total_junk > 0
    assert all(m["wall_ms"] > 0 for m in metrics)
    assert all(m["run_id"] == job.run_id for m in metrics)


def test_rerun_is_noop_when_complete(spark, pages_path, tmp_path):
    out_root = str(tmp_path / "o")
    ResumableExtractJob(spark, pages_path, out_root, n_buckets=4).run()
    summary = ResumableExtractJob(spark, pages_path, out_root, n_buckets=4).run()
    assert summary["processed"] == 0


def test_stream_extract_checkpointed(spark, fixture_dir, tmp_path):
    """Structured Streaming drain (foreachBatch + AvailableNow) produces
    the same per-url output as the batch pipeline; a second invocation
    with the same checkpoint processes nothing new."""
    # streaming source needs a directory of files
    src = str(tmp_path / "src")
    spark.read.parquet(os.path.join(fixture_dir, "pages.parquet")).repartition(
        4
    ).write.parquet(src)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_extract(spark, src, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 200
    expected = spark.read.parquet(os.path.join(fixture_dir, "expected_docs.parquet"))
    assert got.select(*DOC_KEYS).join(expected, DOC_KEYS, "left_anti").count() == 0

    # resume with nothing new → no duplicate outputs
    stream_extract(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 200
