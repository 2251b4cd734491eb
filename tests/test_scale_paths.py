"""Scale-path features: salted spread, bucketed co-located joins,
stateful streaming operator."""

import os

import pytest
from pyspark.sql import functions as F

from typhoon_ocr_spark.operators.extract import extract_documents
from typhoon_ocr_spark.plans.session import PipelineConfig
from typhoon_ocr_spark.sources.bucketing import colocated_join, write_bucketed

DOC_KEYS = ["url", "kind", "extracted_text", "page_count", "success"]


def test_salted_spread_is_byte_identical(spark, fixture_dir):
    """The optional pre-parse salted repartition (north rule's skew
    defusal for pathologically clustered inputs) must not change any
    output byte."""
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    expected = spark.read.parquet(os.path.join(fixture_dir, "expected_docs.parquet"))
    salted = extract_documents(pages, PipelineConfig(salt_buckets=4))
    assert salted.join(expected, DOC_KEYS, "left_anti").count() == 0
    assert expected.join(salted, DOC_KEYS, "left_anti").count() == 0


def test_bucketed_join_has_no_exchange(spark, fixture_dir):
    """Equally-bucketed tables join without shuffling either side."""
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    extracted = extract_documents(pages)
    expected = spark.read.parquet(os.path.join(fixture_dir, "expected_docs.parquet"))

    write_bucketed(extracted, "t_extracted", "url", 8, sorted_by="url")
    write_bucketed(expected.select("url", F.col("extracted_text").alias("exp_text")),
                   "t_expected", "url", 8, sorted_by="url")
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # the fixture tables are tiny → AQE would broadcast; disable so the
    # plan demonstrates the bucketed (shuffle-free sort-merge) path the
    # big-table case takes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "t_extracted", "t_expected", on="url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join shuffled"
        # and the join is correct: every url matches its expected text
        n_bad = joined.filter(F.col("extracted_text") != F.col("exp_text")).count()
        assert n_bad == 0
        assert joined.count() == expected.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS t_extracted")
        spark.sql("DROP TABLE IF EXISTS t_expected")


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState carries keyed state across micro-batches:
    the second batch's cumulative totals include the first batch."""
    from typhoon_ocr_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "src")
    os.makedirs(src)
    batch1 = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double"
    )
    batch2 = spark.createDataFrame(
        [(1, 2.0), (3, 7.0)], "user_id long, value double"
    )
    batch1.coalesce(1).write.parquet(src + "/b1")
    batch2.coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out_rows = []

    def collect_batch(df, batch_id):
        out_rows.extend((batch_id, tuple(r)) for r in df.collect())

    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(collect_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # cumulative totals per user, regardless of which batch each file
    # landed in (files may arrive in either order)
    final = {}
    for _, (user, n, total, batch_n) in out_rows:
        final[user] = (n, total)
        assert batch_n <= n  # cumulative >= batch contribution
    assert final[1] == (3, 17.0)
    assert final[2] == (1, 1.0)
    assert final[3] == (1, 7.0)
    # state actually crossed batches: user 1 appears with a cumulative
    # count larger than any single batch contribution
    user1_rows = [r for _, r in out_rows if r[0] == 1]
    assert any(r[1] > r[3] for r in user1_rows)


def test_streaming_first_seen_dedup(spark, tmp_path):
    """Continuous exact dedup: the first arrival per key is emitted
    once; duplicates inside a batch AND across later micro-batches are
    dropped (keyed GroupState survives the batch boundary)."""
    from typhoon_ocr_spark.streaming.stateful import streaming_first_seen

    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [("k1", "u1-first"), ("k1", "u1-dup-same-batch"), ("k2", "u2-first")],
        "key string, url string",
    )
    b2 = spark.createDataFrame(
        [("k1", "u1-dup-later-batch"), ("k3", "u3-first")],
        "key string, url string",
    )
    b1.coalesce(1).write.parquet(src + "/b1")
    b2.coalesce(1).write.parquet(src + "/b2")

    out_rows = []
    q = (
        streaming_first_seen(
            spark.readStream.schema("key string, url string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: out_rows.extend(tuple(r) for r in df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = dict(out_rows)
    assert len(out_rows) == 3  # exactly one emission per distinct key
    assert set(emitted) == {"k1", "k2", "k3"}
    # k1 emits whichever arrival came first (file order is not pinned),
    # but never the same-batch duplicate
    assert emitted["k1"] in ("u1-first", "u1-dup-later-batch")
    assert emitted["k1"] != "u1-dup-same-batch"
