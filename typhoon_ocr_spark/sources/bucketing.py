"""Bucketed-table layout: co-located joins without a shuffle.

At 100 TB the url-keyed joins (extracted-vs-expected verification,
incremental re-crawl diffs) dominate shuffle volume unless the tables
are bucketed on the join key at write time — then the join reads
co-located buckets and the exchange disappears from the plan
(SURVEY.md §4.2 / the north rule's "partitioning ... handled
explicitly"). This module writes/reads bucketed tables through the
session catalog (swap the warehouse for an Iceberg catalog when the
runtime jars exist; the bucket spec carries over).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "url",
    n_buckets: int = 16,
    sorted_by: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sorted_by:
        writer = writer.sortBy(sorted_by)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str = "url", how: str = "inner"
) -> DataFrame:
    """Join two equally-bucketed tables on their bucket key. With
    matching bucket specs Spark plans a SortMergeJoin over the bucketed
    scans directly — no Exchange on either side (asserted by tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
