"""Spark-vs-DuckDB parity for the corpus/relational operators at the
smoke tier (the driver's own gate runs tools/check_correctness.py
semantics at sf0.01; this keeps the same checks in pytest)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_correctness import TABLES, frame_key  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# extraction queries pin the sf0.01 fixture in their oracle SQL → they
# are exercised by the driver + tools/check_correctness.py, not here
CORPUS_QUERIES = [
    "dedup_exact",
    "minhash_bands",
    "minhash_pairs",
    "simhash",
    "jaccard_pairs",
    "lang_id",
    "quality_scores",
    "token_counts",
    "fingerprints",
    "repetition_stats",
    "gopher_quality",
    "top_bigram",
    "corpus_keep",
    "pii_scrub",
    # url_dedup pins the sf0.01 fixture pages path in its oracle SQL
    # (like url_normalize/host_rollup) -> covered by the driver gate +
    # tools/check_correctness.py, not here
    "model_quality",
    "ngram_dup",
    "decontaminate",
    "source_mix",
    "paragraph_dedup",
    "vocab_topk",
    "sequence_pack",
    "ann_topk",
    "token_rollup",
    "page_explode",
    "page_range_filter",
    "ordered_assembly",
    "top_price_per_flag",
    "pricing_rollup",
    "orders_by_segment",
    "events_hourly",
    "sessionize",
    "media_resize",
    # media_features pins the sf0.01 fixture golden in its oracle SQL
    # (like image_* / media_meta) -> covered by the driver gate +
    # tools/check_correctness.py, not here
    # image_resize / image_pixel_stats pin the sf0.01 fixture golden in
    # their oracle SQL -> covered by the driver gate + check_correctness
    "simhash_near_dups",
    "embedding_near_dups",
    "ann_lsh_buckets",
    "ann_ivf_assign",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "pq_codes",
    "ann_pq_topk",
    "dataset_split",
    "stratified_sample",
    "revenue_by_nation",
    "top_open_orders",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", CORPUS_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    sdf = entry.queries()[name](spark, SF_DIR)
    s_cols, s_vals = frame_key(sdf.columns, [tuple(r) for r in sdf.collect()])
    rel = duck.sql(entry.oracle_sql()[name])
    d_cols, d_vals = frame_key(list(rel.columns), rel.fetchall())
    assert s_cols == d_cols
    assert len(s_vals) == len(d_vals)
    assert s_vals == d_vals
