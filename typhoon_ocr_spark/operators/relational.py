"""Relational-skeleton operators: the reference's aggregation / explode
/ sort / window patterns re-expressed over the driver's synthetic
tables (SURVEY.md §2.7 category checklist).

Each maps to a concrete reference behavior (cited per function) and
has a DuckDB oracle twin in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def token_rollup(events: DataFrame) -> DataFrame:
    """Per-user rollup mirroring the reference's per-document reduce:
    sum(tokens) + all(success) + count
    (/root/reference/backend/services/ocr_service.py:315-321).
    Output: (user_id, total_value, n_events, all_positive)."""
    return events.groupBy("user_id").agg(
        F.round(F.sum("value"), 2).alias("total_value"),
        F.count("*").cast("long").alias("n_events"),
        F.expr("bool_and(value > 0)").alias("all_positive"),
    )


def page_explode(documents: DataFrame) -> DataFrame:
    """Page fan-out: posexplode(sequence(1, page_count)) — the Spark
    analog of the reference's per-page task fan-out
    (ocr_service.py:297-313); synthetic page_count = doc_id % 5 + 1.
    Output: (doc_id, page)."""
    pc = (F.col("doc_id") % 5 + 1).cast("int")
    return documents.select(
        "doc_id", F.explode(F.sequence(F.lit(1), pc)).alias("page")
    ).select("doc_id", F.col("page").cast("long").alias("page"))


def page_range_filter(documents: DataFrame) -> DataFrame:
    """Page-range selection '1-3,5' ∩ valid pages, sorted+deduped —
    the reference's range parser + validity filter
    (/root/reference/backend/routes/ocr.py:85-103,
    ocr_service.py:287-288). Output: (doc_id, page)."""
    pc = (F.col("doc_id") % 7 + 1).cast("long")
    requested = F.array(*[F.lit(x).cast("long") for x in (1, 2, 3, 5)])
    pages = F.array_sort(
        F.array_intersect(requested, F.sequence(F.lit(1).cast("long"), pc))
    )
    return documents.select("doc_id", F.explode(pages).alias("page"))


def ordered_assembly(documents: DataFrame) -> DataFrame:
    """Ordered string assembly per group — the document-assembly
    reducer pattern ("\\n\\n".join in page order, /root/reference/
    app.py:581) applied to (lang, source) groups of doc ids.
    Output: (lang, source, doc_ids, n_docs)."""
    return documents.groupBy("lang", "source").agg(
        F.concat_ws(
            ",", F.array_sort(F.collect_list(F.col("doc_id").cast("string")))
        ).alias("doc_ids"),
        F.count("*").cast("long").alias("n_docs"),
    )


def top_price_per_flag(lineitem: DataFrame) -> DataFrame:
    """Coordinate-extreme selection as a window top-1 (the reference's
    min/max-by edge-element picks, ocr_utils.py:196-210): per
    returnflag, the order with the highest extendedprice, ties by
    orderkey. Output: (l_returnflag, l_orderkey, top_price_cents)."""
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        lineitem.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            "l_orderkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("top_price_cents"),
        )
    )


def pricing_rollup(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (the canonical partial-agg
    benchmark shape; maps to the reference's token/success rollup
    category). Output keyed by (l_returnflag, l_linestatus)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def orders_by_segment(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Broadcast equi-join + rollup: order volume per market segment.
    The dimension side (customer) is broadcast — no shuffle of the
    fact side at scale. Output: (c_mktsegment, n_orders, total_cents)."""
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice") * 100).cast("long").alias("total_cents"),
        )
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Event-time tumbling-window aggregation (batch twin of the
    streaming path; the reference's SSE progress stream has no
    event-time windows, so this is the engine's streaming-semantics
    surface). Output: (hour_epoch, event_type, n_events, sum_value)."""
    return (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def revenue_by_nation(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Multi-way star join + rollup (TPC-H Q5 shape): revenue per
    supplier nation. Both dimension sides broadcast — the fact table
    never shuffles for the joins, only for the final aggregation.
    Output: (n_name, n_items, revenue_cents)."""
    return (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
            ).cast("long").alias("revenue_cents"),
        )
    )


def top_open_orders(orders: DataFrame, customer: DataFrame, k: int = 10) -> DataFrame:
    """Q3-shaped join + filter + deterministic top-k: largest open
    orders in the BUILDING segment, ties by orderkey.

    orderBy(...).limit(k) plans TakeOrderedAndProject: each task keeps a
    local top-k heap and only k rows per partition reach the driver-side
    merge — unlike a row_number() over an unpartitioned window, which
    would funnel every surviving row through one task's sort at scale.
    Output: (o_orderkey, c_custkey, total_cents)."""
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("o_orderstatus") != "F"))
        .select(
            "o_orderkey",
            "c_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
        )
        .orderBy(F.desc("total_cents"), F.asc("o_orderkey"))
        .limit(k)
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user (the batch twin of a custom
    stateful streaming operator — applyInPandasWithState would carry
    the same per-user state): a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. All native window functions.
    Output: (user_id, session_seq, session_start_epoch, n_events)."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(by_user))
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_session = events.withColumn(
        "session_seq", F.sum(is_new).over(by_user).cast("long")
    )
    return with_session.groupBy("user_id", "session_seq").agg(
        F.min(F.unix_timestamp("ts")).cast("long").alias("session_start_epoch"),
        F.count("*").cast("long").alias("n_events"),
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
