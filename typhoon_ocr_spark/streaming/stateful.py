"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only stateful machinery is its bounded-concurrency
progress loop (/root/reference/backend/routes/ocr.py:277-305); the
engine's streaming surface generalizes that to keyed state that
survives across micro-batches: per-user running totals (the building
block for sessionization / rate metrics over an event stream).

State is a single (n_events, total_value) pair per user; each batch
emits the updated cumulative row for users present in the batch.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("batch_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user(
    key: Tuple, frames: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n_prev, total_prev = state.get if state.exists else (0, 0.0)
    batch_n = 0
    batch_total = 0.0
    for pdf in frames:
        batch_n += len(pdf)
        batch_total += float(pdf["value"].sum())
    n_new = n_prev + batch_n
    total_new = total_prev + batch_total
    state.update((n_new, total_new))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_new],
            "total_value": [total_new],
            "batch_events": [batch_n],
        }
    )


def running_user_totals(event_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame (user_id, value, ...) → per-batch cumulative
    totals per user, state carried across micro-batches."""
    return (
        event_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming first-seen dedup: exact dedup as a continuous operator.
# ---------------------------------------------------------------------------

FIRST_SEEN_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("url", StringType()),
    ]
)

FIRST_SEEN_STATE = StructType([StructField("seen", LongType())])


def _first_seen(
    key: Tuple, frames: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        return  # key already emitted in an earlier batch: drop everything
    first_url = None
    for pdf in frames:
        if len(pdf) and first_url is None:
            first_url = str(pdf["url"].iloc[0])
    state.update((1,))
    if first_url is not None:
        yield pd.DataFrame({"key": [key[0]], "url": [first_url]})


def streaming_first_seen(stream: DataFrame, key_col: str = "key") -> DataFrame:
    """Continuous exact dedup over an unbounded stream: the FIRST row
    per key ever seen is emitted, every later arrival (same batch or
    any later micro-batch) is dropped — the streaming twin of
    ``dedup.exact_dup_groups`` for ingest pipelines where the corpus
    never stops arriving. Keyed GroupState holds one long per key;
    at 10^12 keys partition the stream by key-hash ranges and shard
    checkpoints per range (state is per-key, never global). Input must
    carry (key, url); output (key, url)."""
    return (
        stream.select(F.col(key_col).alias("key"), "url")
        .groupBy("key")
        .applyInPandasWithState(
            _first_seen,
            outputStructType=FIRST_SEEN_OUTPUT,
            stateStructType=FIRST_SEEN_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
