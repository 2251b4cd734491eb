"""Bounded in-UDF retry for externally-effectful stages.

Spark's task retry re-runs a WHOLE task (hundreds of rows) when one
external call hiccups; per-call bounded retry inside the UDF is the
right granularity for transient failures. Semantics mirror the
reference's API retry loop (/root/reference/backend/services/
ocr_service.py:126-138): ``attempts`` tries, exponential ``2**attempt``
backoff, re-raise after the last attempt.

Use for stages that call OUT of the cluster (model endpoints, object
stores); deterministic compute stages don't need it — their failures
are bugs, and retrying a bug just burns the bound.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple, Type, TypeVar

import pandas as pd

T = TypeVar("T")

DEFAULT_ATTEMPTS = 5


def with_retries(
    fn: Callable[[], T],
    attempts: int = DEFAULT_ATTEMPTS,
    retryable: Tuple[Type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Call ``fn`` up to ``attempts`` times with 2**attempt backoff
    (1s, 2s, 4s, ... — ocr_service.py:126-138); re-raises the last
    error. ``sleep`` is injectable for tests."""
    if attempts < 1:
        raise ValueError("attempts must be >= 1")
    for attempt in range(attempts):
        try:
            return fn()
        except retryable:
            if attempt == attempts - 1:
                raise
            sleep(float(2**attempt))
    raise AssertionError("unreachable")


def retrying_series_map(
    series: pd.Series,
    fn: Callable,
    attempts: int = DEFAULT_ATTEMPTS,
    retryable: Tuple[Type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    error_value=None,
    max_in_flight: int = 1,
) -> pd.Series:
    """Per-element map for pandas UDFs over an external call: each
    element gets its own bounded retry; an element that exhausts its
    attempts yields ``error_value`` (error-as-row, never a task
    failure — ocr_service.py:254-262) instead of poisoning the batch.

    ``max_in_flight > 1`` overlaps the batch's calls on a thread pool
    of that size — the engine analog of the reference's per-document
    ``asyncio.Semaphore(5)`` page fan-out (ocr_service.py:297): an
    external endpoint is latency-bound, so sequential per-row calls
    would idle the executor slot, while an unbounded fan-out would
    stampede the endpoint. The bound is per Python worker; cluster-wide
    pressure = workers × max_in_flight, sized via executor cores."""

    def one(value):
        if value is None:  # null request -> null response, no call:
            return None    # lets a WHEN-gated column skip the endpoint
        try:
            return with_retries(
                lambda: fn(value), attempts=attempts, retryable=retryable, sleep=sleep
            )
        except retryable:
            return error_value

    if max_in_flight > 1 and len(series) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_in_flight) as pool:
            return pd.Series(
                list(pool.map(one, series)), index=series.index, dtype=object
            )
    return series.map(one)
