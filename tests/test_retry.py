"""Bounded in-UDF retry helper (reference semantics:
ocr_service.py:126-138 — 5 attempts, 2**attempt backoff)."""

import pandas as pd
import pytest

from typhoon_ocr_spark.functions.retry import retrying_series_map, with_retries


class Flaky:
    def __init__(self, fail_times: int, exc=RuntimeError):
        self.fail_times = fail_times
        self.calls = 0
        self.exc = exc

    def __call__(self, value="ok"):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise self.exc(f"transient #{self.calls}")
        return f"done:{value}"


def test_retries_then_succeeds_with_exponential_backoff():
    sleeps = []
    flaky = Flaky(fail_times=3)
    out = with_retries(lambda: flaky(), attempts=5, sleep=sleeps.append)
    assert out == "done:ok"
    assert flaky.calls == 4
    assert sleeps == [1.0, 2.0, 4.0]  # 2**attempt, ocr_service.py:136


def test_reraises_after_last_attempt():
    flaky = Flaky(fail_times=99)
    with pytest.raises(RuntimeError, match="transient #5"):
        with_retries(lambda: flaky(), attempts=5, sleep=lambda s: None)
    assert flaky.calls == 5


def test_non_retryable_error_propagates_immediately():
    flaky = Flaky(fail_times=99, exc=ValueError)
    with pytest.raises(ValueError):
        with_retries(
            lambda: flaky(), attempts=5, retryable=(KeyError,), sleep=lambda s: None
        )
    assert flaky.calls == 1


def test_series_map_isolates_poison_elements():
    """One permanently-failing element becomes error_value; healthy
    elements retry independently and succeed."""
    calls = {}

    def fn(v):
        calls[v] = calls.get(v, 0) + 1
        if v == "poison":
            raise RuntimeError("always fails")
        if calls[v] < 2:
            raise RuntimeError("transient")
        return f"ok:{v}"

    out = retrying_series_map(
        pd.Series(["a", "poison", "b"]), fn, attempts=3,
        sleep=lambda s: None, error_value="<error>",
    )
    assert list(out) == ["ok:a", "<error>", "ok:b"]
    assert calls["poison"] == 3  # bounded, not infinite
    assert calls["a"] == 2 and calls["b"] == 2


def test_external_call_udf_error_as_row(spark):
    """Through Spark: rows whose external call permanently fails carry
    the error value; the task itself never fails."""
    from pyspark.sql import functions as F

    from typhoon_ocr_spark.functions.udfs import make_external_call_udf

    def endpoint(v):
        if v and "bad" in v:
            raise RuntimeError("upstream 500")
        return f"resp:{v}"

    call = make_external_call_udf(
        endpoint, attempts=2, error_value="<failed>", sleep=lambda s: None
    )
    df = spark.createDataFrame(
        [("r1", "good-1"), ("r2", "bad-2"), ("r3", "good-3")], "id string, req string"
    ).withColumn("resp", call(F.col("req")))
    got = {r["id"]: r["resp"] for r in df.collect()}
    assert got == {"r1": "resp:good-1", "r2": "<failed>", "r3": "resp:good-3"}
