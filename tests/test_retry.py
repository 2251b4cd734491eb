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


class _MockEndpoint:
    """Threaded HTTP server with injected latency, per-key 429s, a
    permanent-503 key, and concurrency accounting — the reference's
    endpoint behavior (retry loop ocr_service.py:126-138, Semaphore(5)
    fan-out ocr_service.py:297) observed through a REAL socket."""

    def __init__(self, flaky_failures: int = 2, latency_s: float = 0.05):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.attempts: dict = {}
        self.in_flight = 0
        self.max_in_flight = 0
        self._lock = threading.Lock()
        state = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                import time as _t
                from urllib.parse import parse_qs, urlparse

                key = parse_qs(urlparse(self.path).query)["key"][0]
                with state._lock:
                    state.attempts[key] = state.attempts.get(key, 0) + 1
                    n = state.attempts[key]
                    state.in_flight += 1
                    state.max_in_flight = max(state.max_in_flight, state.in_flight)
                try:
                    _t.sleep(latency_s)
                    if key.startswith("poison"):
                        code, body = 503, b"overloaded"
                    elif key.startswith("flaky") and n <= flaky_failures:
                        code, body = 429, b"slow down"
                    else:
                        code, body = 200, f"ok:{key}".encode()
                    self.send_response(code)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                finally:
                    with state._lock:
                        state.in_flight -= 1

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self._thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def test_external_call_udf_against_real_http_endpoint(spark):
    """The full external-call harness through a real socket: retries
    recover from 429s, a permanent 503 becomes an error row (task never
    fails), and per-worker in-flight concurrency is BOUNDED by the
    thread pool (Semaphore(5) analog) while still overlapping calls."""
    from pyspark.sql import functions as F

    from typhoon_ocr_spark.functions.udfs import make_external_call_udf

    # latency high enough that even a heavily loaded host can't finish
    # one call before the pool submits the next — the overlap assertion
    # below flaked at 50 ms during full-suite runs on throttled windows
    ep = _MockEndpoint(flaky_failures=2, latency_s=0.15)
    try:
        port = ep.port

        def endpoint(key):
            from urllib.request import urlopen  # raises on 4xx/5xx

            with urlopen(f"http://127.0.0.1:{port}/call?key={key}", timeout=10) as r:
                return r.read().decode()

        call = make_external_call_udf(
            endpoint, attempts=5, error_value="<failed>",
            sleep=lambda s: None, max_in_flight=5,
        )
        keys = [f"k{i:02d}" for i in range(16)] + ["flaky-a", "flaky-b", "poison-x"]
        df = (
            spark.createDataFrame([(k,) for k in keys], "key string")
            .repartition(1)  # one worker => the observed bound is the pool's
            .withColumn("resp", call(F.col("key")))
        )
        got = {r["key"]: r["resp"] for r in df.collect()}

        assert got["poison-x"] == "<failed>"
        assert got["flaky-a"] == "ok:flaky-a" and got["flaky-b"] == "ok:flaky-b"
        assert all(got[k] == f"ok:{k}" for k in keys[:16])
        # retry counts observed by the SERVER: 2 rejected + 1 ok for the
        # flaky keys, the full bounded 5 for the poison key, 1 for the rest
        assert ep.attempts["flaky-a"] == 3 and ep.attempts["flaky-b"] == 3
        assert ep.attempts["poison-x"] == 5
        assert all(ep.attempts[k] == 1 for k in keys[:16])
        # concurrency: genuinely overlapped, never above the bound
        assert 2 <= ep.max_in_flight <= 5
    finally:
        ep.close()


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
