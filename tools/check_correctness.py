"""Local stand-in for the driver's correctness harness: run every
queries()[name] through Spark and oracle_sql()[name] through DuckDB on
the same sf dir, compare row count + column names + order-insensitive
values (columns sorted by name, rows sorted).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from typhoon_ocr_spark.plans.session import build_session  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.6f}"
    if isinstance(value, bool):
        return str(value)
    return str(value)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    data = sorted(tuple(normalize(r[i]) for i in order) for r in rows)
    return names, data


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = build_session(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        sk = frame_key(s_cols, s_rows)
        dk = frame_key(d_cols, d_rows)
        status = []
        if sk[0] != dk[0]:
            status.append(f"columns {sk[0]} vs {dk[0]}")
        if len(s_rows) != len(d_rows):
            status.append(f"rowcount {len(s_rows)} vs {len(d_rows)}")
        if not status and sk[1] != dk[1]:
            diff_i = next(
                (i for i, (a, b) in enumerate(zip(sk[1], dk[1])) if a != b), None
            )
            sample = (
                f" first diff @{diff_i}:\n  spark={sk[1][diff_i]}\n  duck ={dk[1][diff_i]}"
                if diff_i is not None
                else " (length tail)"
            )
            status.append("values differ" + sample)
        if status:
            print(f"FAIL {name}: " + "; ".join(status))
            failures += 1
        else:
            print(f"OK   {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
