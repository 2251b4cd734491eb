"""Host-scaling control experiment (no Spark anywhere).

The north rule's N-vs-4N criterion is measured in-sandbox as local[8]
vs local[32]. To split "the engine doesn't scale" from "the host
doesn't scale", this probe runs the same fixed CPU workload (pure
CPython, zero IPC, zero shared state) on 8 vs 32 OS processes. The
ratio it reports is the HOST's parallel-speedup ceiling: no Spark job
on this box can scale better than independent processes do.

Usage: python tools/cpu_scaling_probe.py [units_per_proc]
Prints one JSON line with per-config wall times and the ceiling.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time

TOTAL_UNITS = 960  # divisible by 8 and 32


def _unit(_: int) -> int:
    # ~20 ms of pure hashing per unit (no allocation churn)
    h = b"seed"
    for _i in range(12000):
        h = hashlib.md5(h).digest()
    return h[0]


def run(procs: int, total_units: int) -> float:
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_unit, range(total_units), chunksize=max(1, total_units // (procs * 4)))
    return time.time() - t0


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else TOTAL_UNITS
    # interleave configs (host throttling swings between windows) and
    # take best-per-config, same estimator as bench.py
    samples = {8: [], 32: []}
    for _ in range(3):
        for procs in (8, 32):
            samples[procs].append(run(procs, total))
    best8 = min(samples[8])
    best32 = min(samples[32])
    print(
        json.dumps(
            {
                "total_units": total,
                "best_sec_8": round(best8, 2),
                "best_sec_32": round(best32, 2),
                "samples_8": [round(s, 2) for s in samples[8]],
                "samples_32": [round(s, 2) for s in samples[32]],
                "speedup_8_to_32": round(best8 / best32, 2),
                "host_efficiency_ceiling": round(best8 / best32 / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
