#!/usr/bin/env python
"""One side of a same-session A/B: run the named registered queries
at a given sf dir under whatever repo root PYTHONPATH points at, and
print per-query warm-min seconds as one JSON line.

Usage (the caller interleaves sides and reps):
    PYTHONPATH=/tmp/r9head python scripts/ab_pair.py sf_dir q1 q2 ...

Each query runs twice in-process; the reported value is the min (the
bench.py protocol v2 warm-min, so A/B numbers are comparable to
BENCH_* records)."""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from sift_spark.queries import QUERIES
    from sift_spark.session import get_spark

    spark = get_spark("ab_pair")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        best = None
        for _ in range(2):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
