#!/usr/bin/env python
"""Time every DuckDB oracle query at a scale factor → one JSON line.

This is the standing single-node baseline the Spark bench is graded
against (see BASELINE.md). DuckDB runs the SAME SQL on the SAME
parquet as `bench.py` runs the Spark plans, on the same machine, so
the per-query ratio spark_sec/duck_sec is an apples-to-apples
"vs. a fast single-node engine" number.

Usage:
    python scripts/baseline_duckdb.py [sf_dir] > duck_times.json
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    from sift_spark.oracle import ORACLE

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    times: dict[str, float] = {}
    for name, sql in ORACLE.items():
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
        except Exception as exc:  # noqa: BLE001 - record and move on
            print(f"ERR {name}: {exc}", file=sys.stderr)
            continue
        times[name] = round(time.time() - t0, 3)

    out = {
        "engine": "duckdb",
        "sf": sf,
        "total_sec": round(sum(times.values()), 3),
        "queries": times,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
