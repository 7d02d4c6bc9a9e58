#!/usr/bin/env python
"""Time a SUBSET of DuckDB oracle queries (best-of-N idle sweeps) and
merge them into an existing committed baseline JSON — used when new
queries are added mid-round so the whole 160+-query sweep doesn't
have to be re-run on a loaded machine.

Usage:
    python scripts/baseline_merge_new.py <sf_dir> <baseline.json> q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir, path, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    from sift_spark.oracle import ORACLE

    with open(path) as fh:
        base = json.load(fh)

    best: dict[str, float] = {}
    for sweep in range(3):
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        for name in names:
            t0 = time.time()
            con.sql(ORACLE[name]).fetchall()
            dt = round(time.time() - t0, 3)
            best[name] = min(best.get(name, 1e9), dt)
            print(f"# sweep {sweep} {name}: {dt}s", file=sys.stderr)
        con.close()

    base["queries"].update(best)
    base["total_sec"] = round(sum(base["queries"].values()), 3)
    with open(path, "w") as fh:
        json.dump(base, fh)
    print(json.dumps(best))


if __name__ == "__main__":
    main()
