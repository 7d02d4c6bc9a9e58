#!/usr/bin/env python
"""Measure the PRODUCTION path for incremental near-dup at scale
(round-7 verdict #1): the standing corpus's LSH index written once as
bucketed tables (write_lsh_index), then a new batch probed against it
— vs the same batch re-deriving the index from in-memory frames, vs
DuckDB re-running the whole old∪new CTE (its only option: DuckDB has
no standing index, so this is the honest production comparison — a
growing corpus amortizes the index build, a from-scratch engine pays
the full corpus every batch).

Prints one JSON line:
  {"sf": ..., "index_build_sec": ..., "probe_bucketed_sec": ...,
   "probe_inmemory_sec": ..., "duck_full_sec": ..., "n_pairs": ...}

Usage:
    python scripts/bench_bucketed_index.py [sf_dir] [--runs 2]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BANDS_T, SH_T = "bench_lsh_bands", "bench_lsh_shingles"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.path.join(REPO, ".data/sf1")
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    os.environ.setdefault("SIFT_SPARK_DRIVER_MEM", "16g")
    from pyspark.sql import functions as F

    from sift_spark.operators.dedup import (
        lsh_index,
        minhash_lsh_pairs_incremental,
        read_lsh_index,
        write_lsh_index,
    )
    from sift_spark.session import get_spark

    spark = get_spark("bench_bucketed_index")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)

    # one-time standing-index build (amortized across every later batch)
    t0 = time.time()
    write_lsh_index(old, BANDS_T, SH_T)
    build_sec = round(time.time() - t0, 3)

    def probe_bucketed() -> tuple[float, int]:
        bands, sh = read_lsh_index(spark, BANDS_T, SH_T)
        t0 = time.time()
        n = minhash_lsh_pairs_incremental(new, bands, sh, threshold=0.8).count()
        return round(time.time() - t0, 3), n

    def probe_inmemory() -> tuple[float, int]:
        bands, sh = lsh_index(old)
        t0 = time.time()
        n = minhash_lsh_pairs_incremental(new, bands, sh, threshold=0.8).count()
        return round(time.time() - t0, 3), n

    bucketed, n_pairs = zip(*[probe_bucketed() for _ in range(runs)])
    inmem, n_pairs2 = zip(*[probe_inmemory() for _ in range(runs)])
    assert set(n_pairs) == set(n_pairs2), (n_pairs, n_pairs2)

    # DuckDB's only option: the full old∪new pipeline per batch
    import duckdb

    from sift_spark.oracle import ORACLE

    duck = []
    for _ in range(runs):
        con = duckdb.connect()
        for t in ("documents",):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        t0 = time.time()
        len(con.sql(ORACLE["dedup_incremental"]).fetchall())
        duck.append(round(time.time() - t0, 3))
        con.close()

    spark.sql(f"DROP TABLE IF EXISTS {BANDS_T}")
    spark.sql(f"DROP TABLE IF EXISTS {SH_T}")
    print(json.dumps({
        "sf": sf,
        "index_build_sec": build_sec,
        "probe_bucketed_sec": min(bucketed),
        "probe_bucketed_cold_sec": bucketed[0],
        "probe_inmemory_sec": min(inmem),
        "duck_full_sec": min(duck),
        "duck_full_cold_sec": duck[0],
        "runs": runs,
        "n_pairs": n_pairs[0],
    }))


if __name__ == "__main__":
    main()
