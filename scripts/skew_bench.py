#!/usr/bin/env python
"""Induced-skew join benchmark: plain vs salted under one hot key.

Builds a fact table where 90% of rows share a single key, joins it
against a dim that is too big to broadcast (broadcast disabled to
model the >10 MB production dim), and times the plain shuffle join vs
``salted_join`` with AQE's skew handling OFF — isolating what manual
salting buys when the runtime can't re-plan (e.g. under a required
sort, or pre-AQE engines). Prints one JSON line.

Usage: python scripts/skew_bench.py [n_rows] [n_salts]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_salts = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sift_spark.operators.scale import salted_join

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    fact = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("fact_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .persist()
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("label")
    ).persist()
    fact.count()
    dim.count()

    t0 = time.time()
    plain_n = fact.join(dim, "k").count()
    t_plain = round(time.time() - t0, 3)

    t0 = time.time()
    salted_n = salted_join(fact, dim, "k", n_salts=n_salts).count()
    t_salted = round(time.time() - t0, 3)

    assert plain_n == salted_n, (plain_n, salted_n)
    print(
        json.dumps(
            {
                "metric": "skew_join_wall",
                "n_rows": n_rows,
                "hot_share": 0.9,
                "n_salts": n_salts,
                "plain_sec": t_plain,
                "salted_sec": t_salted,
                "speedup": round(t_plain / t_salted, 2) if t_salted else None,
                "rows": plain_n,
            }
        )
    )


if __name__ == "__main__":
    main()
