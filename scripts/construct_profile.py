#!/usr/bin/env python
"""Per-query Python-side construction time: time fn(spark, sf_dir)
WITHOUT running the final action. Builders with eager race-point
persists do launch their materializing jobs at construct; the second
rep therefore isolates the pure driver-side (Py4J) cost once those
caches are warm. Prints a JSON dict {name: [t_rep1, t_rep2]} sorted by
rep2 descending to stderr, full JSON to stdout / --out.

Usage: python scripts/construct_profile.py [--out F] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    argv = sys.argv[1:]
    out = None
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sift_spark.queries import QUERIES, corpus_artifacts
    from sift_spark.session import get_spark, shuffle_partitions_for

    spark = get_spark(
        "construct_profile", shuffle_partitions=shuffle_partitions_for(sf_dir)
    )
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    names = argv or list(QUERIES)
    res = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        ts = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir)
            ts.append(round(time.time() - t0, 3))
        res[name] = ts
    for name, ts in sorted(res.items(), key=lambda kv: -kv[1][1])[:25]:
        print(f"{name}\t{ts[0]:.3f}\t{ts[1]:.3f}", file=sys.stderr)
    print(f"TOTAL rep2: {sum(t[1] for t in res.values()):.2f}s", file=sys.stderr)
    corpus_artifacts(spark, sf_dir).release()
    line = json.dumps(res)
    print(line)
    if out:
        with open(out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
