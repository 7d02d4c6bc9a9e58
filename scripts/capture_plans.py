#!/usr/bin/env python
"""Capture .explain('formatted') for every registered query.

Usage:
  python scripts/capture_plans.py OUTDIR [name ...]

Writes OUTDIR/<name>.txt per query and a summary TSV (plan-smell
counters: Exchange / SortMergeJoin / BroadcastHashJoin / *EvalPython /
CartesianProduct / BroadcastNestedLoopJoin node counts) to
OUTDIR/_summary.tsv.  Plans are captured at $SPARK_GRAFT_SF_DIR
(default sf0.1) — the same data the bench times, so AQE-independent
plan shape (join strategy from size estimates, pushed filters)
matches what the bench executes.
"""

from __future__ import annotations

import os
import re
import sys
import traceback


def explain_str(df, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(qe, mode)


SMELLS = [
    ("exchange", r"\bExchange\b"),
    ("smj", r"\bSortMergeJoin\b"),
    ("shj", r"\bShuffledHashJoin\b"),
    ("bhj", r"\bBroadcastHashJoin\b"),
    ("bnlj", r"\bBroadcastNestedLoopJoin\b"),
    ("cartesian", r"\bCartesianProduct\b"),
    ("pyeval", r"\b(BatchEvalPython|ArrowEvalPython)\b"),
    ("mapinpandas", r"\b(MapInPandas|MapInArrow|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas)\b"),
    ("window", r"\bWindow\b"),
    ("expand", r"\bExpand\b"),
    ("generate", r"\bGenerate\b"),
]


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r11/before"
    only = set(sys.argv[2:])
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sift_spark.queries import QUERIES, corpus_artifacts
    from sift_spark.session import get_spark, shuffle_partitions_for

    spark = get_spark(
        "capture_plans", shuffle_partitions=shuffle_partitions_for(sf_dir)
    )

    rows = []
    names = [n for n in QUERIES if not only or n in only]
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = explain_str(df)
        except Exception:
            txt = "ERROR\n" + traceback.format_exc()
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        counts = {k: len(re.findall(p, txt)) for k, p in SMELLS}
        rows.append((name, counts))
        print(name, counts, file=sys.stderr)

    with open(os.path.join(outdir, "_summary.tsv"), "w") as fh:
        keys = [k for k, _ in SMELLS]
        fh.write("query\t" + "\t".join(keys) + "\n")
        for name, counts in rows:
            fh.write(name + "\t" + "\t".join(str(counts[k]) for k in keys) + "\n")

    corpus_artifacts(spark, sf_dir).release()


if __name__ == "__main__":
    main()
