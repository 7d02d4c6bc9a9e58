#!/usr/bin/env python
"""Wikidata dump-scale ingestion proof (VERDICT r9 ask #8).

Runs the wikidata reader END TO END on a multi-GB JSON array dump —
the reference's actual workload shape (reference:
sift/corpora/wikidata.py:12 ``WikidataCorpus``, :32
``WikidataRelations``) — through read_items → entity_labels /
predicate_labels → relations, TWICE in fresh sessions, asserting
run-to-run hash stability, and records wall times.

The sandbox has no network (dumps.wikimedia.org does not resolve), so
the input is scripts/make_big_wikidata.py's deterministic generator —
the real `latest-all.json` array layout (trailing commas, `[`/`]`
wrapper lines) plus the pathology catalog (novalue/somevalue snaks,
ignored datatypes, truncated lines, lexemes, missing labels) at real
scale, NOT a 6-line fixture. Rerunnable:

    python scripts/wikidata_dump_scale_run.py [--items 1200000]

Writes WIKIDATA_DUMP_RUN.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_once(dump_path: str, run_id: int) -> dict:
    from pyspark.sql import functions as F

    from sift_spark.corpora.wikidata import (
        entity_labels,
        predicate_labels,
        read_items,
        relations,
    )
    from sift_spark.session import get_spark
    from tests.parity import _pandas_rows, value_hash

    spark = get_spark(f"wikidata_dump_run_{run_id}")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    t0 = time.time()
    items = read_items(spark, dump_path)
    out["n_items"] = items.count()
    out["t_parse_items"] = round(time.time() - t0, 2)

    t0 = time.time()
    el = entity_labels(items)
    out["n_entity_labels"] = el.count()
    top_el = el.orderBy(F.col("qid").asc()).limit(100).toPandas()
    out["entity_labels_hash"] = value_hash(_pandas_rows(top_el), list(top_el.columns))
    out["t_entity_labels"] = round(time.time() - t0, 2)

    t0 = time.time()
    pl = predicate_labels(items).toPandas().sort_values("pid").reset_index(drop=True)
    out["n_predicates"] = len(pl)
    out["predicate_labels_hash"] = value_hash(_pandas_rows(pl), list(pl.columns))
    out["t_predicate_labels"] = round(time.time() - t0, 2)

    t0 = time.time()
    rel = relations(items)
    # full-table count + an order-stable top slice hash: hashing 30M
    # rows via pandas would dominate the wall; the count pins totals,
    # the per-predicate rollup pins the distribution
    out["n_relations"] = rel.count()
    dist = (
        rel.groupBy("predicate")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("predicate")
        .toPandas()
    )
    out["relations_by_predicate"] = {
        str(r["predicate"]): int(r["n"]) for _, r in dist.iterrows()
    }
    out["relations_dist_hash"] = value_hash(_pandas_rows(dist), list(dist.columns))
    top_rel = rel.orderBy("entity", "predicate", "value").limit(200).toPandas()
    out["relations_top_hash"] = value_hash(_pandas_rows(top_rel), list(top_rel.columns))
    out["t_relations"] = round(time.time() - t0, 2)

    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_200_000)
    ap.add_argument("--dump", default=os.path.join(REPO, ".data", "bigwikidata.json"))
    a = ap.parse_args()

    if not os.path.exists(a.dump):
        from scripts.make_big_wikidata import write_dump

        t0 = time.time()
        write_dump(a.dump, a.items, seed=7)
        print(f"# generated {os.path.getsize(a.dump)/1e9:.2f} GB in "
              f"{time.time()-t0:.1f}s", flush=True)

    size_gb = round(os.path.getsize(a.dump) / 1e9, 3)
    runs = []
    for i in (1, 2):
        t0 = time.time()
        r = run_once(a.dump, i)
        r["wall_total"] = round(time.time() - t0, 2)
        runs.append(r)
        print(f"# run {i}: {json.dumps(r)}", flush=True)

    stable = all(
        runs[0][k] == runs[1][k]
        for k in (
            "n_items", "n_entity_labels", "n_predicates", "n_relations",
            "entity_labels_hash", "predicate_labels_hash",
            "relations_dist_hash", "relations_top_hash",
        )
    )
    result = {
        "dump_gb": size_gb,
        "hash_stable_across_runs": stable,
        "runs": runs,
    }
    with open(os.path.join(REPO, "WIKIDATA_DUMP_RUN.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"dump_gb": size_gb, "stable": stable}))


if __name__ == "__main__":
    main()
