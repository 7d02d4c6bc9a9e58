#!/usr/bin/env python
"""Dump-scale ingestion proof (VERDICT r8 ask #4).

Runs the wikipedia reader END TO END on a multi-hundred-MB
pages-articles dump — the reference's actual workload shape
(reference: sift/corpora/wikipedia.py:9, wikicorpus.py:45) — through
the native-link pipeline: read_dump → dump_redirects + dump_articles →
article_links → entity_counts / entity_inlinks top-k, TWICE in fresh
sessions, asserting run-to-run hash stability, and records wall times.

The sandbox has no network (dumps.wikimedia.org does not resolve), so
the input is scripts/make_big_dump.py's deterministic generator —
export-0.11 layout + the real-markup pathology catalog at real scale,
NOT a 4-page fixture. Rerunnable:

    python scripts/real_dump_scale_run.py [--pages 120000]

Writes REAL_DUMP_RUN.json at the repo root.
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

    from sift_spark.corpora.wikipedia import (
        article_links,
        dump_articles,
        dump_redirects,
        read_dump,
    )
    from sift_spark.models.links import entity_counts, entity_inlinks
    from sift_spark.session import get_spark
    from tests.parity import _pandas_rows, value_hash

    spark = get_spark(f"real_dump_run_{run_id}")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    t0 = time.time()
    pages = read_dump(spark, dump_path)
    out["n_pages"] = pages.count()
    out["t_parse_pages"] = round(time.time() - t0, 2)

    t0 = time.time()
    rd = dump_redirects(pages).toPandas()
    out["n_redirects"] = len(rd)
    out["redirects_hash"] = value_hash(_pandas_rows(rd), list(rd.columns))
    out["t_redirects"] = round(time.time() - t0, 2)

    t0 = time.time()
    articles = dump_articles(pages)
    links = article_links(articles)
    # entity_counts over the native link table — the reference's
    # headline aggregate (sift/models/links.py:22)
    ecp = entity_counts(links).toPandas()
    out["n_entities"] = len(ecp)
    out["entity_counts_hash"] = value_hash(_pandas_rows(ecp), list(ecp.columns))
    out["t_entity_counts"] = round(time.time() - t0, 2)

    t0 = time.time()
    top = (
        entity_inlinks(links)
        .orderBy(F.col("n_inlinks").desc(), F.col("target").asc())
        .limit(50)
        .toPandas()
    )
    out["top_inlinks_hash"] = value_hash(_pandas_rows(top), list(top.columns))
    out["top_entity"] = str(top.iloc[0]["target"]) if len(top) else None
    out["t_top_inlinks"] = round(time.time() - t0, 2)

    out["n_links"] = links.count()
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=120_000)
    ap.add_argument("--dump", default=os.path.join(REPO, ".data", "bigwiki.xml"))
    a = ap.parse_args()

    if not os.path.exists(a.dump):
        from scripts.make_big_dump import write_dump

        t0 = time.time()
        write_dump(a.dump, a.pages, seed=42)
        print(f"# generated {os.path.getsize(a.dump)/1e6:.1f} MB in "
              f"{time.time()-t0:.1f}s", flush=True)

    size_mb = round(os.path.getsize(a.dump) / 1e6, 1)
    runs = []
    for i in (1, 2):
        t0 = time.time()
        r = run_once(a.dump, i)
        r["wall_total"] = round(time.time() - t0, 2)
        runs.append(r)
        print(f"# run {i}: {json.dumps(r)}", flush=True)

    stable = all(
        runs[0][k] == runs[1][k]
        for k in ("n_pages", "n_redirects", "n_entities", "n_links",
                  "redirects_hash", "entity_counts_hash", "top_inlinks_hash")
    )
    result = {
        "dump_mb": size_mb,
        "hash_stable_across_runs": stable,
        "runs": runs,
    }
    with open(os.path.join(REPO, "REAL_DUMP_RUN.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print("REAL_DUMP_RUN " + json.dumps(
        {"dump_mb": size_mb, "stable": stable,
         "wall_run1": runs[0]["wall_total"], "wall_run2": runs[1]["wall_total"]}))
    assert stable, "run-to-run hashes differ"


if __name__ == "__main__":
    main()
