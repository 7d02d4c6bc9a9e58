#!/usr/bin/env python
"""Fixed-cost amortization study: Spark vs DuckDB at a larger scale
factor (see BASELINE.md — the sf0.1 aggregate ratio is dominated by
Spark's ~0.65s/query planning overhead; this measures how the
per-query ratio moves when real work grows 10x).

Runs a curated query set (the heaviest oracle-paired queries from the
standing bench, plus a few light ones to show the fixed-cost floor)
through BOTH engines on the same parquet, same machine:

- DuckDB: each oracle SQL in its OWN subprocess with a wall timeout —
  a single blowup can't take down the study (the full-suite run at sf1
  was observed at >100 GB RSS on one query).
- Spark: one session; each query guarded by a job-group cancel timer.

Usage:
    python scripts/amortization.py [sf_dir] [--timeout 600] \
        [--out baseline_duckdb_sf1.json --bench-out BENCH_sf1.json]
    python scripts/amortization.py --duck-one NAME sf_dir   # internal
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# heaviest r2-bench queries with oracle twins + a light tail for the
# fixed-cost floor
QSET = [
    "dedup_minhash_lsh",
    "dedup_clusters_star",
    "dedup_ngram_jaccard",
    "basket_pairs",
    "dedup_clusters",
    "dedup_incremental",
    "ann_ivf_bucketed",
    "entity_pagerank",
    "containment_pairs",
    "dedup_embedding",
    "dedup_apply",
    "entity_components",
    "dedup_simhash",
    "ann_lsh_bucketed",
    "term_collocations",
    "doc_top_terms",
    "tfidf_search",
    "events_sessionize",
    "q1_pricing_summary",
    "q9_product_profit",
    "q13_custdist",
    "token_stats",
    "lang_id",
    "duplicate_spans",
    "dedup_jaccard_prefix",
    "ann_ivf_scaled",
    "ann_lsh_scaled",
    # r3 additions
    "fuzzy_contamination",
    "entity_hits",
    "events_changepoint",
    "entity_salience",
    "temperature_sample",
    "entity_random_walks",
    "entity_node2vec",
    # r4 additions (heavy never-measured ops)
    "retrieval_triples",
    "label_spread",
    "corpus_topics",
    "windowed_pmi",
    "hard_negatives",
    "heldout_backoff_logprob",
    "doc_embedding_dup_pairs",
    "doc_srp_embeddings",
    "ccnet_buckets",
    "cluster_balanced_sample",
    "quality_classifier",
    "snapshot_delta",
    "term_drift",
    "unigram_train",
    "corpus_datacard",
    "stratified_kfold",
    "decayed_counts",
    "event_transitions",
    # r5 additions: broaden to >=80 shared queries — TPC-H joins,
    # events tail, link models, text/quality, sampling, similarity
    "q3_shipping_priority",
    "q5_local_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "events_tumbling",
    "events_sliding",
    "events_funnel",
    "retention_cohorts",
    "user_streaks",
    "session_stats",
    "events_attribution",
    "events_forecast",
    "entity_comentions",
    "mapped_comentions",
    "entity_relatedness",
    "name_disambig_baseline",
    "anchor_ambiguity",
    "quality_score",
    "repetition_stats",
    "bigram_logprob",
    "bpe_pair_counts",
    "contamination_check",
    "doc_chunks",
    "bm25_search",
    "text_normalize",
    "filtered_corpus",
    "pack_sequences",
    "dsir_weights",
    "stratified_sample",
    "kmeans_clusters",
    "pq_codes",
    "embedding_int8",
    "knn_label_propagation",
    "semantic_dedup",
]


def duck_one(name: str, sf_dir: str, runs: int = 1,
             budget: float | None = None) -> None:
    import duckdb

    from sift_spark.oracle import ORACLE

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    start = time.time()
    secs = []
    n = 0
    for _ in range(runs):
        t0 = time.time()
        n = len(con.sql(ORACLE[name]).fetchall())
        secs.append(round(time.time() - t0, 3))
        # warm repeats only while there's budget — a slow query must
        # not burn runs× the wall timeout (the subprocess cap stays at
        # the single-run timeout; a DNF dies there as before)
        if budget is not None and time.time() - start > 0.45 * budget:
            break
    print(json.dumps({"sec": secs[0], "secs": secs, "rows": n}))


def full_qset() -> list[str]:
    """The UNIFORM-protocol query set (r7 verdict #2): every
    oracle-paired registry query, artifact accounting lines first
    (their build cost must land on their own line), the rest in a
    seed-fixed shuffled order so slow IO-throttling drift across the
    block decorrelates from query families."""
    import random

    from sift_spark.oracle import ORACLE
    from sift_spark.queries import QUERIES

    art = [q for q in ("corpus_tokens", "corpus_tf", "corpus_shingles") if q in QUERIES]
    rest = [q for q in QUERIES if q in ORACLE and q not in art]
    random.Random(7).shuffle(rest)
    return art + rest


def main() -> None:
    if "--duck-one" in sys.argv:
        i = sys.argv.index("--duck-one")
        runs = 1
        if "--runs" in sys.argv:
            runs = int(sys.argv[sys.argv.index("--runs") + 1])
        budget = None
        if "--budget" in sys.argv:
            budget = float(sys.argv[sys.argv.index("--budget") + 1])
        duck_one(sys.argv[i + 1], sys.argv[i + 2], runs, budget)
        return

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.path.join(REPO, ".data/sf1")
    timeout = 600.0
    if "--timeout" in sys.argv:
        timeout = float(sys.argv[sys.argv.index("--timeout") + 1])
    # --warm N: run each query 1+N times in BOTH engines (first =
    # cold, rest warm); per-query output then carries cold AND min —
    # ONE protocol for every entry (r7 verdict #2)
    warm = 0
    if "--warm" in sys.argv:
        warm = int(sys.argv[sys.argv.index("--warm") + 1])
    runs = 1 + warm
    qset = QSET
    if "--full" in sys.argv:
        qset = full_qset()
    if "--only" in sys.argv:
        qset = sys.argv[sys.argv.index("--only") + 1].split(",")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # --- DuckDB side: subprocess per query, wall timeout ---
    duck: dict[str, float | None] = {}
    duck_cold: dict[str, float | None] = {}
    for name in qset:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--duck-one", name, sf_dir,
                 "--runs", str(runs), "--budget", str(timeout)],
                capture_output=True, text=True, timeout=timeout,
            )
            if out.returncode == 0:
                rec = json.loads(out.stdout.strip().splitlines()[-1])
                secs = rec.get("secs", [rec["sec"]])
                duck_cold[name] = secs[0]
                duck[name] = min(secs)
            else:
                duck[name] = duck_cold[name] = None
                print(f"# duck {name}: rc={out.returncode}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            duck[name] = duck_cold[name] = None
            print(f"# duck {name}: TIMEOUT {timeout}s", file=sys.stderr)
        print(f"# duck {name}: {duck[name]}", file=sys.stderr)

    # --- Spark side: one session, job-group cancel on timeout ---
    # sf1's session-shared corpus artifacts need ~16g to stay resident
    # (see session.py note); the small-SF default stays 8g
    os.environ.setdefault("SIFT_SPARK_DRIVER_MEM", "16g")
    from sift_spark.queries import QUERIES
    from sift_spark.session import get_spark

    spark = get_spark("amortization")
    sc = spark.sparkContext
    # warmup parity with bench.py
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(10).count()

    spk: dict[str, float | None] = {}
    spk_cold: dict[str, float | None] = {}
    for name in qset:
        sc.setJobGroup(name, name, interruptOnCancel=True)
        timer = threading.Timer(timeout, lambda: sc.cancelJobGroup(name))
        timer.start()
        secs = []
        qstart = time.time()
        try:
            for _ in range(runs):
                t0 = time.time()
                QUERIES[name](spark, sf_dir).count()
                secs.append(round(time.time() - t0, 3))
                if time.time() - qstart > 0.45 * timeout:
                    break  # warm repeats only while there's budget
            spk_cold[name] = secs[0]
            spk[name] = min(secs)
        except Exception:
            spk[name] = spk_cold[name] = None
            print(f"# spark {name}: CANCELLED/FAILED", file=sys.stderr)
        finally:
            timer.cancel()
            sc.setJobGroup("", "")
        print(f"# spark {name}: {spk[name]}", file=sys.stderr)

    shared = [q for q in qset if duck.get(q) is not None and spk.get(q) is not None]
    result = {
        "sf": sf,
        "timeout_sec": timeout,
        "runs_per_query": runs,
        "queries": {
            q: {
                "spark_sec": spk.get(q),
                "duck_sec": duck.get(q),
                **(
                    {"spark_cold_sec": spk_cold.get(q), "duck_cold_sec": duck_cold.get(q)}
                    if runs > 1
                    else {}
                ),
                "ratio": (
                    round(spk[q] / duck[q], 3)
                    if duck.get(q) and spk.get(q) is not None
                    else None
                ),
            }
            for q in qset
        },
        "spark_total_sec": round(sum(spk[q] for q in shared), 3),
        "duck_total_sec": round(sum(duck[q] for q in shared), 3),
        "n_shared": len(shared),
    }
    if result["duck_total_sec"]:
        result["vs_baseline_ratio"] = round(
            result["spark_total_sec"] / result["duck_total_sec"], 3
        )
    print(json.dumps(result))

    if "--out" in sys.argv:
        # standard baseline format so bench.py --vs-baseline works at this sf
        path = sys.argv[sys.argv.index("--out") + 1]
        with open(path, "w") as fh:
            json.dump(
                {
                    "engine": "duckdb",
                    "sf": sf,
                    "total_sec": round(sum(v for v in duck.values() if v), 3),
                    "queries": {q: v for q, v in duck.items() if v is not None},
                },
                fh,
            )


if __name__ == "__main__":
    main()
