#!/usr/bin/env python
"""Stage-level accounting for the composed LLM pipeline (VERDICT r10
ask #1): run ``sift_spark.pipeline.llm_training_pipeline`` at a given
scale factor and record, per stage, wall seconds, surviving rows, and
shuffle read/write bytes (from Spark's public status REST API — the
stage-metrics delta between pipeline stages), plus the hash-stable
output-shard manifest.

Three measured variants, each in its OWN JVM (fresh subprocess) so
cache warmth can't leak between them:

  staged    — materialize every stage (persist+count) then export:
              per-stage wall + shuffle attribution.
  composed  — ONE action (the shard write) executes the entire fused
              graph: total wall + shuffle, manifest. The manifest
              must equal the staged manifest (asserted here AND in
              tests/test_pipeline.py).
  no_share  — composed but with share_artifacts=False: what the
              token/shingle artifact reuse actually buys.

Usage:
    python scripts/pipeline_run.py [sf_dir] [--out PIPELINE_sf5.json]
    python scripts/pipeline_run.py --one staged sf_dir   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGE_ORDER = ("filtered", "deduped", "decontaminated", "mixed", "packed")


def _rest_stages(spark):
    """All completed Spark stages via the public status API."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        return json.load(r)


def _metrics_snapshot(spark):
    out = {}
    for s in _rest_stages(spark):
        out[(s["stageId"], s["attemptId"])] = (
            s.get("shuffleReadBytes", 0),
            s.get("shuffleWriteBytes", 0),
            s.get("inputBytes", 0),
        )
    return out


def _delta(before: dict, after: dict) -> dict:
    new = {k: v for k, v in after.items() if k not in before}
    return {
        "shuffle_read_bytes": sum(v[0] for v in new.values()),
        "shuffle_write_bytes": sum(v[1] for v in new.values()),
        "input_bytes": sum(v[2] for v in new.values()),
        "n_spark_stages": len(new),
    }


def _session(sf_dir: str):
    # big-SF sessions need the 16g heap (session.py's documented knob);
    # the UI is re-enabled because the stage-metrics REST API lives on it
    os.environ.setdefault("SIFT_SPARK_DRIVER_MEM", "16g")
    from sift_spark.session import get_spark

    spark = get_spark("pipeline_run", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _budget(spark, sf_dir: str) -> int:
    # ~60% of the raw corpus: the mix stage demonstrably downsamples
    from sift_spark.io import table

    return int(table(spark, sf_dir, "documents").count() * 0.6)


def run_staged(sf_dir: str, out_dir: str) -> dict:
    from sift_spark.pipeline import (
        llm_training_pipeline,
        shard_manifest,
        write_pipeline_shards,
    )

    spark = _session(sf_dir)
    t0 = time.time()
    budget = _budget(spark, sf_dir)
    before = _metrics_snapshot(spark)
    tc = time.time()
    # construction materializes the shared token/shingle artifacts and
    # the eager MinHash band table — a real cost, attributed here
    stages = llm_training_pipeline(spark, sf_dir, temp_budget=budget)
    after = _metrics_snapshot(spark)
    acct = [{"stage": "artifact_build", "rows": None,
             "wall_s": round(time.time() - tc, 2), **_delta(before, after)}]
    rows_prev = None
    before = after
    for name in STAGE_ORDER:
        df = stages[name].persist()
        t1 = time.time()
        n = df.count()
        after = _metrics_snapshot(spark)
        acct.append({"stage": name, "rows": n, "wall_s": round(time.time() - t1, 2),
                     **_delta(before, after)})
        before = after
        rows_prev = n
    t1 = time.time()
    write_pipeline_shards(stages, out_dir)
    after = _metrics_snapshot(spark)
    acct.append({"stage": "shard_export", "rows": rows_prev,
                 "wall_s": round(time.time() - t1, 2), **_delta(before, after)})
    man = shard_manifest(spark, out_dir)
    return {"variant": "staged", "total_wall_s": round(time.time() - t0, 2),
            "stages": acct, "manifest": man}


def run_composed(sf_dir: str, out_dir: str, share: bool) -> dict:
    from sift_spark.pipeline import (
        llm_training_pipeline,
        shard_manifest,
        write_pipeline_shards,
    )

    spark = _session(sf_dir)
    budget = _budget(spark, sf_dir)
    before = _metrics_snapshot(spark)
    t0 = time.time()
    stages = llm_training_pipeline(spark, sf_dir, temp_budget=budget,
                                   share_artifacts=share)
    write_pipeline_shards(stages, out_dir)
    wall = time.time() - t0
    after = _metrics_snapshot(spark)
    man = shard_manifest(spark, out_dir)
    return {"variant": "composed" if share else "no_share",
            "total_wall_s": round(wall, 2), **_delta(before, after),
            "manifest": man}


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--one":
        variant, sf_dir = args[1], args[2]
        out_dir = args[3]
        if variant == "staged":
            res = run_staged(sf_dir, out_dir)
        else:
            res = run_composed(sf_dir, out_dir, share=(variant == "composed"))
        print("PIPELINE_RESULT " + json.dumps(res))
        return

    sf_dir = args[0] if args and not args[0].startswith("--") else \
        os.path.join(REPO, ".data", "sf5")
    out_json = "PIPELINE_sf5.json"
    if "--out" in args:
        out_json = args[args.index("--out") + 1]

    results = {}
    for variant in ("staged", "composed", "no_share"):
        out_dir = f"/tmp/pipeline_shards_{variant}"
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", variant,
             sf_dir, out_dir],
            capture_output=True, text=True, timeout=7200, cwd=REPO,
        )
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("PIPELINE_RESULT ")]
        assert lines, (
            f"{variant}: no result line (rc={proc.returncode})\n"
            f"stderr tail: {proc.stderr[-3000:]}"
        )
        results[variant] = json.loads(lines[-1][len("PIPELINE_RESULT "):])
        print(f"{variant}: {results[variant]['total_wall_s']}s "
              f"(subprocess {round(time.time() - t0, 1)}s)", flush=True)

    # the three variants must agree byte-for-byte on the output shards
    m0 = results["staged"]["manifest"]
    for v in ("composed", "no_share"):
        assert results[v]["manifest"] == m0, f"{v} manifest diverges from staged"

    record = {
        "sf_dir": sf_dir,
        "note": "manifests identical across all three variants (asserted); "
                "wall includes JVM-fresh artifact builds — no cross-variant "
                "cache warmth",
        **results,
    }
    with open(os.path.join(REPO, out_json), "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
