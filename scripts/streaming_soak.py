#!/usr/bin/env python
"""Standing-service soak of the continuous corpus dedup (r8 ask #5).

Every other streaming test drains ``availableNow`` micro-batches; this
script runs :func:`sift_spark.streaming.corpus.stream_corpus_dedup` as
a STANDING service on a rate source for minutes, SIGKILLs the whole
driver process mid-stream, restarts it on the same checkpoint, and
then proves three things a 100 TB ingest deployment cares about:

1. **Exactly-once effect across a hard kill**: the rate source's
   checkpointed offsets replay the in-flight batch deterministically
   and the per-batch overwrite + ``_committed`` marker protocol makes
   the rewrite idempotent — so the standing index holds EVERY rate
   value from 0..max exactly ONCE (no gaps, no duplicates), even
   though the process died mid-batch.
2. **Bounded memory**: driver RSS, sampled every batch, does not trend
   with stream length (the foreachBatch plan is stateless — the only
   state is the on-disk index; nothing accumulates on the heap).
3. **Bounded state**: the streaming engine reports zero stateful
   operators (state rows live in parquet, ∝ corpus, not in the state
   store ∝ stream history), and per-batch durations stay flat apart
   from the slowly-growing index probe.

Usage:
    python scripts/streaming_soak.py [--seconds 150] [--rate 200]
        [--workdir .tmp/soak]          # orchestrator (default)
    python scripts/streaming_soak.py child <workdir> <seconds> <rate>

Writes STREAMING_SOAK.json at the repo root (orchestrator mode).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def child(workdir: str, seconds: float, rate: int) -> None:
    """Run the standing dedup service until the duration elapses (the
    orchestrator may SIGKILL us earlier — that's the point)."""
    from pyspark.sql import functions as F

    from sift_spark.session import get_spark
    from sift_spark.streaming.corpus import stream_corpus_dedup

    spark = get_spark("soak_child", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # rate value -> document; every 4th doc shares a text template with
    # its predecessor group so near-dup pairs actually flow
    docs = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rate))
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat(
                F.lit("the quick brown fox document number "),
                (F.col("value") / 4).cast("long").cast("string"),
                F.lit(" body text for streaming dedup soak with shingles "),
                F.when(F.col("value") % 4 == 0, F.lit("and a twist"))
                 .otherwise(F.lit("and a twist indeed")),
            ).alias("text"),
        )
    )
    q = stream_corpus_dedup(
        docs,
        index_path=f"{workdir}/index",
        pairs_path=f"{workdir}/pairs",
        trigger={"processingTime": "2 seconds"},
        checkpoint=f"{workdir}/checkpoint",
    )
    t0 = time.time()
    metrics_path = f"{workdir}/metrics.jsonl"
    seen = set()

    def poll() -> None:
        for p in q.recentProgress:
            bid = p.get("batchId")
            if bid in seen or p.get("numInputRows", 0) == 0:
                continue
            seen.add(bid)
            with open(metrics_path, "a") as fh:
                fh.write(json.dumps({
                    "batchId": bid,
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": (p.get("durationMs") or {}).get("triggerExecution"),
                    "stateOperators": len(p.get("stateOperators") or []),
                    "rss_mb": round(_rss_mb(), 1),
                    "t": round(time.time() - t0, 1),
                }) + "\n")
        if q.exception() is not None:
            raise SystemExit(f"query failed: {q.exception()}")

    while time.time() - t0 < seconds:
        time.sleep(1.0)
        poll()
    # under heavy ambient load a short duration can elapse before this
    # child commits a single batch — hold on (bounded) until it has,
    # so the restart phase always has post-restart work to verify
    while not seen and time.time() - t0 < seconds + 240:
        time.sleep(1.0)
        poll()
    q.stop()
    q.awaitTermination(30)
    print("CHILD_DONE", flush=True)


def orchestrate(seconds: float, rate: int, workdir: str,
                record: bool = True) -> None:
    import shutil

    workdir = os.path.abspath(workdir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)

    def spawn(dur: float) -> subprocess.Popen:
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "child",
             workdir, str(dur), str(rate)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True,
        )

    phase1 = seconds * 0.45
    p = spawn(seconds)  # child would run the full duration...
    t0 = time.time()
    metrics = f"{workdir}/metrics.jsonl"

    def n_batches() -> int:
        try:
            with open(metrics) as fh:
                return sum(1 for _ in fh)
        except OSError:
            return 0

    # ...but we kill it hard mid-stream — AFTER it provably committed
    # at least two batches (a fixed sleep flakes under ambient load)
    while time.time() - t0 < max(phase1, 30) or n_batches() < 2:
        if time.time() - t0 > seconds * 3 + 240:
            p.send_signal(signal.SIGKILL)
            raise AssertionError("phase-1 child never committed 2 batches")
        time.sleep(1.0)
    p.send_signal(signal.SIGKILL)
    p.wait()
    killed_at = time.time()
    print(f"# SIGKILLed child after {time.time()-t0:.0f}s "
          f"({n_batches()} batches committed)", flush=True)

    p = spawn(seconds * 0.55)
    out, _ = p.communicate(timeout=seconds * 3 + 600)
    assert "CHILD_DONE" in out, f"restarted child did not finish: {out[-500:]}"
    print(f"# restarted child finished ({time.time()-killed_at:.0f}s)", flush=True)

    # --- assertions over the on-disk outcome ---------------------------
    from sift_spark.session import get_spark

    spark = get_spark("soak_verify", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    idx = spark.read.parquet(f"{workdir}/index/bands")
    docs = idx.select("doc_id").distinct()
    n_docs = docs.count()
    mx = docs.agg({"doc_id": "max"}).collect()[0][0]
    # exactly-once across the kill: every value 0..max exactly once
    assert n_docs == mx + 1, f"gaps/dups: {n_docs} distinct vs max {mx}"
    dup_bands = (
        idx.groupBy("doc_id", "band").count().where("count > 1").count()
    )
    assert dup_bands == 0, f"{dup_bands} duplicated (doc, band) index rows"
    pairs = spark.read.parquet(f"{workdir}/pairs")
    n_pairs = pairs.count()
    dup_pairs = (
        pairs.groupBy("doc1", "doc2").count().where("count > 1").count()
    )
    assert dup_pairs == 0, f"{dup_pairs} duplicate pairs after replay"
    assert n_pairs > 0, "soak produced no near-dup pairs — template broken"

    # --- metrics: bounded memory + stateless engine --------------------
    with open(f"{workdir}/metrics.jsonl") as fh:
        ms = [json.loads(l) for l in fh if l.strip()]
    ms = [m for m in ms if m["durationMs"] is not None]
    assert ms, "no batch metrics recorded"
    assert all(m["stateOperators"] == 0 for m in ms), "unexpected state store use"
    third = max(1, len(ms) // 3)
    rss_first = sum(m["rss_mb"] for m in ms[:third]) / third
    rss_last = sum(m["rss_mb"] for m in ms[-third:]) / third
    assert rss_last < rss_first * 1.6 + 256, (
        f"driver RSS trends with stream length: {rss_first:.0f} -> {rss_last:.0f} MB"
    )
    result = {
        "seconds": seconds,
        "rate_rows_per_sec": rate,
        "docs_indexed": n_docs,
        "pairs_emitted": n_pairs,
        "batches": len(ms),
        "rss_first_third_mb": round(rss_first, 1),
        "rss_last_third_mb": round(rss_last, 1),
        "exactly_once_after_sigkill": True,
        "state_operators": 0,
    }
    if record:  # suite runs pass --no-record so the full-length
        # standalone record at the repo root isn't overwritten
        with open(os.path.join(REPO, "STREAMING_SOAK.json"), "w") as fh:
            json.dump(result, fh, indent=1)
    print("STREAMING_SOAK " + json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2], float(sys.argv[3]), int(sys.argv[4]))
    else:
        import argparse

        ap = argparse.ArgumentParser()
        ap.add_argument("--seconds", type=float, default=150.0)
        ap.add_argument("--rate", type=int, default=200)
        ap.add_argument("--workdir", default=os.path.join(REPO, ".tmp", "soak"))
        ap.add_argument("--no-record", action="store_true")
        a = ap.parse_args()
        orchestrate(a.seconds, a.rate, a.workdir, record=not a.no_record)
