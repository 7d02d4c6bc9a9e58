#!/usr/bin/env python
"""Kill-mid-batch soak for the STATEFUL streaming twins (VERDICT r10
ask #6): stream_decayed_counts, stream_changepoint,
stream_attribution each run as a standing ``applyInPandasWithState``
service over a time-sliced file source, get SIGKILLed while a
micro-batch is IN FLIGHT (offsets written, commit absent), restart on
the same checkpoint to drain the rest, and must then equal the batch
operator over the full event set — the state-store restore + replay
path proven end to end, not just the happy availableNow drain the
unit tests cover.

Per twin the orchestrator records: batches committed before the kill,
whether the kill landed mid-batch, batches after restart, and the
replay-equality verdict (the same equality rule the unit tests use:
forward-decay for decayed_counts, closed-bucket equality for CUSUM,
(first,last)-touch histogram for attribution).

Usage:
    python scripts/streaming_soak_stateful.py [--sf /root/testdata/sf0.01]
    python scripts/streaming_soak_stateful.py child <twin> <phase> <workdir> <slices>

Writes STREAMING_SOAK_STATEFUL.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TWINS = ("decayed", "changepoint", "attribution")
N_SLICES = 12
KILL_AFTER_COMMITS = 4


# --- child ------------------------------------------------------------------

def _stream_df(spark, slices_dir: str):
    from pyspark.sql import functions as F

    schema = spark.read.parquet(os.path.join(slices_dir, "s00.parquet")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(slices_dir, "*.parquet"))
        .withColumn("ts_ts", F.col("ts"))
    )


def _twin_query(twin: str, stream, workdir: str):
    from sift_spark.streaming.events import (
        stream_attribution,
        stream_changepoint,
        stream_decayed_counts,
    )

    if twin == "decayed":
        out = stream_decayed_counts(stream)
    elif twin == "attribution":
        out = stream_attribution(stream)
    else:
        with open(os.path.join(workdir, "ref_stats.json")) as fh:
            ref = {k: tuple(v) for k, v in json.load(fh).items()}
        out = stream_changepoint(stream, ref)
    return out


def child(twin: str, phase: str, workdir: str, slices_dir: str) -> None:
    from sift_spark.session import get_spark

    spark = get_spark(f"soak_{twin}")
    spark.sparkContext.setLogLevel("ERROR")
    out = _twin_query(twin, _stream_df(spark, slices_dir), workdir)
    w = (
        out.writeStream.format("parquet")
        .option("path", os.path.join(workdir, "out"))
        .option("checkpointLocation", os.path.join(workdir, "ck"))
        .outputMode("append")
    )
    if phase == "standing":
        q = w.trigger(processingTime="1 second").start()
        q.awaitTermination(600)  # the orchestrator SIGKILLs us first
    else:  # drain
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
    spark.stop()


# --- orchestrator -----------------------------------------------------------

def _prepare_slices(sf_dir: str, slices_dir: str) -> None:
    """Time-ordered event slices with increasing mtimes, so the file
    source processes them oldest-first and per-key event order holds
    across micro-batches (the stateful twins' input contract)."""
    import duckdb

    os.makedirs(slices_dir, exist_ok=True)
    con = duckdb.connect()
    src = os.path.join(sf_dir, "events.parquet")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{src}')").fetchone()[0]
    per = math.ceil(n / N_SLICES)
    for i in range(N_SLICES):
        path = os.path.join(slices_dir, f"s{i:02d}.parquet")
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') ORDER BY ts, event_id "
            f"LIMIT {per} OFFSET {i * per}) TO '{path}' (FORMAT PARQUET)"
        )
        os.utime(path, (time.time() - (N_SLICES - i) * 10,) * 2)


def _n(d: str) -> int:
    try:
        return len([f for f in os.listdir(d) if not f.startswith(".")])
    except FileNotFoundError:
        return 0


def _run_child(twin, phase, workdir, slices_dir):
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "child", twin, phase,
         workdir, slices_dir],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, cwd=REPO,
    )


def _soak_one(twin: str, workdir: str, slices_dir: str) -> dict:
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    if twin == "changepoint":
        with open(os.path.join(workdir, "ref_stats.json"), "w") as fh:
            json.dump(_REF_STATS, fh)
    ck_off = os.path.join(workdir, "ck", "offsets")
    ck_com = os.path.join(workdir, "ck", "commits")

    proc = _run_child(twin, "standing", workdir, slices_dir)
    killed_mid_batch, deadline = False, time.time() + 300
    while time.time() < deadline:
        commits = _n(ck_com)
        if commits >= KILL_AFTER_COMMITS and _n(ck_off) > commits:
            # a batch is IN FLIGHT (its offsets are written, its commit
            # is not) — this is the mid-batch kill the soak is about
            proc.send_signal(signal.SIGKILL)
            killed_mid_batch = True
            break
        if proc.poll() is not None:
            break
        time.sleep(0.005)
    if not killed_mid_batch and proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
    proc.wait()
    commits_before = _n(ck_com)

    drain = _run_child(twin, "drain", workdir, slices_dir)
    rc = drain.wait(timeout=600)
    return {
        "killed_mid_batch": killed_mid_batch,
        "commits_before_kill": commits_before,
        "commits_total": _n(ck_com),
        "drain_rc": rc,
    }


_REF_STATS: dict = {}


def _verify(spark, twin: str, workdir: str, sf_dir: str) -> dict:
    """The unit tests' equality rules, applied to the post-replay
    output (read through the sink's _spark_metadata log = the
    exactly-once view)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    got_df = spark.read.parquet(os.path.join(workdir, "out"))
    if twin == "decayed":
        from sift_spark.operators.events import decayed_counts

        last: dict = {}
        for r in got_df.collect():
            k = (r.user_id, r.event_type)
            if k not in last or r.n_events > last[k].n_events:
                last[k] = r
        T = ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
        half = 24 * 3600.0
        want = {
            (r.user_id, r.event_type): (r.n_events, r.decayed_count)
            for r in decayed_counts(ev).collect()
        }
        if set(last) != set(want):
            return {"equal": False, "why": "key sets differ",
                    "n_stream": len(last), "n_batch": len(want)}
        worst = 0.0
        for k, r in last.items():
            n_b, dec_b = want[k]
            if r.n_events != n_b:
                return {"equal": False, "why": f"n_events mismatch at {k}"}
            fwd = r.decayed_at_last * 0.5 ** ((T - r.last_t) / half)
            worst = max(worst, abs(fwd - dec_b))
        return {"equal": worst < 1e-4, "n_keys": len(want),
                "max_abs_err": round(worst, 9)}
    if twin == "attribution":
        from sift_spark.operators.events import attribution_counts

        got: dict = {}
        for r in got_df.collect():
            k = (r.first_touch, r.last_touch)
            got[k] = got.get(k, 0) + 1
        want = {
            (r.first_touch, r.last_touch): r.n_conversions
            for r in attribution_counts(ev).collect()
        }
        return {"equal": got == want, "n_paths": len(want)}
    # changepoint
    from sift_spark.operators.events import changepoint_cusum

    want = {
        (r.event_type, r.window_start): (r.n, r.cusum_pos, r.cusum_neg, r.is_change)
        for r in changepoint_cusum(ev).collect()
    }
    got = {
        (r.event_type, r.window_start): (r.n, r.cusum_pos, r.cusum_neg, r.is_change)
        for r in got_df.collect()
    }
    last = {}
    for (et, ws) in want:
        last[et] = max(last.get(et, ws), ws)
    expected = {(et, ws): v for (et, ws), v in want.items() if ws != last[et]}
    return {"equal": got == expected, "n_closed_buckets": len(expected)}


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    base = os.path.join(REPO, ".tmp", "soak_stateful")
    slices_dir = os.path.join(base, "slices")
    shutil.rmtree(base, ignore_errors=True)
    _prepare_slices(sf_dir, slices_dir)

    # reference CUSUM stats from the batch series (the stream contract)
    from sift_spark.session import get_spark

    spark = get_spark("soak_verify")
    spark.sparkContext.setLogLevel("ERROR")
    from sift_spark.operators.events import changepoint_cusum

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    series: dict = {}
    for r in changepoint_cusum(ev).collect():
        series.setdefault(r.event_type, []).append(r.n)
    for et, ns in series.items():
        mu = sum(ns) / len(ns)
        sd = math.sqrt(sum((v - mu) ** 2 for v in ns) / (len(ns) - 1))
        _REF_STATS[et] = (mu, sd)

    results = {}
    for twin in TWINS:
        workdir = os.path.join(base, twin)
        t0 = time.time()
        run = _soak_one(twin, workdir, slices_dir)
        run["wall_s"] = round(time.time() - t0, 1)
        run.update(_verify(spark, twin, workdir, sf_dir))
        results[twin] = run
        print(f"{twin}: {run}", flush=True)

    record = {
        "sf_dir": sf_dir, "n_slices": N_SLICES,
        "kill_after_commits": KILL_AFTER_COMMITS,
        "protocol": "standing processingTime stream SIGKILLed while a "
                    "batch is in flight (offsets > commits), restarted on "
                    "the same checkpoint with availableNow, compared to "
                    "the batch operator over the full event set",
        "twins": results,
        "all_equal": all(r.get("equal") for r in results.values()),
        "all_killed_mid_batch": all(r.get("killed_mid_batch")
                                    for r in results.values()),
    }
    with open(os.path.join(REPO, "STREAMING_SOAK_STATEFUL.json"), "w") as fh:
        json.dump(record, fh, indent=1)
    print("wrote STREAMING_SOAK_STATEFUL.json")
    assert record["all_equal"], "replay equality failed"


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(*sys.argv[2:6])
    else:
        main()
