"""Executor-loss chaos run: SIGKILL one executor JVM mid-CC-iteration
on ``local-cluster[2,2,2048]`` and report whether the query survives.

This is the measured form of the round-8 fault-tolerance claim:
``localCheckpoint`` blocks live on executors with NO lineage to
rebuild them, so losing an executor mid-loop is unrecoverable and the
query fails; ``spark.sift.checkpoint=reliable`` writes rounds to the
checkpoint dir, the standalone worker relaunches the executor, tasks
retry, and the SAME query completes with the SAME answer.

The graph is a long chain (high diameter) so the star-CC loop runs
enough rounds (~log² n) to leave a multi-second kill window; the
driver gate is disabled so the distributed rounds actually run.

    python scripts/chaos_executor_loss.py reliable   # expect survive
    python scripts/chaos_executor_loss.py local      # expect fail

Prints one line: ``CHAOS_RESULT {"mode": ..., "killed": ...,
"outcome": "completed"|"failed", "rows": ..., "correct": ...}``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CHAIN = 60_000
KILL_AFTER_S = 6.0


def _executor_pids(app_id: str) -> list[int]:
    """Executor JVMs of THIS app only — matched on the ``--app-id``
    the standalone worker passes on the executor command line, so a
    concurrent Spark app on the same host (parallel tests, a user's
    bench) is never collateral damage (and the kill can't be vacuous:
    hitting another app would leave this query untouched and falsely
    'prove' fault tolerance)."""
    out = subprocess.run(
        ["pgrep", "-f", f"CoarseGrainedExecutorBackend.*{app_id}"],
        capture_output=True, text=True,
    )
    return [int(p) for p in out.stdout.split()]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "reliable"
    assert mode in ("local", "reliable")
    from pyspark.sql import SparkSession

    from scripts.multijvm_slice import package_zip

    spark = (
        SparkSession.builder.master("local-cluster[2,2,2048]")
        .appName(f"sift_chaos_{mode}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.pyspark.python", sys.executable)
        # survive the loss bookkeeping: retries are the point here
        .config("spark.task.maxFailures", "8")
        .config("spark.stage.maxConsecutiveAttempts", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addPyFile(package_zip())
    spark.conf.set("spark.sift.checkpoint", mode)
    spark.conf.set("spark.sift.cc.driverEdgeLimit", "0")

    from pyspark.sql import functions as F

    from sift_spark.operators.dedup import duplicate_clusters_star

    # chain 0-1-2-…-N: one component, min label 0, diameter N
    pairs = (
        spark.range(N_CHAIN - 1)
        .select(F.col("id").alias("doc1"), (F.col("id") + 1).alias("doc2"))
        .repartition(8)
    )

    state = {"killed": None}
    app_id = spark.sparkContext.applicationId

    def killer():
        time.sleep(KILL_AFTER_S)
        pids = _executor_pids(app_id)
        if pids:
            os.kill(pids[0], 9)
            state["killed"] = pids[0]

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    outcome, rows, correct = "completed", None, None
    try:
        got = duplicate_clusters_star(pairs).collect()
        rows = len(got)
        correct = rows == N_CHAIN and all(r["rep_id"] == 0 for r in got)
    except Exception as e:  # noqa: BLE001 — the failure IS the measurement
        outcome = "failed"
        correct = False
        print(f"# query failed: {type(e).__name__}: {str(e)[:200]}", flush=True)
    t.join(timeout=1)
    print("CHAOS_RESULT " + json.dumps({
        "mode": mode,
        "killed": state["killed"],
        "outcome": outcome,
        "rows": rows,
        "correct": correct,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
