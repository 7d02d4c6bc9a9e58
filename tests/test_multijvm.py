"""Multi-JVM execution proof (the round-8 #1 ask).

Everything else in this repo runs ``local[*]`` — one JVM, no closure
serialization boundary, localCheckpoint blocks in-process. This test
runs the representative slice (CC localCheckpoint loop forced down the
distributed path, star CC over strings, shared-artifact consumer,
Arrow-cogroup GEMM, grouped IRLS, windowed agg + its streaming twin)
on ``local-cluster[2,2,2048]`` — two separate executor JVMs — in a
subprocess, and asserts the value hashes are IDENTICAL to the same
slice computed on the in-process local session.

What the harness already caught while being built: executor Python
workers do not inherit the driver's sys.path, so every pandas-UDF
closure needs the package shipped via ``addPyFile`` exactly as a real
cluster submit would (scripts/multijvm_slice.py:package_zip).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_local_cluster_slice_hash_identical(spark):
    from scripts.multijvm_slice import run_slice

    local = run_slice(spark)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multijvm_slice.py"),
         "local-cluster[2,2,2048]"],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    marker = "MULTIJVM_RESULT "
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith(marker)]
    assert lines, (
        f"no result line from local-cluster run\nrc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
    cluster = json.loads(lines[-1][len(marker):])
    assert set(cluster) == set(local)
    for name in sorted(local):
        assert cluster[name]["rows"] == local[name]["rows"], name
        assert cluster[name]["hash"] == local[name]["hash"], (
            f"{name}: multi-JVM hash differs from local[*]"
        )
        assert cluster[name]["rows"] > 0, name


def test_multijvm_sweep_record_pins_registry():
    """The recorded full-catalog multi-JVM sweep must cover EXACTLY
    the current oracle-paired registry with zero mismatches. This is
    the r8 gap class closed structurally: two audit gates registered
    after that round's sweep had run were never proven across a
    process boundary, and nothing failed. Now: add an oracle-paired
    query without re-running scripts/multijvm_sweep.py and THIS test
    fails."""
    from sift_spark.oracle import ORACLE
    from sift_spark.queries import QUERIES

    paired = sum(1 for q in QUERIES if q in ORACLE)
    path = os.path.join(REPO, "MULTIJVM_SWEEP.json")
    assert os.path.exists(path), (
        "no MULTIJVM_SWEEP.json at the repo root — run "
        "scripts/multijvm_sweep.py (local-cluster[2,2,2048] full sweep)"
    )
    with open(path) as fh:
        rec = json.load(fh)
    assert rec["mismatches"] == [], rec["mismatches"]
    assert rec["paired"] == paired, (
        f"recorded sweep covered {rec['paired']} oracle-paired queries; "
        f"the registry now has {paired} — re-run scripts/multijvm_sweep.py "
        "so every query crosses a process boundary"
    )


def test_reliable_checkpoint_survives_executor_loss():
    """Chaos proof of the round-8 fault-tolerance claim: SIGKILL one
    executor JVM mid-CC-iteration on local-cluster — with
    spark.sift.checkpoint=reliable the worker relaunches the executor,
    tasks retry from the checkpoint files, and the query completes
    with the correct answer. (The localCheckpoint control run fails on
    the same kill — demonstrated by scripts/chaos_executor_loss.py
    local — but is not asserted here: its failure depends on the kill
    landing while lost blocks are still referenced, which is the
    common case, not a guaranteed one.)"""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "chaos_executor_loss.py"),
         "reliable"],
        capture_output=True, text=True, timeout=540, cwd=REPO,
    )
    marker = "CHAOS_RESULT "
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith(marker)]
    assert lines, f"no result\nstdout: {proc.stdout[-1500:]}\nstderr: {proc.stderr[-1500:]}"
    res = json.loads(lines[-1][len(marker):])
    assert res["outcome"] == "completed", res
    assert res["correct"] is True, res
    # the kill must actually have happened for this to prove anything
    assert res["killed"] is not None, res
