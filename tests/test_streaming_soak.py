"""Standing-service soak assertions (r8 ask #5), suite-sized.

Runs scripts/streaming_soak.py — a processingTime-triggered rate-source
run of the standing LSH-index dedup that is SIGKILLed mid-stream and
restarted on its checkpoint — at a suite-friendly duration, and asserts
the exactly-once / bounded-memory / stateless-engine outcome. The
standalone script runs the full 2.5-minute soak and records
STREAMING_SOAK.json; SIFT_SOAK_SECONDS scales this test's duration.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_soak_sigkill_restart_exactly_once(tmp_path):
    seconds = os.environ.get("SIFT_SOAK_SECONDS", "70")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "streaming_soak.py"),
         "--seconds", seconds, "--rate", "150",
         "--workdir", str(tmp_path / "soak"), "--no-record"],
        capture_output=True, text=True, timeout=float(seconds) * 6 + 700,
        cwd=REPO,
    )
    marker = "STREAMING_SOAK "
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith(marker)]
    assert proc.returncode == 0 and lines, (
        f"soak failed rc={proc.returncode}\nstdout: {proc.stdout[-2000:]}\n"
        f"stderr: {proc.stderr[-2000:]}"
    )
    res = json.loads(lines[-1][len(marker):])
    # the orchestrator already asserted exactly-once, no-dup pairs,
    # flat RSS, and zero state operators — re-assert the headline facts
    assert res["exactly_once_after_sigkill"] is True
    assert res["state_operators"] == 0
    assert res["docs_indexed"] > 0 and res["pairs_emitted"] > 0
    assert res["batches"] >= 3, res
