"""ivf_recall_report semantics: probing every cell reproduces the
exact ground truth (recall 1.0), and recall is nprobe-monotone —
the property that makes the audit gate trustworthy for tuning."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_ivf_recall_full_probe_is_exact_and_monotone(spark, tmp_path):
    from sift_spark.operators.similarity import (
        ivf_recall_report,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    ivf_write_index(emb, idx, n_cells=16)

    def rec(nprobe):
        row = ivf_recall_report(spark, emb, idx, k=5, nprobe=nprobe).collect()[0]
        assert row.n_queries == emb.count()
        return row.avg_recall

    r2, r4, r16 = rec(2), rec(4), rec(16)
    assert r16 == 1.0          # probing every cell == brute force
    assert r2 <= r4 <= r16     # more probes never lose neighbors
    # the fixture embeddings are near-random, so 2-of-16 trained cells
    # measures ~0.35 — the gate's job is to REPORT that, not hide it;
    # assert it's nonzero and meaningfully below the full probe
    assert 0.1 < r2 < r16
