"""Property tests for the late-round-3 machinery: Viterbi segmentation
invariants, the generated Cramer solve on arbitrary SPD systems, and
layout-invariance of the decimal-exact classifier training."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=8),
    pieces=st.sets(st.text(alphabet="abc", min_size=1, max_size=4), max_size=8),
)
def test_viterbi_roundtrip_and_optimality(word, pieces):
    """Segmentation always concatenates back to the word, and its
    score is maximal over ALL enumerable segmentations (brute force on
    short words), under the documented tie-break."""
    from sift_spark.operators.tokenizer import _viterbi

    logp = {p: math.log((i + 1) / (2 * len(pieces) + 2)) for i, p in enumerate(sorted(pieces))}
    got = _viterbi(word, logp, max_len=4)
    assert "".join(got) == word

    def score(seg):
        s = 0.0
        for p in seg:
            lp = logp.get(p)
            if lp is None:
                if len(p) == 1:
                    lp = -100.0
                else:
                    return None
            s += lp
        return s

    def all_segs(w):
        if not w:
            yield []
            return
        for ln in range(1, min(4, len(w)) + 1):
            for rest in all_segs(w[ln:]):
                yield [w[:ln]] + rest

    best = max(
        (s for s in (score(seg) for seg in all_segs(word)) if s is not None)
    )
    got_score = score(got)
    assert got_score is not None
    assert abs(got_score - best) < 1e-9


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_cramer_formulas_solve_random_spd_systems(seed):
    from sift_spark.operators.classify import D, newton_delta_formulas

    rng = np.random.RandomState(seed)
    A = rng.rand(D, D)
    H = A @ A.T + (0.1 + rng.rand()) * np.eye(D)
    g = rng.randn(D)
    env = {f"g{j}": float(g[j]) for j in range(D)}
    for r in range(D):
        for c in range(r, D):
            env[f"h{r}{c}"] = float(H[r, c])
    d = np.array(
        [eval(f, {"__builtins__": {}}, env) for f in newton_delta_formulas()]  # noqa: S307
    )
    assert np.allclose(H @ d, g, atol=1e-8)


def test_logreg_training_is_layout_invariant(spark):
    """Decimal-exact partials make the trained weights BIT-identical
    under any repartitioning — the property that keeps the driver's
    differently-parallel session hash-consistent."""
    from sift_spark.io import table
    from sift_spark.operators.classify import logreg_train
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    w1 = logreg_train(docs, n_iter=3)
    w2 = logreg_train(docs.repartition(13), n_iter=3)
    w3 = logreg_train(docs.coalesce(1), n_iter=3)
    assert w1 == w2 == w3
