"""quality_classifier (IRLS logistic regression) semantics: exact
equality with a numpy twin, recovery of the generating rule, and the
map-side apply path. Cross-engine parity runs in test_oracle_parity."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMOKE


def _xy(spark):
    from sift_spark.io import table
    from sift_spark.operators.classify import quality_features

    docs = table(spark, SF_SMOKE, "documents")
    rows = quality_features(docs).collect()
    X = np.array([[r[f"x{j}"] for j in range(4)] for r in rows])
    y = np.array([r["y"] for r in rows])
    return docs, X, y


def test_logreg_train_equals_numpy_twin_exactly(spark):
    """Same 9dp-rounded partials + the same Cramer formula strings
    must give bit-identical weights on the driver and in numpy."""
    from sift_spark.operators.classify import (
        D,
        RIDGE,
        logreg_train,
        newton_delta_formulas,
    )

    from decimal import ROUND_HALF_UP, Decimal

    docs, X, y = _xy(spark)
    deltas = newton_delta_formulas()
    N = len(y)
    q = Decimal("1e-15")

    def dsum(arr):
        # mirror of the engines' exact decimal aggregation: quantize
        # each contribution to 15dp, sum exactly, back to double
        tot = sum(
            Decimal(float(np.round(v, 15))).quantize(q, ROUND_HALF_UP) for v in arr
        )
        return float(tot)

    w = np.zeros(D)
    for _ in range(6):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        env = {}
        for j in range(D):
            env[f"g{j}"] = round(dsum(X[:, j] * (p - y)) / N, 9)
        s = p * (1 - p)
        for r in range(D):
            for c in range(r, D):
                env[f"h{r}{c}"] = round(dsum(X[:, r] * X[:, c] * s) / N, 9)
        for j in range(D):
            env[f"h{j}{j}"] += RIDGE
        for j in range(D):
            w[j] -= round(eval(deltas[j], {"__builtins__": {}}, env), 9)  # noqa: S307

    got = logreg_train(docs)
    assert np.abs(np.array(got) - w).max() == 0.0


def test_classifier_learns_the_generating_rule(spark):
    """score = x1 + x2 - x3 - θ, so the trained weights must carry
    that sign structure and separate the median split well."""
    from sift_spark.operators.classify import classifier_scores, logreg_train

    docs, _, _ = _xy(spark)
    w = logreg_train(docs)
    assert w[1] > 0 and w[2] > 0 and w[3] < 0 and w[0] < 0
    rows = classifier_scores(docs, w).collect()
    acc = sum((r["p"] >= 0.5) == (r["y"] == 1.0) for r in rows) / len(rows)
    assert acc >= 0.9
    assert len(rows) == docs.count()


def test_newton_delta_formulas_solve_linear_system():
    """The generated Cramer strings actually solve H·d = g for a
    random-ish symmetric positive-definite H."""
    from sift_spark.operators.classify import D, newton_delta_formulas

    rng = np.random.RandomState(7)
    A = rng.rand(D, D)
    H = A @ A.T + np.eye(D)
    g = rng.rand(D)
    env = {f"g{j}": g[j] for j in range(D)}
    for r in range(D):
        for c in range(r, D):
            env[f"h{r}{c}"] = H[r, c]
    d = [eval(f, {"__builtins__": {}}, env) for f in newton_delta_formulas()]  # noqa: S307
    assert np.allclose(H @ np.array(d), g, atol=1e-9)


def test_round_half_up_matches_spark_round_tie_adjacent(spark):
    """ONE rounding mechanism across all three delta legs: the driver
    leg's _round_half_up must agree with the in-plan F.round (and, by
    the same probe, DuckDB round) on tie-adjacent values — the exact
    cases where Python's builtin half-even round flips the last digit
    that 1/RIDGE then amplifies."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    from sift_spark.operators.classify import _round_half_up

    # decimal ties, near-ties one ulp off, and real-magnitude deltas
    grid = [1.5e-9, 2.5e-9, 7.5e-10, -1.5e-9, 0.0010000005, 2.0000000005,
            0.1234567895, -0.1234567895]
    grid += [math.nextafter(x, math.inf) for x in grid]
    grid += [math.nextafter(x, -math.inf) for x in grid[:8]]

    df = spark.createDataFrame([(i, x) for i, x in enumerate(grid)], "i long, x double")
    spark_rounded = {
        r["i"]: r["r"]
        for r in df.select("i", F.round("x", 9).alias("r")).collect()
    }
    con = duckdb.connect()
    for i, x in enumerate(grid):
        ours = _round_half_up(x, 9)
        duck = con.execute("select round(?::DOUBLE, 9)", [x]).fetchone()[0]
        assert ours == spark_rounded[i], (x, ours, spark_rounded[i])
        assert ours == duck, (x, ours, duck)


def test_driver_gate_matches_distributed_irls(spark):
    """Round-8: the size-gated driver IRLS twin must return BITWISE
    identical weights to the distributed decimal aggregate (same
    margin fold, 15dp HALF_UP quantization, exact Decimal sums, 9dp
    deltas) — on the real documents table, not a toy."""
    from sift_spark.operators.classify import (
        LOGREG_DRIVER_GROUP_LIMIT_CONF,
        logreg_train,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    w_driver = logreg_train(docs, n_iter=6)
    try:
        spark.conf.set(LOGREG_DRIVER_GROUP_LIMIT_CONF, "0")  # force distributed
        w_dist = logreg_train(docs, n_iter=6)
    finally:
        spark.conf.unset(LOGREG_DRIVER_GROUP_LIMIT_CONF)
    assert w_driver == w_dist  # exact float equality
