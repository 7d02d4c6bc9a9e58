"""embedding_pca [r]-strength hardening (r8 ask #7).

The driver's oracle is a static ANSI-SQL string; a DATA-DEPENDENT
d×d eigendecomposition is not expressible there, and pinning literal
components into the SQL would (a) break at every other scale factor
and (b) be mirroring, not verification — so embedding_pca stays [r]
by documented design. These tests make the [r] evidence as strong as
a hash: exact (2e-6) equality against an INDEPENDENT full-data numpy
PCA at sf0.01 — the exact data the driver gates on — plus partition-
layout invariance of the distributed Gram reduction (the only
float-order freedom in the plan).
"""

from __future__ import annotations

import numpy as np

SF_DRIVER = "/root/testdata/sf0.01"


def _numpy_pca(pdf, k=4):
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / (len(X) - 1)
    evals, evecs = np.linalg.eigh(cov)
    W = evecs[:, np.argsort(evals)[::-1][:k]]
    W = W * np.sign(W[np.abs(W).argmax(axis=0), range(k)])
    return (X - mu) @ W


def test_embedding_pca_matches_numpy_at_driver_sf(spark):
    from sift_spark.io import table
    from sift_spark.operators.similarity import embedding_pca

    emb = table(spark, SF_DRIVER, "embeddings")
    got = {r.vec_id: np.array(r.pc) for r in embedding_pca(emb, 4).collect()}
    pdf = emb.select("vec_id", "embedding").toPandas()
    want = _numpy_pca(pdf)
    for i, vid in enumerate(pdf["vec_id"]):
        assert np.allclose(got[vid], want[i], atol=2e-6), (vid,)


def test_embedding_pca_partition_layout_invariant(spark):
    """The Gram partials are per-Arrow-batch float sums — the one
    place partitioning could leak into the result. Rounded at 6dp,
    1 partition and 13 partitions must hash identically."""
    from sift_spark.io import table
    from sift_spark.operators.similarity import embedding_pca

    emb = table(spark, SF_DRIVER, "embeddings")
    a = {r.vec_id: tuple(r.pc) for r in
         embedding_pca(emb.coalesce(1), 4).collect()}
    b = {r.vec_id: tuple(r.pc) for r in
         embedding_pca(emb.repartition(13), 4).collect()}
    assert a == b
