"""Round-8: CC driver gate equivalence + checkpoint modes.

The CC variants now (a) resolve small verified-pair graphs driver-side
(vectorized numpy) and (b) honor ``spark.sift.checkpoint=reliable``
for executor-loss-tolerant lineage cuts. These tests pin that all
three paths — driver, distributed/localCheckpoint, distributed/
reliable — produce identical (node → component-min) labelings on
clique, chain (high-diameter, the star variant's reason to exist),
and string-vertex graphs.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted((r[0], r[1]) for r in df.collect())


GRAPHS = {
    # two cliques + a singleton self-pair
    "cliques": [(1, 2), (2, 3), (1, 3), (10, 11), (5, 5)],
    # a 12-node chain: needs >1 min-label round, exercises pointer jumps
    "chain": [(i, i + 1) for i in range(1, 12)],
    # string vertices (entity_components shape), reversed orientation
    "strings": [("b", "a"), ("c", "b"), ("x", "y")],
}


def _expected(edges):
    # independent reference: brute-force label flooding
    nodes = {n for e in edges for n in e}
    lab = {n: n for n in nodes}
    for _ in range(len(nodes)):
        for u, v in edges:
            m = min(lab[u], lab[v])
            lab[u] = lab[v] = m
    return sorted(lab.items())


@pytest.mark.parametrize("variant", ["prop", "star"])
@pytest.mark.parametrize("graph", sorted(GRAPHS))
def test_driver_gate_matches_distributed(spark, variant, graph):
    from sift_spark.operators.dedup import (
        CC_DRIVER_EDGE_LIMIT_CONF,
        duplicate_clusters,
        duplicate_clusters_star,
    )

    fn = duplicate_clusters if variant == "prop" else duplicate_clusters_star
    edges = GRAPHS[graph]
    pairs = spark.createDataFrame(edges, ["doc1", "doc2"])
    exp = _expected(
        # the star variant drops self-loop-only nodes by contract
        [e for e in edges if not (variant == "star" and e[0] == e[1])]
    )
    got_driver = _rows(fn(pairs))
    try:
        spark.conf.set(CC_DRIVER_EDGE_LIMIT_CONF, "0")  # force distributed
        got_dist = _rows(fn(pairs))
    finally:
        spark.conf.unset(CC_DRIVER_EDGE_LIMIT_CONF)
    assert got_driver == exp
    assert got_dist == exp


def test_reliable_checkpoint_mode_identical(spark):
    """spark.sift.checkpoint=reliable must be output-identical on the
    real operator composition (minhash pairs → CC → apply) and must
    actually set a checkpoint directory."""
    from sift_spark.operators.dedup import (
        CC_DRIVER_EDGE_LIMIT_CONF,
        dedup_apply,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pairs = minhash_lsh_pairs(docs)
    base = sorted(tuple(r) for r in dedup_apply(docs, pairs).collect())
    try:
        spark.conf.set("spark.sift.checkpoint", "reliable")
        # force the distributed CC rounds so the reliable cut is
        # exercised inside the loop, not just at the edge list
        spark.conf.set(CC_DRIVER_EDGE_LIMIT_CONF, "0")
        rel = sorted(tuple(r) for r in dedup_apply(docs, pairs).collect())
        assert spark.sparkContext.getCheckpointDir() is not None
    finally:
        spark.conf.unset("spark.sift.checkpoint")
        spark.conf.unset(CC_DRIVER_EDGE_LIMIT_CONF)
    assert rel == base


def test_checkpoint_mode_validation(spark):
    from sift_spark.functions.lineage import checkpoint_mode

    try:
        spark.conf.set("spark.sift.checkpoint", "bogus")
        with pytest.raises(ValueError, match="bogus"):
            checkpoint_mode(spark)
    finally:
        spark.conf.unset("spark.sift.checkpoint")


def test_word2vec_fixed_seed_single_partition_exact(spark):
    """Round-8: the Word2Vec determinism fixture — with seed pinned
    and numPartitions=1 the training order is sequential, so two runs
    over the same tiny corpus must produce BITWISE-identical vectors
    (the neighborhood-Jaccard property test remains the check for the
    real multi-partition path, whose values are training-order-
    dependent by design)."""
    from pyspark.sql import Row

    from sift_spark.models.embeddings import skipgram_embeddings

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t)
            for i, t in enumerate(
                [
                    "alpha beta gamma alpha beta",
                    "beta gamma delta beta gamma",
                    "gamma delta alpha gamma delta",
                    "delta alpha beta delta alpha",
                ]
                * 4
            )
        ]
    ).coalesce(1)

    def run():
        rows = skipgram_embeddings(
            docs, dimensions=8, min_count=1, seed=7, num_partitions=1, max_iter=2
        ).collect()
        return {r["term"]: tuple(r["vector"]) for r in rows}

    a, b = run(), run()
    assert set(a) == {"alpha", "beta", "gamma", "delta"}
    assert a == b  # exact float equality, not approx


def test_redirect_driver_gate_matches_distributed(spark):
    """The redirect fixpoint's driver dict-walk must equal the
    distributed hop loop — including a cycle (resolves to the same
    parity-of-hops node) and a chain longer than one hop."""
    from sift_spark.corpora.redirects import (
        REDIRECTS_DRIVER_LIMIT_CONF,
        resolve_transitive,
    )

    pairs = [("a", "b"), ("b", "c"), ("c", "d"),   # 3-chain
             ("x", "y"), ("y", "x"),               # 2-cycle
             ("lone", "end"),
             ("n", None), (None, "a")]             # NULLs: join is null-unsafe
    rd = spark.createDataFrame(pairs, "source string, target string")
    key = lambda t: (t[0] or "", t[1] or "")
    drv = sorted((tuple(r) for r in resolve_transitive(rd).collect()), key=key)
    try:
        spark.conf.set(REDIRECTS_DRIVER_LIMIT_CONF, "0")  # force distributed
        dist = sorted((tuple(r) for r in resolve_transitive(rd).collect()), key=key)
    finally:
        spark.conf.unset(REDIRECTS_DRIVER_LIMIT_CONF)
    assert drv == dist
    d = dict((k, v) for k, v in drv if k is not None)
    assert d["a"] == "d" and d["lone"] == "end"
    assert d["n"] is None  # NULL target stops the walk in both paths


def test_cc_driver_vs_distributed_property(spark):
    """Property check over random graphs: the numpy driver pass and
    the distributed rounds agree on BOTH CC variants for arbitrary
    edge lists (self-loops, duplicate edges, multi-component,
    chain+clique mixes) — seeded exhaustively rather than via
    hypothesis so the Spark session round-trips stay bounded."""
    import random

    from sift_spark.operators.dedup import (
        CC_DRIVER_EDGE_LIMIT_CONF,
        duplicate_clusters,
        duplicate_clusters_star,
    )

    rng = random.Random(8)
    for trial in range(4):
        n = rng.randint(2, 24)
        m = rng.randint(1, 40)
        edges = [(rng.randint(0, n), rng.randint(0, n)) for _ in range(m)]
        pairs = spark.createDataFrame(edges, ["doc1", "doc2"])
        for fn, drop_self in ((duplicate_clusters, False),
                              (duplicate_clusters_star, True)):
            exp = _expected(
                [e for e in edges if not (drop_self and e[0] == e[1])]
            )
            assert _rows(fn(pairs)) == exp, (trial, fn.__name__, edges)
            try:
                spark.conf.set(CC_DRIVER_EDGE_LIMIT_CONF, "0")
                assert _rows(fn(pairs)) == exp, (trial, fn.__name__, "dist")
            finally:
                spark.conf.unset(CC_DRIVER_EDGE_LIMIT_CONF)


def test_reliable_mode_refuses_default_dir_on_real_cluster():
    """On a multi-node master, reliable mode without an explicit
    checkpoint dir must refuse loudly — a driver-local temp dir is
    per-machine and silently voids the recovery guarantee."""
    from sift_spark.functions.lineage import _single_machine_master

    assert _single_machine_master("local[32]")
    assert _single_machine_master("local-cluster[2,2,2048]")
    for m in ("spark://host:7077", "yarn", "k8s://https://api:6443"):
        assert not _single_machine_master(m)
