"""Similarity search over embedding columns (array<float>).

- ``ann_topk_bruteforce``: exact cosine top-k — the correctness
  baseline, O(n²) by construction.
- ``ann_lsh_topk``: random-hyperplane LSH — vectors are bucketed by
  an 8-bit signature (sign of dot with 8 fixed planes); candidates
  are pairs sharing a bucket, so the join is a keyed equi-join that
  scales out. Recall vs the exact baseline is property-tested.

The plane matrix is a deterministic constant
(:data:`sift_spark.functions.core.LSH_PLANES`) embedded identically
in the DuckDB oracle, so even the approximate operator is
hash-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sift_spark.functions.core import LSH_PLANES, LSH_TABLES, cosine_sim


def round6_half_away(a):
    """6-dp rounding with ties away from zero — matches Spark
    ``F.round`` (HALF_UP) and DuckDB ``round``. ``np.round`` is
    half-to-even and diverges on exact 6-dp midpoints (e.g. 1/128)."""
    import numpy as np

    return np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6


def _plane_lit(vec: tuple[float, ...]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def _dot_lit(emb: Column, vec: tuple[float, ...]) -> Column:
    return F.aggregate(
        F.zip_with(emb, _plane_lit(vec), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_table_bucket(emb: Column, t: int) -> Column:
    """B-bit hyperplane signature of table ``t``."""
    sig = None
    for j, plane in enumerate(LSH_PLANES[t]):
        bit = F.when(_dot_lit(emb, plane) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("int")


def lsh_bucket_table(emb: DataFrame) -> DataFrame:
    """(vec_id, t, bucket) rows — one per LSH table."""
    sigs = F.array(
        *[
            F.struct(F.lit(t).alias("t"), lsh_table_bucket(F.col("embedding"), t).alias("bucket"))
            for t in range(LSH_TABLES)
        ]
    )
    return emb.select("vec_id", "embedding", F.explode(sigs).alias("tb")).select(
        "vec_id", "embedding", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket")
    )


def _tile_sims(emb: DataFrame, n_blocks: int, emit) -> DataFrame:
    """All-pairs cosine via block-tiled GEMM.

    Vectors are hashed into ``n_blocks`` row-blocks; each (left-block,
    right-block) tile is materialized by a cogrouped ``applyInPandas``
    and evaluated as one numpy matmul (Arrow batch in, BLAS, Arrow
    out). Communication is O(N·n_blocks) row replications — the
    standard distributed brute-force layout; at 100 TB you raise
    ``n_blocks`` so a tile's two row-blocks fit executor memory, and
    every tile runs as an independent task.

    ``emit(key, S, lids, rids)`` → (vec_id, neighbor_id, sim) rows to
    keep from a tile's similarity matrix S (lets callers do per-tile
    top-k or thresholding before anything is shuffled back).
    """
    import pandas as pd  # noqa: F401 (applyInPandas requirement)

    spark = emb.sparkSession
    left = (
        emb.select(F.col("vec_id").alias("lid"), F.col("embedding").alias("lemb"))
        .withColumn("lb", F.col("lid") % n_blocks)
        .crossJoin(F.broadcast(spark.range(n_blocks).select(F.col("id").cast("long").alias("rb"))))
    )
    right = (
        emb.select(F.col("vec_id").alias("rid"), F.col("embedding").alias("remb"))
        .withColumn("rb", F.col("rid") % n_blocks)
        .crossJoin(F.broadcast(spark.range(n_blocks).select(F.col("id").cast("long").alias("lb"))))
    )

    def tile(key, l, r):
        import numpy as np
        import pandas as pd

        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({"vec_id": [], "neighbor_id": [], "sim": []})
        L = np.stack(l["lemb"].to_numpy()).astype("float64")
        R = np.stack(r["remb"].to_numpy()).astype("float64")
        L = L / np.linalg.norm(L, axis=1, keepdims=True)
        R = R / np.linalg.norm(R, axis=1, keepdims=True)
        S = L @ R.T
        return emit(key, S, l["lid"].to_numpy(), r["rid"].to_numpy())

    return (
        left.groupby("lb", "rb")
        .cogroup(right.groupby("lb", "rb"))
        .applyInPandas(tile, schema="vec_id long, neighbor_id long, sim double")
    )


def ann_topk_bruteforce(emb: DataFrame, k: int = 5, n_blocks: int = 8) -> DataFrame:
    """Exact cosine top-k neighbors per vector:
    (vec_id, neighbor_id, sim, rank). Ties broken by neighbor_id.

    Per-tile top-k is taken inside the GEMM kernel (so only
    n_blocks·k candidates per vector are shuffled), then the global
    top-k is a per-vector window."""

    def emit(key, S, lids, rids):
        import numpy as np
        import pandas as pd

        Sr = round6_half_away(S)
        out_v, out_n, out_s = [], [], []
        for i in range(S.shape[0]):
            cand = np.where(rids != lids[i])[0]
            if len(cand) == 0:
                continue
            # total order (sim desc, neighbor asc) on ROUNDED sims so
            # per-tile pruning agrees with the oracle's global ranking
            order = np.lexsort((rids[cand], -Sr[i][cand]))
            top = cand[order[: min(k, len(cand))]]
            out_v.extend([lids[i]] * len(top))
            out_n.extend(rids[top])
            out_s.extend(Sr[i][top])
        return pd.DataFrame({"vec_id": out_v, "neighbor_id": out_n, "sim": out_s})

    pairs = _tile_sims(emb, n_blocks, emit)
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return pairs.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ann_ivf_topk(emb: DataFrame, k: int = 5, nprobe: int = 2) -> DataFrame:
    """IVF-style ANN: vectors are assigned to their nearest coarse-
    quantizer cell; each query probes its ``nprobe`` nearest cells
    and ranks exact cosine within them.

    The codebook is the deterministic constant
    :data:`~sift_spark.functions.core.IVF_CENTROIDS` (so the DuckDB
    oracle reproduces it exactly); swap in a k-means-trained codebook
    for production recall. Plan: centroid distances via a broadcast
    cells table (N·C dots), per-vector rank window, candidate
    equi-join on cell id — communication O(N·nprobe), never a cross
    join over vectors.
    """
    from sift_spark.functions.core import IVF_CENTROIDS

    spark = emb.sparkSession
    cells = spark.createDataFrame(
        [(c, list(v), sum(x * x for x in v)) for c, v in enumerate(IVF_CENTROIDS)],
        "cid int, cv array<double>, n2 double",
    )
    norm = F.sqrt(
        F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double"))
    )
    e = emb.select("vec_id", "embedding").withColumn("nrm", norm)
    dot_c = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("cv"), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    # argmin of squared distance = argmin of (-2 v·c + |c|²)
    celld = e.crossJoin(F.broadcast(cells)).select(
        "vec_id", (F.lit(-2.0) * dot_c + F.col("n2")).alias("d"), "cid"
    )
    w = Window.partitionBy("vec_id").orderBy("d", "cid")
    # persist: assign and probes both derive from this ranking
    ranked = celld.withColumn("rn", F.row_number().over(w)).persist()
    assign = ranked.where(F.col("rn") == 1).select("vec_id", F.col("cid").alias("cell"))
    probes = ranked.where(F.col("rn") <= nprobe).select("vec_id", "cid")
    cand = (
        probes.join(
            assign.select(F.col("vec_id").alias("neighbor_id"), F.col("cell").alias("cid")), "cid"
        )
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
        .distinct()
    )
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("emb_r"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    pairs = (
        cand.join(e, "vec_id")
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("emb_r"),
                F.col("nrm").alias("nrm_r"),
            ),
            "neighbor_id",
        )
        .select("vec_id", "neighbor_id", F.round(dot / (F.col("nrm") * F.col("nrm_r")), 6).alias("sim"))
    )
    wk = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return pairs.withColumn("rank", F.row_number().over(wk)).where(F.col("rank") <= k)


def ann_lsh_topk(emb: DataFrame, k: int = 5) -> DataFrame:
    """Multi-table LSH approximate top-k: candidates are vector pairs
    sharing any table's bucket (OR over L tables), then exact cosine
    + per-query top-k on the candidate set only:
    (vec_id, neighbor_id, sim, rank)."""
    # persist: both sides of the candidate self-join read this table,
    # and without caching the 24 signature dot-products run twice
    bt = lsh_bucket_table(emb.select("vec_id", "embedding")).persist()
    cand = (
        bt.alias("l")
        .join(
            bt.alias("r"),
            (F.col("l.t") == F.col("r.t"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") != F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("vec_id"), F.col("r.vec_id").alias("neighbor_id"))
        .distinct()
    )
    # norms are computed once per vector (map-side), so each candidate
    # pair evaluates a single dot-product aggregate instead of three
    norm = F.sqrt(
        F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double"))
    )
    e = emb.select("vec_id", "embedding").withColumn("nrm", norm)
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("emb_r"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    pairs = (
        cand.join(e.alias("a"), "vec_id")
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("emb_r"),
                F.col("nrm").alias("nrm_r"),
            ).alias("b"),
            "neighbor_id",
        )
        .select(
            "vec_id",
            "neighbor_id",
            F.round(dot / (F.col("nrm") * F.col("nrm_r")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return pairs.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
