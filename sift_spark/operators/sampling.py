"""Deterministic sampling & splitting for training-data pipelines.

All sampling here is hash-based (md5-derived, seeded by a salt
string), NOT ``rand()``: the same row lands in the same
split/sample on every run, on any cluster, regardless of partitioning
— the property training-data lineage needs. ``F.rand`` is
seed-stable only under identical partitioning, so it silently
reshuffles membership when the input layout changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sift_spark.functions.core import hash64


def hash_bucket(key: Column, salt: str = "sample", n: int = 100) -> Column:
    """Stable bucket in [0, n) from a key column + salt."""
    return hash64(F.concat(F.lit(salt + ":"), key.cast("string"))) % n


def deterministic_sample(df: DataFrame, key_col: str, fraction: float,
                         salt: str = "sample") -> DataFrame:
    """Keep rows whose hash bucket < round(fraction·100) (percent
    granularity — use a larger modulus for finer rates; rounding, not
    truncation: int(0.29*100) is 28 under float error)."""
    return df.where(hash_bucket(F.col(key_col), salt) < round(fraction * 100))


def stratified_sample(df: DataFrame, key_col: str, stratum_col: str,
                      fractions: dict[str, float], salt: str = "sample") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep rare ones whole)."""
    bucket = hash_bucket(F.col(key_col), salt)
    cond = None
    for stratum, frac in fractions.items():
        c = (F.col(stratum_col) == stratum) & (bucket < round(frac * 100))
        cond = c if cond is None else cond | c
    known = F.col(stratum_col).isin(*fractions.keys())
    return df.where(cond | ~known)


def source_quota_sample(df: DataFrame, key_col: str = "doc_id",
                        source_col: str = "source", cap: int = 50,
                        salt: str = "quota") -> DataFrame:
    """Domain-mix rebalancing: keep at most ``cap`` rows per source,
    chosen by deterministic hash order (stable across runs and cluster
    layouts — the hash, not arrival order, decides membership).

    One shuffle keyed on the source column (row_number window). For a
    skewed mega-source at 100 TB scale, pre-filter with a hash
    threshold (≈ cap / est_count quantile) before the exact rank so
    the window only sees ~cap rows per source."""
    from pyspark.sql import Window

    h = hash64(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= cap)
        .select(key_col, source_col)
    )


def train_test_split(df: DataFrame, key_col: str, test_fraction: float = 0.1,
                     salt: str = "split") -> tuple[DataFrame, DataFrame]:
    """(train, test) with stable membership; a row's side never
    changes across runs or repartitions."""
    bucket = hash_bucket(F.col(key_col), salt)
    cut = round(test_fraction * 100)
    return df.where(bucket >= cut), df.where(bucket < cut)


def pack_sequences(docs_with_tokens: DataFrame, max_tokens: int = 2048,
                   key_col: str = "doc_id", n_col: str = "n_tokens") -> DataFrame:
    """Greedy sequence packing for training batches: documents are
    laid out in deterministic hash order and chunked into bins of
    ~``max_tokens`` by running token count (a doc whose tokens would
    overflow the current bin starts the next one — approximated here
    as cumulative-sum division, the streaming-equivalent greedy rule):
    (doc_id, bin_id, bin_offset).

    One global ordering is required for reproducible packing, so this
    uses a single ordered window over the hash — at 100 TB, run it
    per-shard after ``write_training_shards`` (shards are
    hash-disjoint, so per-shard packing is still deterministic) rather
    than globally.
    """
    from pyspark.sql import Window

    h = hash64(F.concat(F.lit("pack:"), F.col(key_col).cast("string")))
    w = Window.orderBy(h.asc(), F.col(key_col).asc())
    cum = F.sum(F.col(n_col)).over(w)
    return (
        docs_with_tokens.select(key_col, n_col)
        .withColumn("bin_id", F.floor((cum - F.col(n_col)) / max_tokens).cast("bigint"))
        .withColumn("bin_offset", ((cum - F.col(n_col)) % max_tokens).cast("bigint"))
        .select(key_col, n_col, "bin_id", "bin_offset")
    )


def weighted_sample(df: DataFrame, k: int = 100, key_col: str = "doc_id",
                    weight_col: str = "n_chars", salt: str = "wsample") -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res): each row draws u from its key's hash
    and gets priority −ln(u)/w; the k smallest priorities win, so
    P(selected) ∝ weight, the draw is reproducible on any cluster
    layout, and one distributed top-k (no global sort of the corpus —
    per-partition top-k feeds the final window) materializes the
    sample. Rank runs on the 6dp-ROUNDED priority with a key
    tie-break so the selection is engine-exact.
    """
    from pyspark.sql import Window

    u = (hash64(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))) % 1000000 + 0.5) / 1000000.0
    pr = F.round(-F.log(u) / F.col(weight_col), 6)
    w = Window.orderBy(F.col("priority").asc(), F.col(key_col).asc())
    return (
        df.withColumn("priority", pr)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(key_col, weight_col, "priority", "rank")
    )
