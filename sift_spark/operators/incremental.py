"""Incremental model maintenance — merge new corpus slices into
existing models without full recomputation.

At 100 TB you never rebuild counts from scratch for a daily corpus
delta: additive models (counts, dfs, sums) merge by union +
re-aggregate (one shuffle over old∪delta, where delta ≪ old and the
old side is already compact); keyed snapshots upsert by latest
version. Rank-derived models (vocabs) are recomputed from the merged
counts — ranks are global and cheap once counts are maintained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_counts(old: DataFrame, delta: DataFrame, key_cols: list[str],
                 sum_cols: list[str]) -> DataFrame:
    """Additive merge: counts(corpus ∪ slice) = merge(counts(corpus),
    counts(slice)) for any sum/count-valued model."""
    return (
        old.select(*key_cols, *sum_cols)
        .unionByName(delta.select(*key_cols, *sum_cols))
        .groupBy(*key_cols)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )


def upsert_latest(old: DataFrame, delta: DataFrame, key_cols: list[str],
                  version_col: str) -> DataFrame:
    """Delta-style upsert without a table format: keep the row with
    the highest ``version_col`` per key (delta wins ties)."""
    tagged = old.withColumn("__src", F.lit(0)).unionByName(delta.withColumn("__src", F.lit(1)))
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc(), F.col("__src").desc())
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
