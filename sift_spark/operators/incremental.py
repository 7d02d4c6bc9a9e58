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


def scd2_merge(history: DataFrame, updates: DataFrame, key_cols: list[str],
               attr_cols: list[str], ts_col: str = "ts") -> DataFrame:
    """Type-2 slowly-changing-dimension merge: apply an update batch
    to an SCD2 history table (``valid_from``/``valid_to``, open rows
    have ``valid_to`` NULL).

    For each key with updates: the open row closes at the first
    changed update's timestamp, and each ATTRIBUTE CHANGE in the
    batch opens a new row (consecutive equal attribute snapshots
    collapse, so replayed/duplicate updates are no-ops). Keys without
    updates pass through untouched. One shuffle on the key — closed
    history rows never rewrite, which is what makes SCD2 the
    append-friendly history layout at warehouse scale.
    """
    from pyspark.sql import Window

    attrs = [F.col(c) for c in attr_cols]
    snap = F.struct(*attrs)

    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    open_rows = history.where(F.col("valid_to").isNull()).select(
        *key_cols, *attr_cols, F.col("valid_from").alias(ts_col)
    )
    # idempotency under replay: updates at or before the current open
    # version's start are already folded into history — drop them
    # (at-least-once delivery replays whole batches; without this a
    # replay would resurrect superseded versions)
    cur = open_rows.select(*key_cols, F.col(ts_col).alias("__cur_from"))
    fresh = (
        updates.select(*key_cols, *attr_cols, ts_col)
        .join(cur, key_cols, "left")
        .where(F.col("__cur_from").isNull() | (F.col(ts_col) > F.col("__cur_from")))
        .drop("__cur_from")
    )
    # open row acts as the run-seed so unchanged updates collapse
    # against the CURRENT state, not just within the batch
    chain = open_rows.unionByName(fresh)
    prev = F.lag(snap).over(w)
    changed = chain.withColumn(
        "new_run", F.when(prev.isNull() | (prev != snap), 1).otherwise(0)
    ).where(F.col("new_run") == 1)
    versions = changed.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(
            Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
        ).alias("valid_to"),
    )
    touched = updates.select(*key_cols).distinct()
    untouched_hist = history.join(touched, key_cols, "left_anti")
    closed_hist = history.where(F.col("valid_to").isNotNull()).join(
        touched, key_cols, "left_semi"
    )
    return untouched_hist.unionByName(closed_hist).unionByName(versions)


def snapshot_delta(old: DataFrame, new: DataFrame, key_col: str = "doc_id",
                   content_cols: tuple[str, ...] = ("text",)) -> DataFrame:
    """Row-level diff between two corpus versions (the audit a
    pipeline publishes before promoting a new crawl/dump snapshot):
    (key, change) with change in added / deleted / updated / unchanged,
    compared by md5 over the content columns - so the diff costs one
    key-equi full-outer join of (key, hash) projections, never a
    content-column shuffle. At 100 TB both sides hash map-side to
    16-byte digests before the join; with both snapshots bucketed on
    the key the join is shuffle-free."""
    def hashed(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(key_col),
            F.md5(F.concat_ws("", *content_cols)).alias(alias),
        )

    o = hashed(old, "h_old")
    n = hashed(new, "h_new")
    return (
        o.join(n, key_col, "full_outer")
        .select(
            key_col,
            F.when(F.col("h_old").isNull(), F.lit("added"))
            .when(F.col("h_new").isNull(), F.lit("deleted"))
            .when(F.col("h_old") != F.col("h_new"), F.lit("updated"))
            .otherwise(F.lit("unchanged"))
            .alias("change"),
        )
    )


def term_drift(old: DataFrame, new: DataFrame, min_total: int = 5) -> DataFrame:
    """Vocabulary drift between two corpus versions — the text analog
    of profile_drift: per term, counts and per-million rates in each
    snapshot plus the Laplace-smoothed log rate ratio (positive =
    growing). Terms with combined count < ``min_total`` are dropped
    (noise floor). Output (term, c_old, c_new, rate_old, rate_new,
    log_ratio).

    Shape: one tf aggregate per snapshot (map-side combined), a
    term-keyed full-outer join of the two count tables (vocab-sized,
    far below corpus), and 1-row totals broadcast via crossJoin."""
    from sift_spark.models.text import with_tokens

    def tf(docs: DataFrame, alias: str) -> DataFrame:
        return (
            with_tokens(docs)
            .select(F.explode("toks").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    o, n = tf(old, "c_old"), tf(new, "c_new")
    tot = (
        o.agg(F.sum("c_old").alias("t_old"))
        .crossJoin(n.agg(F.sum("c_new").alias("t_new")))
    )
    return (
        o.join(n, "term", "full_outer")
        .select(
            "term",
            F.coalesce("c_old", F.lit(0)).alias("c_old"),
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
        )
        .where(F.col("c_old") + F.col("c_new") >= min_total)
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            "c_old",
            "c_new",
            F.round(F.col("c_old") * 1e6 / F.col("t_old"), 6).alias("rate_old"),
            F.round(F.col("c_new") * 1e6 / F.col("t_new"), 6).alias("rate_new"),
            F.round(
                F.log((F.col("c_new") + 1) / (F.col("t_new") + 1))
                - F.log((F.col("c_old") + 1) / (F.col("t_old") + 1)),
                6,
            ).alias("log_ratio"),
        )
    )
