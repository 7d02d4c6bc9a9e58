"""As-of (nearest-predecessor) join — an operator Spark lacks natively.

Implemented as the union-sort trick: tag right rows 0 and left rows 1,
sort within each partition key by (ts, tag), and carry the last seen
right value forward with ``last(..., ignorenulls)`` over the combined
stream. One shuffle on the partition key; no range cross-join, no
per-key collect — this is the scalable formulation (the naive
left×right range join is quadratic per key).

DuckDB's native ``ASOF LEFT JOIN`` serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, partition_col: str,
              left_ts: str, right_ts: str, value_cols: list[str],
              suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``partition_col``
    (backward as-of, ties matched). Left rows keep all columns;
    matched value columns get ``suffix``; unmatched → null."""
    lcols = left.columns
    rtypes = dict(right.dtypes)
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(rtypes[v]).alias(f"__v_{v}") for v in value_cols],
    )
    r = right.select(
        F.col(partition_col),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    )
    # align schemas: right side lacks the other left columns
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    r = r.select(*lcols, "__ts", "__tag", *[f"__v_{v}" for v in value_cols])

    u = l.unionByName(r)
    w = (
        Window.partitionBy(partition_col)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for v in value_cols:
        u = u.withColumn(f"{v}{suffix}", F.last(f"__v_{v}", ignorenulls=True).over(w))
    return u.where(F.col("__tag") == 1).select(
        *lcols, *[f"{v}{suffix}" for v in value_cols]
    )
