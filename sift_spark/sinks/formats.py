"""Output formats (reference parity: sift/format.py).

Each formatter is a DataFrame→DataFrame[value: string] transformation
built from ``to_json``/``concat_ws`` expressions (JVM-side, no Python
serialization loop), written with ``df.write.text`` — the DataFrame
equivalent of the reference's ``saveAsTextFile`` sinks. The Redis
formatter emits RESP protocol lines consumable by ``redis-cli
--pipe`` (reference format.py:51 ``RedisFormat``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_json_lines(df: DataFrame) -> DataFrame:
    """One JSON object per row (reference format.py:41 JsonFormat)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def to_tsv(df: DataFrame) -> DataFrame:
    """Tab-separated values; tabs/newlines in fields are escaped
    (reference format.py:18 TsvFormat, with real field escaping the
    reference TODO'd)."""
    cols = [
        F.regexp_replace(
            F.regexp_replace(F.coalesce(F.col(c).cast("string"), F.lit("")), r"\\", r"\\\\"),
            r"[\t\n\r]",
            " ",
        )
        for c in df.columns
    ]
    return df.select(F.concat_ws("\t", *cols).alias("value"))


def _resp_bulk(col: Column) -> Column:
    return F.concat(F.lit("$"), F.length(col).cast("string"), F.lit("\r\n"), col, F.lit("\r\n"))


def to_redis_proto(df: DataFrame, key_col: str, prefix: str = "") -> DataFrame:
    """RESP SET commands: one ``*3 SET <key> <json-value>`` per row."""
    key = F.concat(F.lit(prefix), F.col(key_col).cast("string"))
    value_cols = [c for c in df.columns if c != key_col]
    value = F.to_json(F.struct(*value_cols))
    return df.select(
        F.concat(
            F.lit("*3\r\n"), _resp_bulk(F.lit("SET")), _resp_bulk(key), _resp_bulk(value)
        ).alias("value")
    )


def write_text(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)
