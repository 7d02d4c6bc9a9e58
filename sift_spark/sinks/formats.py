"""Output formats (reference parity: sift/format.py).

Each formatter is a DataFrame→DataFrame[value: string] transformation
built from ``to_json``/``concat_ws`` expressions (JVM-side, no Python
serialization loop), written with ``df.write.text`` — the DataFrame
equivalent of the reference's ``saveAsTextFile`` sinks. The Redis
formatter emits RESP protocol lines consumable by ``redis-cli
--pipe`` (reference format.py:51 ``RedisFormat``).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves postponed hints in module globals
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
    # RESP $N is the BYTE length of the UTF-8 payload, not the character
    # count (reference format.py:74-77 encodes to utf-8 before len());
    # octet_length keeps non-ASCII keys/values (wiki entity names)
    # parseable by `redis-cli --pipe`.
    return F.concat(
        F.lit("$"), F.octet_length(col).cast("string"), F.lit("\r\n"), col, F.lit("\r\n")
    )


def _b64_value_udf(
    serializer: str,
    value_cols: list[str],
    field: str | None,
    integral_cols: tuple[str, ...] = (),
):
    """Arrow-batched serializer for the binary value modes (reference
    format.py:60-63): msgpack/pickle payloads are base64'd so the RESP
    stream stays a text line, exactly as the reference does."""
    import base64
    import pickle

    if serializer == "msgpack":
        try:
            import msgpack
        except ImportError as e:  # pragma: no cover - availability gate
            raise ImportError(
                "the msgpack serializer requires the msgpack package"
            ) from e
        pack = msgpack.packb
    else:
        pack = lambda o: pickle.dumps(o, -1)  # noqa: E731

    def _native(v):
        # NULLs serialize as the reference does: str(None) → "None" in
        # field mode, dict value None in object mode (format.py:60-66).
        # pd.NA appears once integral columns are restored to Int64.
        if v is None or v is pd.NA or (isinstance(v, float) and v != v):
            return None
        return v.item() if hasattr(v, "item") else v

    @F.pandas_udf("string")
    def ser(rows: pd.DataFrame) -> pd.Series:
        # pandas widens a nullable integral column to float64 when the
        # Arrow batch contains any NULL, so sibling non-null values
        # would stringify as "3.0" where the reference's
        # str(item[field]) sees an int. Restore pandas' nullable Int64
        # dtype (3.0 → 3, NaN → pd.NA) before serializing.
        for c in integral_cols:
            if c in rows.columns and rows[c].dtype.kind == "f":
                rows[c] = rows[c].astype("Int64")
        if field:
            objs = (str(_native(v)) for v in rows[field])
        else:
            objs = (
                {k: _native(v) for k, v in zip(value_cols, t)}
                for t in rows.itertuples(index=False, name=None)
            )
        return pd.Series(
            [base64.b64encode(pack(o)).decode("ascii") for o in objs]
        )

    return ser


def to_redis_proto(
    df: DataFrame,
    key_col: str,
    prefix: str = "",
    serializer: str = "json",
    field: str | None = None,
) -> DataFrame:
    """RESP SET commands: one ``*3 SET <key> <value>`` per row
    (reference format.py:51 ``RedisFormat``).

    ``serializer`` ∈ {json, msgpack, pickle, raw} and ``field`` mirror
    the reference's option matrix (format.py:53-71): with ``field``
    the value is that single column stringified then serialized; raw
    requires ``field``; msgpack/pickle payloads are base64'd. Keys are
    ``prefix + key`` with ``"`` escaped (format.py:76). json without
    ``field`` stays fully JVM-side (``to_json``); the binary modes use
    one Arrow-batched pandas UDF.
    """
    if serializer not in ("json", "msgpack", "pickle", "raw"):
        raise ValueError(f"unknown serializer {serializer!r}")
    if serializer == "raw" and not field:
        raise ValueError("Target field required for raw serializer")
    key = F.concat(
        F.lit(prefix),
        F.regexp_replace(
            F.coalesce(F.col(key_col).cast("string"), F.lit("None")), '"', '\\\\"'
        ),
    )
    value_cols = [c for c in df.columns if c != key_col]
    if serializer == "raw":
        # reference to_value is str(item[field]) — a NULL field becomes
        # the string "None", never a NULL RESP row (format.py:66)
        value = F.coalesce(F.col(field).cast("string"), F.lit("None"))
    elif serializer == "json":
        if field:
            # json-encode the bare stringified field (reference
            # to_value: unicode(item[field]) then json.dumps) — wrap
            # the JVM-escaped struct encoding to stay JVM-side; NULL
            # stringifies to "None" first, as str() would
            value = F.regexp_extract(
                F.to_json(
                    F.struct(
                        F.coalesce(F.col(field).cast("string"), F.lit("None")).alias("f")
                    )
                ),
                r'^\{"f":(.*)\}$',
                1,
            )
        else:
            # keep NULL fields as JSON null (reference json.dumps keeps
            # them; Spark's to_json drops them by default)
            value = F.to_json(
                F.struct(*value_cols), {"ignoreNullFields": "false"}
            )
    else:
        from pyspark.sql import types as T

        sel = value_cols if field is None else [field]
        integral = tuple(
            c
            for c in sel
            if isinstance(
                df.schema[c].dataType,
                (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
            )
        )
        value = _b64_value_udf(serializer, value_cols, field, integral)(
            F.struct(*sel)
        )
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
