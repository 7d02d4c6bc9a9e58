"""Local replica of the driver's oracle-parity gate.

Runs a Spark query and its DuckDB oracle on the same sf dir and
compares row count, sorted column names, and an order-insensitive
value hash (values canonicalized: floats rounded to 6dp, NaN/None
normalized, rows sorted).
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        if r == int(r):
            return str(int(r))
        return f"{r:.6f}".rstrip("0")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return _canon(float(v))
    except ImportError:
        pass
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def compare(spark_df, con, sql: str) -> dict:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    return {
        "rows_spark": len(s_rows),
        "rows_duck": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duck": sorted(d_cols),
        "hash_spark": value_hash([tuple(r) for r in s_rows], s_cols),
        "hash_duck": value_hash(d_rows, d_cols),
    }


def assert_parity(spark_df, con, sql: str, name: str = "?"):
    r = compare(spark_df, con, sql)
    assert r["rows_spark"] == r["rows_duck"], f"{name}: rowcount {r['rows_spark']} != {r['rows_duck']}"
    assert r["cols_spark"] == r["cols_duck"], f"{name}: cols {r['cols_spark']} != {r['cols_duck']}"
    assert r["hash_spark"] == r["hash_duck"], f"{name}: value hash mismatch"
