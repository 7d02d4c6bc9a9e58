"""Local replica of the driver's oracle-parity gate.

Runs a Spark query and its DuckDB oracle on the same sf dir and
compares row count, sorted column names, and an order-insensitive
value hash.

The driver's canonicalizer is pandas-based and TYPE-SENSITIVE: both
results are pulled into pandas, so a DuckDB HUGEINT column (pandas
float64 — ``6.0``) hashes differently from a Spark bigint (int64 —
``6``).  Round-3 learned this the hard way: the old local ``_canon``
collapsed integral floats to ints, silently passing five oracles the
driver hash-failed.  This version goes through pandas on both sides
and keeps the int/float distinction (``repr(round(v, 6))`` → ``6.0``
stays ``6.0``), so local green implies driver green.
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import numpy as np

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
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "∅"  # pandas renders missing ints/floats as NaN on both sides
        r = round(f, 6)
        if r == 0.0:
            r = 0.0  # fold -0.0
        return repr(r)  # '6.0' stays distinct from int '6'
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            # a Decimal column is already a driver-parity hazard; keep it
            # distinguishable from float so the local gate catches it
            return "dec:" + str(v.normalize())
    except ImportError:
        pass
    if v != v:  # NaT and other pandas-missing sentinels
        return "∅"
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def _pandas_rows(pdf):
    # itertuples keeps numpy scalar types (dtype-faithful), unlike .values
    # which upcasts the whole frame to object/float
    return [tuple(t) for t in pdf.itertuples(index=False, name=None)]


def compare(spark_df, con, sql: str) -> dict:
    s_pdf = spark_df.toPandas()
    d_pdf = con.sql(sql).fetchdf()
    s_cols = list(s_pdf.columns)
    d_cols = list(d_pdf.columns)
    return {
        "rows_spark": len(s_pdf),
        "rows_duck": len(d_pdf),
        "cols_spark": sorted(s_cols),
        "cols_duck": sorted(d_cols),
        "hash_spark": value_hash(_pandas_rows(s_pdf), s_cols),
        "hash_duck": value_hash(_pandas_rows(d_pdf), d_cols),
    }


def assert_parity(spark_df, con, sql: str, name: str = "?"):
    r = compare(spark_df, con, sql)
    assert r["rows_spark"] == r["rows_duck"], f"{name}: rowcount {r['rows_spark']} != {r['rows_duck']}"
    assert r["cols_spark"] == r["cols_duck"], f"{name}: cols {r['cols_spark']} != {r['cols_duck']}"
    assert r["hash_spark"] == r["hash_duck"], f"{name}: value hash mismatch"
