"""Result-type audit for every DuckDB oracle.

Round 2 ran a one-off HUGEINT audit and discarded it; round 3
reintroduced five un-CAST ``sum()`` oracles (HUGEINT results) that
hash-failed the driver's type-sensitive gate while the local parity
suite stayed green.  This test makes the audit un-regressable: every
ORACLE entry is planned against the sf0.001 views and its result
column types must come from a pandas-safe whitelist.

HUGEINT (int128) is the canonical hazard — pandas converts it to
float64, so ``6`` hashes as ``6.0`` while the Spark bigint twin
hashes as ``6``.  DECIMAL is equally unsafe (object Decimal vs
float64).  Every aggregate that can widen must be CAST at the oracle
boundary (``CAST(sum(...) AS BIGINT)`` / ``round(..., 6)``).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.parity import duck_con

# types whose pandas conversion is bit-identical to the Spark twin's.
# DATE is deliberately EXCLUDED: DuckDB DATE renders via pandas as
# Timestamp('YYYY-MM-DD 00:00:00') while Spark toPandas yields
# datetime.date('YYYY-MM-DD') — _canon's str() fallback would
# hash-mismatch. Oracles must strftime DATE results to VARCHAR.
# TIMESTAMP stays: the parquet inputs store temporal columns as
# timestamp[us], so both engines hand pandas the same Timestamp.
SAFE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UTINYINT", "USMALLINT",
        "UINTEGER", "VARCHAR", "DOUBLE", "FLOAT", "BOOLEAN",
        "TIMESTAMP", "TIMESTAMP_NS"}


def _oracle_items():
    from sift_spark.oracle import ORACLE

    return sorted(ORACLE.items())


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_result_types_are_pandas_safe(con, name, sql):
    rel = con.sql(sql)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).split("(")[0] not in SAFE
    ]
    assert not bad, (
        f"{name}: oracle result columns {bad} are not pandas-safe — "
        f"CAST the aggregate (HUGEINT sums → BIGINT, DECIMAL → DOUBLE via round())"
    )
