"""Mechanical scale-hygiene sweep over EVERY registered query's
physical plan: no cartesian products and no row-at-a-time Python
evaluation anywhere, except an explicit, justified allowlist. The
targeted plan shapes (broadcasts, TakeOrdered, cogroups, pushdown)
are asserted per-operator in test_plans.py; this sweep exists so a
NEW query can't silently reintroduce a scale killer."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

# crossJoin(broadcast(1-row aggregate)) is the documented idiom for
# riding scalar totals into a plan without a driver action; Spark
# plans it as BroadcastNestedLoopJoin. price_band_join's inequality
# join is a deliberate BNLJ (plan-asserted in test_plans.py).
BNLJ_OK = {
    "price_band_join",
    # the block-tiled all-pairs GEMM (similarity._tile_sims) REPLICATES
    # each row-block across n_blocks tiles by construction — the
    # standard distributed brute-force layout; bounded O(N·n_blocks),
    # documented in the operator, and the exact baseline the bucketed
    # ANN variants are recall-tested against.
    "ann_topk_bruteforce",
    "knn_label_propagation",
    "dedup_embedding",
    "similar_docs",
    # same block-replication layout, with the different-label filter
    # and per-tile top-k inside the GEMM kernel
    "hard_negatives",
    # composes ann_topk_bruteforce's tiled-GEMM edge table
    "label_spread",
    # SRP doc vectors through the same tiled all-pairs kernel
    "doc_embedding_dup_pairs",
}

# ArrowEvalPython = vectorized pandas_udf (the sanctioned Python
# path); BatchEvalPython = row-at-a-time UDF (banned everywhere).
ROW_PYTHON_OK: set[str] = set()


def _names():
    from sift_spark.queries import QUERIES

    return list(QUERIES)


@pytest.mark.parametrize("name", _names())
def test_no_scale_killers_in_plan(spark, name):
    from sift_spark.queries import QUERIES

    df = QUERIES[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in ROW_PYTHON_OK:
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in BNLJ_OK and "BroadcastNestedLoopJoin" in plan:
        # every remaining BNLJ must be the 1-row scalar-broadcast
        # idiom: a broadcast side that is an aggregate with no
        # grouping keys (rows=1). Heuristic: the plan must contain a
        # global (keyless) HashAggregate node.
        assert "HashAggregate(keys=[], " in plan, (
            f"{name}: BroadcastNestedLoopJoin without a 1-row "
            "scalar-aggregate side — likely an accidental cross join"
        )


@pytest.mark.parametrize("name", _names())
def test_output_schema_is_driver_canonicalizable(spark, name):
    """The driver's pandas canonicalizer crashes on array/map/struct
    output columns (r3: embedding_pca ERR'd even the rows check).
    Every registered query must emit only atomic columns — serialize
    vectors to CSV strings at the query boundary (pattern:
    embedding_int8.codes)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from sift_spark.queries import QUERIES

    df = QUERIES[name](spark, SF_SMOKE)
    bad = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name}: non-atomic output columns {bad}"
