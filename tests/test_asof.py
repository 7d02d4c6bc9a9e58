"""As-of join semantics on hand-built frames."""

from __future__ import annotations

from pyspark.sql import Row


def test_asof_backward_with_ties_and_misses(spark):
    from sift_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            Row(k="a", lid=1, lt=5),
            Row(k="a", lid=2, lt=10),   # tie with right ts=10
            Row(k="a", lid=3, lt=3),    # before any right row -> null
            Row(k="b", lid=4, lt=100),  # partition with no right rows
        ]
    )
    right = spark.createDataFrame(
        [Row(k="a", rt=4, v=40), Row(k="a", rt=10, v=100), Row(k="a", rt=11, v=110)]
    )
    out = {
        r.lid: r.v_asof
        for r in asof_join(left, right, "k", "lt", "rt", ["v"]).collect()
    }
    assert out == {1: 40, 2: 100, 3: None, 4: None}
