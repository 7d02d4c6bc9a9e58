"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check at sf0.001.
``queries()`` — name → (spark, sf_dir) → DataFrame, one per operator
from SURVEY.md §2.
``oracle_sql()`` — DuckDB ANSI-SQL twins for the hash-parity gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: tf-idf-weighted entity context profiles
    (wikify → mentions → idf join → L2-normalized weights)."""
    from sift_spark.queries import QUERIES

    return QUERIES["entity_mention_tf"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sift_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sift_spark.oracle import ORACLE

    return dict(ORACLE)
