"""Round-8-continuation units: analyzed-relation cache + size-aware
shuffle partitions."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def test_table_cache_returns_same_relation(spark, tmp_path):
    from sift_spark.io import table

    df = spark.range(5).select(F.col("id").alias("doc_id"))
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    a = table(spark, str(tmp_path), "documents")
    b = table(spark, str(tmp_path), "documents")
    # same analyzed relation object — no re-listing, no footer re-read
    assert a is b
    assert a.count() == 5


def test_table_cache_invalidates_on_overwrite(spark, tmp_path):
    """A parquet overwrite rewrites the directory (bumping its mtime),
    so the cache must MISS and serve the new data — the stale-relation
    trap the mtime key exists for."""
    from sift_spark.io import table

    p = str(tmp_path / "documents.parquet")
    spark.range(3).select(F.col("id").alias("doc_id")).write.parquet(p)
    first = table(spark, str(tmp_path), "documents")
    assert first.count() == 3
    # ensure a coarse-mtime filesystem still observes a bump
    time.sleep(1.05)
    spark.range(7).select(F.col("id").alias("doc_id")).write.mode(
        "overwrite"
    ).parquet(p)
    second = table(spark, str(tmp_path), "documents")
    assert second is not first
    assert second.count() == 7


def test_shuffle_partitions_for_clamps():
    from sift_spark.session import shuffle_partitions_for

    # the driver testdata at sf0.1 is ~17 MB on disk -> floor of 8
    assert shuffle_partitions_for("/root/testdata/sf0.1", 32) == 8
    # a missing dir falls back to the cpu count, never crashes
    assert shuffle_partitions_for("/nonexistent/sfX", 32) == 32
    # the floor of 8 wins below 8 cores (extra partitions just queue)
    assert shuffle_partitions_for("/root/testdata/sf0.1", 2) == 8


def test_shuffle_partitions_for_scales_with_bytes(tmp_path):
    """~4 MB of on-disk bytes per partition between the clamps."""
    from sift_spark.session import shuffle_partitions_for

    f = tmp_path / "blob.bin"
    f.write_bytes(b"\0" * (48 * 1024 * 1024))  # 48 MB -> 12 partitions
    assert shuffle_partitions_for(str(tmp_path), 32) == 12
    assert shuffle_partitions_for(str(tmp_path), 10) == 10
    os.remove(f)
