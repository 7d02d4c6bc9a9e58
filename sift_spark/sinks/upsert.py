"""Delta-style MERGE (upsert) sink on plain parquet directories.

The reference dumps models to key-value sinks wholesale (reference
format.py / cli dump paths); at 100 TB you instead merge a daily
delta into the standing table. Real deployments use a table format
(Delta/Iceberg) whose commit protocol makes this atomic; this module
implements the same MERGE-by-key semantics on bare parquet with the
two scalable strategies:

- **partitioned**: only partitions containing updated keys are
  rewritten (Spark's dynamic partition-overwrite). The affected old
  rows are first snapshotted to a staging dir so the merge job never
  reads the directory it is overwriting; untouched partitions are
  never rewritten or even read. Cost is O(delta ∪ affected
  partitions), not O(table).
- **unpartitioned**: full merge written to a staging dir, then moved
  into place with a Hadoop-FileSystem rename (works on local/HDFS;
  on object stores rename is a copy — use the partitioned form
  there).

Merge semantics match :func:`sift_spark.operators.incremental.
upsert_latest`: per key, the row with the highest version wins,
updates winning version ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sift_spark.operators.incremental import upsert_latest


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def _exists(spark: SparkSession, path: str) -> bool:
    fs, jpath, _ = _hadoop_fs(spark, path)
    return fs.exists(jpath)


def _delete(spark: SparkSession, path: str) -> None:
    fs, jpath, _ = _hadoop_fs(spark, path)
    fs.delete(jpath, True)


def _rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Hadoop FileSystem.rename signals failure via its boolean return
    (NOT an exception) — callers must check it or risk deleting the
    only surviving copy after a silent no-op."""
    fs, jdst, jvm = _hadoop_fs(spark, dst)
    return bool(fs.rename(jvm.org.apache.hadoop.fs.Path(src), jdst))


def upsert_parquet(updates: DataFrame, path: str, key_cols: list[str],
                   version_col: str, partition_cols: list[str] | None = None) -> None:
    """MERGE ``updates`` into the parquet table at ``path`` by key.

    First write (no table yet) just writes ``updates``. Partition
    columns, when given, must be stable per key — a key never moves
    between partitions — which is what makes partition-pruned merge
    correct.
    """
    spark = updates.sparkSession
    if not _exists(spark, path):
        w = updates.write
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(path)
        return
    if partition_cols:
        _upsert_partitioned(spark, updates, path, key_cols, version_col, partition_cols)
    else:
        _upsert_swap(spark, updates, path, key_cols, version_col)


def _upsert_partitioned(spark: SparkSession, updates: DataFrame, path: str,
                        key_cols: list[str], version_col: str,
                        partition_cols: list[str]) -> None:
    # the distinct partition tuples in the delta are few by
    # construction (a daily slice touches few partitions) — collect
    # them and prune the old-side scan to exactly those directories
    parts = updates.select(*partition_cols).distinct().collect()
    pred = F.lit(False)
    for row in parts:
        clause = F.lit(True)
        for c in partition_cols:
            clause = clause & (F.col(c) == F.lit(row[c]))
        pred = pred | clause
    staging = path.rstrip("/") + "__upsert_staging"
    _delete(spark, staging)
    # snapshot the affected old rows: the overwrite job must not read
    # the directory it rewrites (Spark rejects that plan outright)
    spark.read.parquet(path).where(pred).write.parquet(staging)
    try:
        merged = upsert_latest(spark.read.parquet(staging), updates, key_cols, version_col)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        _delete(spark, staging)


def _upsert_swap(spark: SparkSession, updates: DataFrame, path: str,
                 key_cols: list[str], version_col: str) -> None:
    staging = path.rstrip("/") + "__upsert_staging"
    _delete(spark, staging)
    upsert_latest(spark.read.parquet(path), updates, key_cols, version_col).write.parquet(staging)
    _delete(spark, path)
    if not _rename(spark, staging, path):
        raise IOError(
            f"upsert swap failed: rename {staging} -> {path} returned false; "
            f"merged data is intact at {staging}"
        )
