"""Scale utilities: layout control (partitioned/bucketed writes) and
skew mitigation (key salting).

These are the knobs a 100 TB deployment turns that a local test never
forces: bucketing pre-shuffles fact tables once at write time so
later joins/aggregations on the bucket key are shuffle-free;
salting splits a pathological hot key across reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Above this many rows, operators with an exact global-window quantile
# path and an approx percentile path auto-select approx (rfm_segments,
# ccnet_buckets). 10M rows is well inside one executor's window budget;
# tests force both sides through the conf. Same size-gated split as
# spark.sift.cc.driverEdgeLimit.
QUANTILE_EXACT_LIMIT_CONF = "spark.sift.quantile.exactRowLimit"
QUANTILE_EXACT_LIMIT = 10_000_000


def quantile_exact_limit(spark) -> int:
    return int(spark.conf.get(QUANTILE_EXACT_LIMIT_CONF, str(QUANTILE_EXACT_LIMIT)))


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      fmt: str = "parquet") -> None:
    """Hive-style partitioned layout — partition pruning makes
    predicate-on-partition-col queries touch only matching dirs."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str | list[str],
                   n_buckets: int = 32,
                   sort_col: str | list[str] | None = None) -> None:
    """Bucketed + sorted table: joins/groupBys on ``bucket_col``
    between co-bucketed tables skip the shuffle entirely.

    Multi-key joins need ALL join keys in the bucket spec (pass a
    list, same order as the join keys): Spark's co-partitioning check
    requires the scan's HashPartitioning to cover every cluster key,
    so a table bucketed on a subset still gets re-shuffled."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *cols)
    if sort_col:
        sort_cols = [sort_col] if isinstance(sort_col, str) else list(sort_col)
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def salted_aggregate(df: DataFrame, key_col: str, aggs: dict[str, tuple[str, str]],
                     n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed keys: aggregate on
    (key, salt) first — spreading a hot key over ``n_salts``
    reducers — then combine the partials per key.

    ``aggs``: output_name → (fn, col) with fn ∈ sum/count/min/max
    (the re-aggregatable functions; decompose avg into sum+count).
    """
    first = {
        "sum": F.sum,
        "count": lambda c: F.count(F.lit(1)),
        "min": F.min,
        "max": F.max,
    }
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key_col, "__salt").agg(
        *[first[fn](col).alias(name) for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(key_col).agg(
        *[recombine[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          shuffle_col: str = "doc_id", seed: int = 42,
                          max_records_per_file: int | None = None) -> None:
    """Deterministic global shuffle + shard export for training data.

    Rows are assigned a pseudorandom-but-deterministic order key
    (xxhash64 of ``shuffle_col`` + seed) and bucketed into
    ``n_shards`` EXPLICIT equal-width ranges of the hash space
    (shard = high bits of the order key — xxhash64 is uniform, so
    shards balance without sampling), then sorted within each shard —
    a stable global shuffle of the corpus: same rows + seed →
    identical shard CONTENTS on any cluster size or input layout.

    Why explicit buckets and not ``repartitionByRange(__ord)`` (r11):
    range partitioning picks its boundaries from a SAMPLE of the
    input, and the sample depends on the upstream partition layout —
    the composed-pipeline manifest gate caught two runs of the same
    row set splitting files differently (persisted vs unpersisted
    upstream); and range-partitioning the BUCKET value is no better
    (few discrete values make the cumulative-weight walk merge
    adjacent buckets — observed 3 files for n_shards=4). The only
    sampling-free layout is ``partitionBy``: shards are written as
    ``__shard=K/`` directories, the shuffle is a plain hash
    repartition ON THE SHARD VALUE (each shard lands wholly in one
    task — a pure function of K, no sampling), and each directory
    holds exactly one file with the shard's rows in ``__ord`` order.
    Bucket = leading bits of ``__ord``, so per-shard hash ranges are
    disjoint and increasing with K. Exactly one shuffle; reading the
    export back recovers ``__shard`` as a partition column (training
    loaders get the shard id for free). ``max_records_per_file``
    splits a large shard's directory into bounded files for loader
    parallelism."""
    two63 = F.lit(str(1 << 63)).cast("decimal(38,0)")
    width = F.lit(str(((1 << 64) + n_shards - 1) // n_shards)).cast("decimal(38,0)")
    keyed = df.withColumn(
        "__ord", F.xxhash64(F.col(shuffle_col).cast("string"), F.lit(seed))
    ).withColumn(
        "__shard",
        F.floor((F.col("__ord").cast("decimal(38,0)") + two63) / width).cast("int"),
    )
    w = (
        keyed.repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__ord")
        .drop("__ord")
        .write.mode("overwrite")
        .partitionBy("__shard")
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def salted_join(big: DataFrame, small: DataFrame, key_col: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: the big (skewed) side gets a random salt
    in [0, n_salts); the small side is replicated once per salt value
    (an ``explode(sequence)``, so its shuffle volume grows n_salts×
    — use for genuinely small-but-too-big-to-broadcast sides). The
    join key becomes (key, salt), spreading a hot key's rows over
    ``n_salts`` reducers instead of one straggler.

    AQE's skew-join split handles moderate skew automatically; manual
    salting is for the pathological case (one key ≫ a partition) or
    when AQE is unavailable (e.g. under a required sort).
    """
    if how.replace("_", "") not in {"inner", "left", "leftouter", "leftsemi", "leftanti"}:
        # replicating the small side makes right/full joins emit each
        # unmatched small row n_salts times — not expressible this way
        raise ValueError(f"salted_join supports left-side joins only, got {how!r}")
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [key_col, "__salt"], how).drop("__salt")


def explain_shuffles(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (plan-shape
    telemetry for tests/tuning)."""
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")

def compact_parquet(spark, path: str, target_file_mb: int = 512,
                    sort_col: str | None = None) -> int:
    """Small-files compaction: rewrite a parquet dataset into files of
    ~``target_file_mb`` each; returns the file count written.

    The small-files problem is the classic failure mode of long-lived
    ingest (streaming micro-batches, per-task outputs): thousands of
    KB-sized files turn scans into open/seek storms and blow up the
    driver's file index. Compaction = one read + one write sized off
    the dataset's actual on-disk bytes; with ``sort_col`` the rewrite
    range-partitions + sorts, so the new files carry min/max stats
    that let later range predicates skip whole files.

    The rewrite lands in a sibling temp dir and swaps in via two
    renames (same discipline as ``sinks.upsert``). Bare-directory
    renames are NOT a transactional commit: there is a brief window
    during the swap where ``path`` does not exist (a table format's
    manifest commit is the real fix at scale). What this function does
    guarantee: every rename's boolean return is checked, a failed swap
    restores the original directory, and the old copy is only deleted
    after the new ``path`` exists and its footers read back — so no
    failure mode loses the dataset.
    """
    from sift_spark.sinks.upsert import _delete, _exists, _hadoop_fs, _rename

    fs, jpath, _jvm = _hadoop_fs(spark, path)
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, int(total_bytes // (target_file_mb * 1024 * 1024)) + 1)

    df = spark.read.parquet(path)
    if sort_col is not None:
        out = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
    else:
        out = df.repartition(n_files)

    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    if _exists(spark, tmp):
        _delete(spark, tmp)
    out.write.mode("overwrite").parquet(tmp)
    if _exists(spark, old):
        _delete(spark, old)
    if not _rename(spark, path, old):
        _delete(spark, tmp)
        raise IOError(f"compact aborted: rename {path} -> {old} returned false; dataset untouched")
    if not _rename(spark, tmp, path):
        restored = _rename(spark, old, path)
        raise IOError(
            f"compact aborted: rename {tmp} -> {path} returned false; "
            f"original {'restored' if restored else f'left at {old} (manual restore needed)'}"
        )
    # read the swapped-in dataset back before dropping the only other
    # copy — footer parse catches torn/partial moves
    if not _exists(spark, path):
        raise IOError(f"compact swap lost {path}; original copy preserved at {old}")
    spark.read.parquet(path).schema
    _delete(spark, old)
    return n_files
