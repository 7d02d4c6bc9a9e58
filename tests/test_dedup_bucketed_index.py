"""The bucketed standing-index path for incremental near-dup — the
production layout a growing corpus probes daily (round-7 verdict #1):
write_lsh_index persists bands bucketed on sig and shingles bucketed
on doc_id; the batch probe must then read the corpus-sized index
pre-partitioned (shuffle only the batch), and the verify-key
aggregate over the shingle index must be shuffle-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from sift_spark.operators.dedup import (
    lsh_index,
    minhash_band_table,
    minhash_lsh_pairs_incremental,
    read_lsh_index,
    write_lsh_index,
)
from tests.conftest import SF_SMOKE

BANDS_T, SH_T = "t_r7_lsh_bands", "t_r7_lsh_shingles"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _split(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return (
        docs.where(F.col("doc_id") % 5 != 0),
        docs.where(F.col("doc_id") % 5 == 0),
    )


def test_bucketed_index_probe_shuffles_only_the_batch(spark):
    old, new = _split(spark)
    write_lsh_index(old, BANDS_T, SH_T, n_buckets=8)
    try:
        idx_bands, idx_sh = read_lsh_index(spark, BANDS_T, SH_T)

        # the probe join exactly as the incremental operator issues it
        # (merge hint pins SMJ — a broadcast batch is also index-
        # shuffle-free, but that's the small-batch special case)
        nb = minhash_band_table(new)
        probe = nb.alias("l").hint("merge").join(
            idx_bands.alias("r"),
            (F.col("l.band") == F.col("r.band")) & (F.col("l.sig") == F.col("r.sig")),
        )
        plan = _plan(probe)
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        # exactly TWO hash-partitioning exchanges, both on the BATCH
        # side (its signature aggregate on doc_id + its join shuffle
        # to the index's (band, sig) bucketing); the index side reads
        # pre-partitioned with no Exchange. An unbucketed index shows
        # a third exchange (measured while writing this test: a
        # sig-only bucket spec also re-shuffles — co-partitioning
        # needs ALL join keys covered).
        assert plan.count("Exchange hashpartitioning") == 2, plan
        idx_scan = [ln for ln in plan.splitlines() if BANDS_T in ln and "FileScan" in ln]
        assert idx_scan, plan
        assert "SelectedBucketsCount" in idx_scan[0] or "Bucketed: true" in plan

        # the verify-key aggregate over the shingle index is
        # shuffle-free for the same reason (bucketed on doc_id)
        sizes = idx_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        sp = _plan(sizes)
        assert "Exchange hashpartitioning" not in sp, sp
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {BANDS_T}")
        spark.sql(f"DROP TABLE IF EXISTS {SH_T}")


def test_bucketed_index_pairs_match_in_memory_index(spark):
    old, new = _split(spark)
    write_lsh_index(old, BANDS_T, SH_T, n_buckets=8)
    try:
        idx_bands, idx_sh = read_lsh_index(spark, BANDS_T, SH_T)
        got = sorted(
            (r["doc1"], r["doc2"], r["jaccard"])
            for r in minhash_lsh_pairs_incremental(
                new, idx_bands, idx_sh, threshold=0.8
            ).collect()
        )
        mem_bands, mem_sh = lsh_index(old)
        exp = sorted(
            (r["doc1"], r["doc2"], r["jaccard"])
            for r in minhash_lsh_pairs_incremental(
                new, mem_bands, mem_sh, threshold=0.8
            ).collect()
        )
        assert got == exp and len(got) > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {BANDS_T}")
        spark.sql(f"DROP TABLE IF EXISTS {SH_T}")
