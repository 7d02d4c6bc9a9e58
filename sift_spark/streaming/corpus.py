"""Continuous corpus ingestion: streaming near-dup detection against
a standing LSH index.

The production shape for a crawler/ingest pipeline: documents arrive
as a stream; each micro-batch is compared against the ACCUMULATED
corpus index (band + shingle tables, parquet on shared storage) via
the batch-vs-index join of
:func:`sift_spark.operators.dedup.minhash_lsh_pairs_incremental`, its
near-dup pairs are appended to a pairs log, and the batch's own
bands/shingles are appended to the index — so every batch's work
scales with the batch (plus index-probe), never with corpus history.
``foreachBatch`` makes the inner logic a plain batch plan; the same
code runs over a file source here and a Kafka source in production.

At 100 TB the index tables are written bucketed on their join keys
((band, sig) / doc_id) so the probe join is shuffle-free; the pairs
log is append-only and compacted on a schedule
(``operators.scale.compact_parquet``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BAND_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("sig", T.StringType()),
    ]
)
SHINGLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shingle", T.StringType()),
    ]
)


def _read_or_empty(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    try:
        return spark.read.schema(schema).parquet(path)
    except Exception:  # first batch: index does not exist yet
        return spark.createDataFrame([], schema)


def stream_corpus_dedup(docs_stream: DataFrame, index_path: str,
                        pairs_path: str, n: int = 3,
                        threshold: float = 0.8, query_name: str = "corpus_dedup"):
    """Start the continuous-dedup query (returns the StreamingQuery).

    Per micro-batch: probe the standing index (old↔new pairs), check
    the batch against itself (new↔new), append verified pairs to
    ``pairs_path``, append the batch's bands+shingles to the index.
    An empty index (first batch) degrades to within-batch dedup —
    the same code path with empty probe frames.
    """
    from sift_spark.operators.dedup import (
        minhash_band_table,
        minhash_lsh_pairs_incremental,
        shingles,
    )

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        bands = _read_or_empty(spark, f"{index_path}/bands", BAND_SCHEMA)
        sh = _read_or_empty(spark, f"{index_path}/shingles", SHINGLE_SCHEMA)
        pairs = minhash_lsh_pairs_incremental(
            batch_df, bands, sh, n=n, threshold=threshold
        )
        pairs.write.mode("append").parquet(pairs_path)
        minhash_band_table(batch_df, n).write.mode("append").parquet(
            f"{index_path}/bands"
        )
        shingles(batch_df, n).select("doc_id", "shingle").write.mode("append").parquet(
            f"{index_path}/shingles"
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
