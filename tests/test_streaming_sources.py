"""Streaming source abstraction: Kafka parse wiring (broker-free)
and the rate-source synthetic stream (real unbounded run)."""

from __future__ import annotations

import json
import time


def test_parse_kafka_events_static(spark):
    """The Kafka value-decode transform is a plain DataFrame op —
    verified on a static frame shaped like Kafka's output schema."""
    from sift_spark.streaming.sources import parse_kafka_events

    msgs = [
        {"event_id": 1, "ts": "2024-01-01T00:00:05", "user_id": 7,
         "event_type": "click", "value": 1.5, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:00:09", "user_id": 8,
         "event_type": "error", "value": 0.25, "props": "{\"k\":1}"},
    ]
    raw = spark.createDataFrame(
        [
            (None, json.dumps(m).encode(), "events", 0, i)
            for i, m in enumerate(msgs)
        ],
        "key binary, value binary, topic string, partition int, offset long",
    )
    out = parse_kafka_events(raw).collect()
    assert [r.event_id for r in out] == [1, 2]
    assert [r.user_id for r in out] == [7, 8]
    assert [r.event_type for r in out] == ["click", "error"]
    assert [r.kafka_offset for r in out] == [0, 1]
    assert all(r.ts_ts == r.ts for r in out)
    # lag computation works off the decoded event time
    assert (out[1].ts - out[0].ts).total_seconds() == 4


def test_kafka_stream_unavailable_raises(spark):
    """Without the connector jar, the production entry point fails
    loudly (never a silent stub)."""
    import pytest

    from sift_spark.streaming.sources import kafka_event_stream

    try:
        df = kafka_event_stream(spark, "localhost:9092", "events")
    except RuntimeError as exc:
        assert "spark-sql-kafka" in str(exc)
    else:  # connector present (real cluster): contract columns exist
        assert "ts_ts" in df.columns


def test_rate_event_stream_runs_unbounded(spark):
    """The rate-backed synthetic stream feeds a real watermarked
    windowed aggregation for a couple of micro-batches."""
    from sift_spark.streaming.events import stream_tumbling_counts
    from sift_spark.streaming.sources import rate_event_stream

    events = rate_event_stream(spark, rows_per_second=200)
    assert {"event_id", "ts", "user_id", "event_type", "value", "props",
            "ts_ts"} <= set(events.columns)
    agg = stream_tumbling_counts(events, minutes=1, watermark="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_rate_smoke")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.table("t_rate_smoke").count()
            if n > 0:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert n > 0, "rate stream produced no windowed output within 30s"
    row = spark.table("t_rate_smoke").collect()[0]
    assert row.n_events > 0 and row.event_type in (
        "click", "view", "purchase", "error", "scroll"
    )


def test_stream_corpus_dedup_equals_batch(spark, tmp_path):
    """Continuous dedup over two micro-batches finds EXACTLY the
    full-corpus LSH pairs: within-batch-1, within-batch-2, and
    across-batch pairs all surface as batches arrive."""
    from pyspark.sql import functions as F

    from sift_spark.operators.dedup import minhash_lsh_pairs
    from sift_spark.streaming.corpus import stream_corpus_dedup
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    src = tmp_path / "incoming"
    src.mkdir()
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(src / "batch_a.parquet")
    )
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(src / "batch_b.parquet")
    )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    q = stream_corpus_dedup(
        stream,
        index_path=str(tmp_path / "index"),
        pairs_path=str(tmp_path / "pairs"),
        threshold=0.2,
    )
    q.awaitTermination()

    got = {
        (min(r.doc1, r.doc2), max(r.doc1, r.doc2)): r.jaccard
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    want = {
        (r.doc1, r.doc2): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.2).collect()
    }
    assert got == want
    assert want, "fixture should contain near-dup pairs"


def test_corpus_dedup_replay_is_idempotent(spark, tmp_path):
    """At-least-once delivery: replaying a batch — both a fully
    committed one and one that crashed after the pairs write but
    before the index writes — must not duplicate pairs log rows or
    index band/shingle rows (duplicated shingles would skew every
    later jaccard verify)."""
    from pyspark.sql import functions as F

    from sift_spark.streaming.corpus import process_corpus_batch
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    b0 = docs.where(F.col("doc_id") % 2 == 0)
    b1 = docs.where(F.col("doc_id") % 2 == 1)
    idx, pairs = str(tmp_path / "index"), str(tmp_path / "pairs")

    def state():
        p = {(r.doc1, r.doc2, r.jaccard) for r in spark.read.parquet(pairs).collect()}
        nb = spark.read.parquet(f"{idx}/bands").count()
        ns = spark.read.parquet(f"{idx}/shingles").count()
        return p, nb, ns

    process_corpus_batch(b0, 0, idx, pairs, threshold=0.2)
    process_corpus_batch(b1, 1, idx, pairs, threshold=0.2)
    want = state()

    # replay of a fully-committed batch: marker short-circuits
    process_corpus_batch(b1, 1, idx, pairs, threshold=0.2)
    assert state() == want

    # replay after a partial crash: simulate by deleting batch 1's
    # commit marker and one of its index writes, then reprocessing
    import shutil

    shutil.rmtree(f"{idx}/_committed/1")
    shutil.rmtree(f"{idx}/shingles/batch_id=1")
    process_corpus_batch(b1, 1, idx, pairs, threshold=0.2)
    assert state() == want


def test_corpus_dedup_corrupt_index_raises(spark, tmp_path):
    """A present-but-unreadable index must raise, not silently degrade
    to 'first batch' and drop every old-vs-new pair."""
    import pytest

    from sift_spark.streaming.corpus import BAND_SCHEMA, _read_index

    bad = tmp_path / "bands" / "batch_id=0"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        _read_index(spark, str(tmp_path / "bands"), BAND_SCHEMA, 99).collect()


def test_parse_text_events_static_and_malformed(spark):
    """The socket/text line-parse contract: JSON lines decode to event
    rows, malformed lines are dropped (not nulled through), and the
    parsed frame feeds the same downstream operators as Kafka's."""
    from sift_spark.streaming.sources import parse_text_events

    msgs = [
        json.dumps({"event_id": 1, "ts": "2024-01-01T00:00:05", "user_id": 7,
                    "event_type": "click", "value": 1.5, "props": "{}"}),
        "not json at all {{{",
        json.dumps({"event_id": 2, "ts": "2024-01-01T00:00:09", "user_id": 8,
                    "event_type": "view", "value": 0.25, "props": "{}"}),
    ]
    raw = spark.createDataFrame([(m,) for m in msgs], "value string")
    out = parse_text_events(raw).collect()
    assert [r.event_id for r in out] == [1, 2]
    assert [r.event_type for r in out] == ["click", "view"]
    assert all(r.ts_ts == r.ts for r in out)


def test_socket_stream_parse_contract_via_text_source(spark, tmp_path):
    """The socket source itself needs a live listener; the identical
    parse contract is exercised through the replayable text file
    source (one JSON line per event) with an availableNow drain."""
    import json as _json

    from sift_spark.streaming.events import run_available_now
    from sift_spark.streaming.sources import parse_text_events

    d = tmp_path / "lines"
    d.mkdir()
    (d / "events.jsonl").write_text(
        "\n".join(
            _json.dumps(
                {"event_id": i, "ts": f"2024-01-01T00:00:{i:02d}", "user_id": i % 3,
                 "event_type": "click", "value": float(i), "props": "{}"}
            )
            for i in range(10)
        )
    )
    stream = parse_text_events(spark.readStream.text(str(d)))
    out = run_available_now(
        stream.groupBy("user_id").count(), "t_text_src", output_mode="complete"
    )
    got = {r.user_id: r["count"] for r in out.collect()}
    assert got == {0: 4, 1: 3, 2: 3}


def test_stream_classifier_route_equals_batch_scoring(spark, tmp_path):
    """Train offline, serve on the stream: routed accept/reject sets
    over two micro-batches equal the batch classifier's split of each
    half (scores are batch-relative only through the label column,
    which routing ignores)."""
    from pyspark.sql import functions as F

    from sift_spark.operators.classify import classifier_scores, logreg_train
    from sift_spark.streaming.corpus import stream_classifier_route
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    w = logreg_train(docs)

    src = tmp_path / "incoming"
    src.mkdir()
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)
    half_a.coalesce(1).write.parquet(str(src / "batch_a.parquet"))
    half_b.coalesce(1).write.parquet(str(src / "batch_b.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    q = stream_classifier_route(
        stream, w, str(tmp_path / "accept"), str(tmp_path / "reject")
    )
    q.awaitTermination()

    accept = {r.doc_id for r in spark.read.parquet(str(tmp_path / "accept")).collect()}
    reject = {r.doc_id for r in spark.read.parquet(str(tmp_path / "reject")).collect()}
    assert accept | reject == {r.doc_id for r in docs.collect()}
    assert accept.isdisjoint(reject)
    want_accept = set()
    for half in (half_a, half_b):
        want_accept |= {
            r.doc_id
            for r in classifier_scores(half, w).collect()
            if r.p >= 0.5
        }
    assert accept == want_accept
    assert accept and reject, "both routes should be exercised"


def test_stream_decayed_counts_equals_batch(spark, tmp_path):
    """The incrementally-maintained half-life counter, decayed
    forward from each key's last event to the corpus max timestamp,
    equals the batch decayed_counts values."""
    from pyspark.sql import functions as F

    from sift_spark.operators.events import decayed_counts
    from sift_spark.streaming.events import stream_decayed_counts
    from tests.conftest import SF_SMOKE

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    cut = ev.agg(F.expr("percentile(unix_timestamp(ts), 0.5)")).collect()[0][0]
    src = tmp_path / "in"
    src.mkdir()
    # time-split files so per-key event order holds across batches
    ev.where(F.unix_timestamp("ts") <= cut).coalesce(1).write.parquet(
        str(src / "a.parquet")
    )
    ev.where(F.unix_timestamp("ts") > cut).coalesce(1).write.parquet(
        str(src / "b.parquet")
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
        .withColumn("ts_ts", F.col("ts"))  # the streaming-surface contract column
    )
    out = tmp_path / "out"
    q = (
        stream_decayed_counts(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got_rows = spark.read.parquet(str(out)).collect()
    # keep each key's LAST emission (largest n_events)
    last = {}
    for r in got_rows:
        k = (r.user_id, r.event_type)
        if k not in last or r.n_events > last[k].n_events:
            last[k] = r
    T = ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    half = 24 * 3600.0
    want = {
        (r.user_id, r.event_type): (r.n_events, r.decayed_count)
        for r in decayed_counts(ev).collect()
    }
    assert set(last) == set(want)
    for k, r in last.items():
        n_b, dec_b = want[k]
        assert r.n_events == n_b, k
        forward = r.decayed_at_last * 0.5 ** ((T - r.last_t) / half)
        assert abs(forward - dec_b) < 1e-4, (k, forward, dec_b)


def test_stream_decayed_counts_on_rate_source(spark):
    """stream_decayed_counts keys on the streaming-surface ts_ts
    contract column, so it runs unbounded on rate_event_stream like
    every sibling stateful operator (regression: it used to reference
    the batch-only ts column and threw unresolved-column here)."""
    from sift_spark.streaming.events import stream_decayed_counts
    from sift_spark.streaming.sources import rate_event_stream

    events = rate_event_stream(spark, rows_per_second=200)
    q = (
        stream_decayed_counts(events)
        .writeStream.format("memory")
        .queryName("t_rate_decayed")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.table("t_rate_decayed").count()
            if n > 0:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert n > 0, "rate-fed decayed counter produced no output within 30s"
    row = spark.table("t_rate_decayed").collect()[0]
    assert row.n_events >= 1 and row.decayed_at_last >= 1.0


def test_expire_from_index_forgets_document(spark, tmp_path):
    """After expiring a doc, the standing index holds no trace of it
    and a later batch can no longer pair against it; untouched docs
    still pair."""
    from pyspark.sql import functions as F

    from sift_spark.streaming.corpus import (
        expire_from_index,
        process_corpus_batch,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    index = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    first = docs.where(F.col("doc_id") % 2 == 0)
    process_corpus_batch(first, 0, index, pairs, threshold=0.2)

    # pick a doc that pairs across batches: find any odd-batch pair first
    second = docs.where(F.col("doc_id") % 2 == 1)
    process_corpus_batch(second, 1, index, pairs, threshold=0.2)
    all_pairs = spark.read.parquet(pairs)
    cross = all_pairs.collect()
    assert cross, "fixture should produce pairs"
    victim = int(cross[0]["doc1"])

    removed = expire_from_index(spark, index, pairs, [victim])
    assert removed["bands"] > 0 and removed["shingles"] > 0 and removed["pairs"] > 0

    for sub in ("bands", "shingles"):
        left = spark.read.parquet(f"{index}/{sub}")
        assert left.where(F.col("doc_id") == victim).count() == 0
        assert left.count() > 0  # other docs survive
    left_pairs = spark.read.parquet(pairs)
    assert left_pairs.where(
        (F.col("doc1") == victim) | (F.col("doc2") == victim)
    ).count() == 0

    # a replayed future batch can no longer pair against the victim
    process_corpus_batch(second, 2, index, pairs, threshold=0.2)
    again = spark.read.parquet(pairs)
    assert again.where(
        (F.col("doc1") == victim) | (F.col("doc2") == victim)
    ).count() == 0
