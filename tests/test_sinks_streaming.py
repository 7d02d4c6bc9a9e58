"""Sinks (json/tsv/redis-proto), streaming twins, embeddings,
multimodal plumbing."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_json_lines_sink(spark):
    from sift_spark.sinks.formats import to_json_lines

    df = spark.createDataFrame([Row(_id="a", count=2)])
    [r] = to_json_lines(df).collect()
    assert json.loads(r.value) == {"_id": "a", "count": 2}


def test_tsv_sink_escapes(spark):
    from sift_spark.sinks.formats import to_tsv

    df = spark.createDataFrame([Row(a="x\ty", b=1), Row(a=None, b=2)])
    vals = sorted(r.value for r in to_tsv(df).collect())
    assert vals == ["\t2", "x y\t1"]


def test_redis_proto_sink(spark):
    from sift_spark.sinks.formats import to_redis_proto

    df = spark.createDataFrame([Row(_id="k1", count=3)])
    [r] = to_redis_proto(df, key_col="_id", prefix="ec:").collect()
    assert r.value == '*3\r\n$3\r\nSET\r\n$5\r\nec:k1\r\n$11\r\n{"count":3}\r\n'


def _resp_value(line: str) -> str:
    """Extract the value bulk-string payload from a *3 SET RESP line."""
    parts = line.split("\r\n")
    # *3, $3, SET, $klen, key, $vlen, value, ''
    assert parts[0] == "*3" and parts[2] == "SET"
    assert int(parts[5].lstrip("$")) == len(parts[6].encode("utf-8"))
    return parts[6]


def test_redis_proto_pickle_serializer(spark):
    """Binary serializer modes run (reference format.py:60-63) — they
    were unexercised and broke under postponed annotations."""
    import base64
    import pickle

    from sift_spark.sinks.formats import to_redis_proto

    df = spark.createDataFrame([Row(_id="k1", count=3, name="x")])
    [r] = to_redis_proto(df, key_col="_id", serializer="pickle").collect()
    obj = pickle.loads(base64.b64decode(_resp_value(r.value)))
    assert obj == {"count": 3, "name": "x"}
    # field mode: value is str(field) then pickled
    [r] = to_redis_proto(
        df, key_col="_id", serializer="pickle", field="count"
    ).collect()
    assert pickle.loads(base64.b64decode(_resp_value(r.value))) == "3"


def test_redis_proto_msgpack_serializer(spark):
    from sift_spark.sinks.formats import to_redis_proto

    msgpack = pytest.importorskip("msgpack")
    import base64

    df = spark.createDataFrame([Row(_id="k1", count=3)])
    [r] = to_redis_proto(df, key_col="_id", serializer="msgpack").collect()
    assert msgpack.unpackb(base64.b64decode(_resp_value(r.value))) == {"count": 3}


def test_redis_proto_null_handling(spark):
    """NULL fields match reference str()/json.dumps semantics: raw and
    json+field emit "None"; json object mode keeps JSON null; no mode
    ever emits a NULL RESP row (reference format.py:60-66)."""
    from sift_spark.sinks.formats import to_redis_proto

    df = spark.createDataFrame(
        [Row(_id="k1", count=None, name="x")],
        "_id string, count bigint, name string",
    )
    [r] = to_redis_proto(df, key_col="_id", serializer="raw", field="count").collect()
    assert _resp_value(r.value) == "None"
    [r] = to_redis_proto(df, key_col="_id", serializer="json", field="count").collect()
    assert _resp_value(r.value) == '"None"'
    [r] = to_redis_proto(df, key_col="_id", serializer="json").collect()
    assert json.loads(_resp_value(r.value)) == {"count": None, "name": "x"}
    import base64
    import pickle

    [r] = to_redis_proto(df, key_col="_id", serializer="pickle").collect()
    assert pickle.loads(base64.b64decode(_resp_value(r.value))) == {
        "count": None,
        "name": "x",
    }


def test_redis_proto_mixed_null_int_batch(spark):
    """A nullable int column with SOME nulls in the Arrow batch: pandas
    widens the whole column to float64, which used to serialize the
    sibling non-null rows as str(3.0)='3.0' instead of the reference's
    str(item[field])='3' (format.py:60-66). Both field mode and object
    mode must keep integral values integral."""
    import base64
    import pickle

    from sift_spark.sinks.formats import to_redis_proto

    df = spark.createDataFrame(
        [Row(_id="k1", count=3), Row(_id="k2", count=None)],
        "_id string, count bigint",
    ).coalesce(1)  # one Arrow batch → the dtype contamination case
    rows = {
        r.value.split("\r\n")[4]: pickle.loads(base64.b64decode(_resp_value(r.value)))
        for r in to_redis_proto(
            df, key_col="_id", serializer="pickle", field="count"
        ).collect()
    }
    assert rows == {"k1": "3", "k2": "None"}
    rows = {
        r.value.split("\r\n")[4]: pickle.loads(base64.b64decode(_resp_value(r.value)))
        for r in to_redis_proto(df, key_col="_id", serializer="pickle").collect()
    }
    assert rows == {"k1": {"count": 3}, "k2": {"count": None}}
    # true float columns are untouched: 3.0 stays "3.0"
    fdf = spark.createDataFrame(
        [Row(_id="k1", score=3.0), Row(_id="k2", score=None)],
        "_id string, score double",
    ).coalesce(1)
    rows = {
        r.value.split("\r\n")[4]: pickle.loads(base64.b64decode(_resp_value(r.value)))
        for r in to_redis_proto(
            fdf, key_col="_id", serializer="pickle", field="score"
        ).collect()
    }
    assert rows == {"k1": "3.0", "k2": "None"}


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # file stream sources require a directory, not a single file
    d = tmp_path_factory.mktemp("events_stream")
    (d / "events.parquet").symlink_to(f"{SF_SMOKE}/events.parquet")
    return str(d)


def test_stream_tumbling_matches_batch(spark, events_dir):
    from sift_spark.operators.events import tumbling_counts
    from sift_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        stream_tumbling_counts,
    )

    stream = read_event_stream(spark, events_dir)
    out = run_available_now(stream_tumbling_counts(stream), "t_tumble")
    batch = tumbling_counts(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    got = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in out.collect()}
    want = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in batch.collect()}
    assert got == want


def test_stream_sessionize_closed_sessions_match_batch(spark, events_dir):
    from sift_spark.operators.events import sessionize
    from sift_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        stream_sessionize,
    )

    stream = read_event_stream(spark, events_dir)
    out = run_available_now(stream_sessionize(stream), "t_sess", output_mode="append")
    batch = sessionize(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    got = {(r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events, r.sum_value)
           for r in out.collect()}
    want_all = {(r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events, r.sum_value)
                for r in batch.collect()}
    # streaming emits CLOSED sessions; the last session per user stays
    # open in state. Every emitted session must match its batch twin.
    assert got, "stream should close at least some sessions"
    for k, v in got.items():
        assert want_all[k] == v
    # and the closed set = all batch sessions minus each user's last
    last = {}
    for (u, sid) in want_all:
        last[u] = max(last.get(u, 0), sid)
    want_closed = {k for k in want_all if k[1] != last[k[0]]}
    assert set(got) == want_closed


def test_stream_interval_join_matches_batch(spark, events_dir):
    from sift_spark.operators.relational import clicks_errors_interval
    from sift_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        stream_interval_join,
    )

    stream = read_event_stream(spark, events_dir)
    clicks = stream.where("event_type = 'click'")
    errors = stream.where("event_type = 'error'")
    out = run_available_now(
        stream_interval_join(clicks, errors), "t_ivj", output_mode="append"
    )
    batch = clicks_errors_interval(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    got = {(r.user_id, r.click_id, r.error_id): r.lag_s for r in out.collect()}
    want = {(r.user_id, r.click_id, r.error_id): r.lag_s for r in batch.collect()}
    assert got == want and got


def test_upsert_parquet_unpartitioned(spark, tmp_path):
    from sift_spark.sinks.upsert import upsert_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame([Row(k=1, v="a", ver=1), Row(k=2, v="b", ver=1)])
    upsert_parquet(base, path, ["k"], "ver")
    delta = spark.createDataFrame([Row(k=2, v="b2", ver=2), Row(k=3, v="c", ver=1)])
    upsert_parquet(delta, path, ["k"], "ver")
    got = {r.k: (r.v, r.ver) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 1), 2: ("b2", 2), 3: ("c", 1)}


def test_upsert_parquet_partitioned_rewrites_only_affected(spark, tmp_path):
    import os

    from sift_spark.sinks.upsert import upsert_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [Row(k=1, v="a", ver=1, pt="p0"), Row(k=2, v="b", ver=1, pt="p1")]
    )
    upsert_parquet(base, path, ["k"], "ver", partition_cols=["pt"])
    p0_files = set(os.listdir(f"{path}/pt=p0"))
    delta = spark.createDataFrame([Row(k=2, v="b2", ver=2, pt="p1"), Row(k=4, v="d", ver=1, pt="p1")])
    upsert_parquet(delta, path, ["k"], "ver", partition_cols=["pt"])
    got = {r.k: (r.v, r.ver, r.pt) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 1, "p0"), 2: ("b2", 2, "p1"), 4: ("d", 1, "p1")}
    # untouched partition keeps its exact files (pruned merge, not a rewrite)
    assert set(os.listdir(f"{path}/pt=p0")) == p0_files
    assert not os.path.exists(path + "__upsert_staging")


def test_upsert_parquet_delta_version_wins_ties(spark, tmp_path):
    from sift_spark.sinks.upsert import upsert_parquet

    path = str(tmp_path / "t")
    upsert_parquet(spark.createDataFrame([Row(k=1, v="old", ver=5)]), path, ["k"], "ver")
    upsert_parquet(spark.createDataFrame([Row(k=1, v="new", ver=5)]), path, ["k"], "ver")
    [r] = spark.read.parquet(path).collect()
    assert r.v == "new"


def test_skipgram_embeddings(spark):
    from sift_spark.models.embeddings import skipgram_embeddings

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    vecs = skipgram_embeddings(docs, dimensions=16, min_count=5)
    rows = vecs.collect()
    terms = {r.term for r in rows}
    assert "wiki/spark" in terms and "wiki/table" in terms  # entities in the space
    assert all(len(r.vector) == 16 for r in rows)


def test_skipgram_vocab_invariant_under_parallel_training(spark):
    """Training parallelism must not change the vocab (term set +
    vector width) — that's the partition-invariant contract the
    rows-only gate checks. Vector VALUES may differ across
    numPartitions and are deliberately not compared."""
    from sift_spark.models.embeddings import skipgram_embeddings

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    serial = skipgram_embeddings(docs, dimensions=16, min_count=5, num_partitions=1)
    parallel = skipgram_embeddings(docs.repartition(8), dimensions=16, min_count=5)
    v1 = {(r.term, len(r.vector)) for r in serial.collect()}
    v8 = {(r.term, len(r.vector)) for r in parallel.collect()}
    assert v1 == v8 and len(v8) > 0


def test_multimodal_real_codec(spark):
    """decode → features → resize → frame-sample, all real pixel work
    on the self-contained SRAW/SVID format (stdlib zlib + numpy)."""
    import numpy as np

    from sift_spark.operators.multimodal import (
        decode_features,
        decode_sraw,
        resize_images,
        sample_frames,
        synth_media,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(20)
    media = synth_media(docs)
    rows = {r.media_id: r for r in decode_features(media).collect()}
    assert len(rows) == 20
    assert all((r.width, r.height, r.channels) == (16, 16, 3) for r in rows.values())
    # feature values equal a direct numpy recompute of the same payload
    payload = {r.media_id: r.payload for r in media.collect()}
    some_id = next(iter(rows))
    arr = decode_sraw(bytes(payload[some_id]))
    assert rows[some_id].px_mean == round(float(arr.astype(np.float64).mean()), 6)

    small = resize_images(media, 8, 8).collect()
    for r in small:
        a = decode_sraw(bytes(r.payload))
        assert a.shape == (8, 8, 3)
        assert r.meta_width == 8 and r.meta_height == 8
    # 16→8 is an exact 2x2 area mean
    want = decode_sraw(bytes(payload[some_id])).reshape(8, 2, 8, 2, 3).mean(axis=(1, 3))
    got = decode_sraw(bytes(next(r.payload for r in small if r.media_id == some_id)))
    assert np.array_equal(got, want.round().astype(np.uint8))

    vids = synth_media(docs, kind="video")
    frames = sample_frames(vids, every_ms=500)
    fr = frames.collect()
    assert len(fr) == 80  # 2000ms / 500ms = 4 frames each
    # each emitted frame is a standalone decodable SRAW image
    assert decode_sraw(bytes(fr[0].frame_bytes)).shape == (16, 16, 3)


def test_multimodal_foreign_mime_gate(spark):
    """Unknown mime without a codec raises unless allow_fake=True."""
    from pyspark.sql import functions as F

    from sift_spark.operators.multimodal import decode_features, synth_media

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(3)
    foreign = synth_media(docs).withColumn("mime", F.lit("image/jpeg"))
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(Exception):  # NotImplementedError via PythonException
            decode_features(foreign).collect()
        fake = decode_features(foreign, allow_fake=True).collect()
        assert all(r.width is None and r.px_mean is not None for r in fake)


def test_stream_trending_matches_batch(spark, events_dir):
    """Streaming windowed counts ranked at the sink equal the batch
    trending operator."""
    from sift_spark.operators.events import trending
    from sift_spark.streaming.events import (
        rank_trending,
        read_event_stream,
        run_available_now,
        stream_tumbling_counts,
    )

    stream = read_event_stream(spark, events_dir)
    counts = run_available_now(stream_tumbling_counts(stream, minutes=60), "t_trend")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.rank)
        for r in rank_trending(counts.drop("sum_value"), k=3).collect()
    }
    batch = trending(spark.read.parquet(f"{SF_SMOKE}/events.parquet"), minutes=60, k=3)
    want = {(r.window_start, r.event_type): (r.n_events, r.rank) for r in batch.collect()}
    assert got == want and got


def test_stream_upsert_parquet_matches_batch_merge(spark, events_dir, tmp_path):
    """Streamed micro-batch upserts converge to the same table as one
    batch merge: per user, the latest (highest-ts) event wins."""
    from sift_spark.streaming.events import read_event_stream, stream_upsert_parquet

    path = str(tmp_path / "serving")
    stream = read_event_stream(spark, events_dir)
    latest = stream.select("user_id", "event_type", "value", F.col("ts").alias("version"))
    q = stream_upsert_parquet(latest, path, ["user_id"], "version", "t_upsert")
    q.awaitTermination()

    got = {r.user_id: (r.version, r.event_type) for r in spark.read.parquet(path).collect()}
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    from sift_spark.operators.incremental import upsert_latest

    empty = spark.createDataFrame([], spark.read.parquet(path).schema)
    want_df = upsert_latest(
        empty, batch.select("user_id", "event_type", "value", F.col("ts").alias("version")),
        ["user_id"], "version",
    )
    want = {r.user_id: (r.version, r.event_type) for r in want_df.collect()}
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0]


def test_stream_session_window_matches_batch(spark, events_dir):
    """Built-in session_window sessions ≡ the batch gap sessions:
    same (user, start, count, sum); stream end = batch end + gap."""
    from sift_spark.operators.events import sessionize
    from sift_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        stream_session_window_counts,
    )

    gap_s = 30 * 60
    stream = read_event_stream(spark, events_dir)
    out = run_available_now(
        stream_session_window_counts(stream), "t_swin", output_mode="append"
    )
    batch = sessionize(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    got = {(r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
           for r in out.collect()}
    want = {(r.user_id, r.session_start): (r.session_end + gap_s, r.n_events, r.sum_value)
            for r in batch.collect()}
    # every emitted session matches its batch twin; sessions whose
    # expiry (end + gap) is past the final watermark (max event time
    # − delay) legitimately stay open in state
    assert got
    for k, v in got.items():
        assert want[k] == v
    import pyspark.sql.functions as F

    from sift_spark.operators.events import epoch_seconds

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    max_ts = ev.agg(F.max(epoch_seconds(ev))).collect()[0][0]
    wm = max_ts - gap_s
    for k in set(want) - set(got):
        assert want[k][0] > wm, f"session {k} should have closed"


def test_stream_attribution_matches_batch(spark, events_dir):
    from sift_spark.operators.events import attribution_counts
    from sift_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        stream_attribution,
    )

    stream = read_event_stream(spark, events_dir)
    out = run_available_now(stream_attribution(stream), "t_attr", output_mode="append")
    got: dict = {}
    for r in out.collect():
        k = (r.first_touch, r.last_touch)
        got[k] = got.get(k, 0) + 1
    want = {
        (r.first_touch, r.last_touch): r.n_conversions
        for r in attribution_counts(
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        ).collect()
    }
    assert got == want


def test_stream_changepoint_matches_batch(spark, events_dir):
    from sift_spark.operators.events import changepoint_cusum
    from sift_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        stream_changepoint,
    )

    batch_ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    want = {
        (r.event_type, r.window_start): (r.n, r.cusum_pos, r.cusum_neg, r.is_change)
        for r in changepoint_cusum(batch_ev).collect()
    }
    # the stream standardizes against reference stats; feed it the
    # batch series' own mean/std so the two outputs are exactly equal
    import math

    series: dict = {}
    for (et, ws), (n, *_rest) in want.items():
        series.setdefault(et, []).append(n)
    ref = {}
    for et, ns in series.items():
        mu = sum(ns) / len(ns)
        sd = math.sqrt(sum((v - mu) ** 2 for v in ns) / (len(ns) - 1))
        ref[et] = (mu, sd)

    stream = read_event_stream(spark, events_dir)
    out = run_available_now(
        stream_changepoint(stream, ref), "t_cusum", output_mode="append"
    )
    got = {
        (r.event_type, r.window_start): (r.n, r.cusum_pos, r.cusum_neg, r.is_change)
        for r in out.collect()
    }
    # the stream emits a bucket when the NEXT bucket opens, so each
    # type's final (never-closed) bucket is absent — everything else
    # must match the batch operator exactly
    last = {et: max(ws for (e, ws) in want if e == et) for et in series}
    expected = {
        (et, ws): v for (et, ws), v in want.items() if ws != last[et]
    }
    assert got == expected


def test_skipgram_neighborhoods_match_stored_snapshot(spark):
    """Rows-only hardening for the Word2Vec rows (VERDICT r5 #10):
    with a fixed seed and one training partition the run is
    deterministic, so each entity's cosine neighborhood must overlap
    a stored snapshot (mean Jaccard >= 0.6; measured 1.0 run-to-run).
    The property is SENSITIVE: a window-size perturbation (5 -> 2)
    measured 0.12 mean overlap, so an embedding-semantics regression
    trips the threshold rather than sliding through a rows+schema
    check."""
    import json

    import numpy as np
    from pyspark.ml.feature import Word2Vec

    from sift_spark.models.embeddings import entity_sentences

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sents = entity_sentences(docs).coalesce(1)
    w2v = Word2Vec(
        vectorSize=16,
        minCount=5,
        seed=42,
        inputCol="sentence",
        outputCol="vec",
        numPartitions=1,
        maxIter=1,
        windowSize=5,
    )
    rows = w2v.fit(sents).getVectors().collect()
    terms = [r.word for r in rows]
    V = np.array([r.vector.toArray() for r in rows])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    got = {}
    for i, t in enumerate(terms):
        if not t.startswith("wiki/"):
            continue
        sims = V @ V[i]
        sims[i] = -2.0
        top = np.argsort(-sims)[:3]
        got[t] = sorted(terms[j] for j in top)

    import os

    snap_path = os.path.join(
        os.path.dirname(__file__), "data", "skipgram_neighborhoods_sf0.001.json"
    )
    with open(snap_path) as fh:
        snap = json.load(fh)
    assert set(got) == set(snap)
    js = [
        len(set(got[k]) & set(snap[k])) / len(set(got[k]) | set(snap[k]))
        for k in snap
    ]
    assert sum(js) / len(js) >= 0.6, got
