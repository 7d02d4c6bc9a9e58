"""Property tests for the SRAW/SVID codec (pure Python — no Spark)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from sift_spark.operators.multimodal import (
    decode_sraw,
    encode_sraw,
    encode_svid,
    svid_frames,
)


@settings(max_examples=50, deadline=None)
@given(
    arr=st.tuples(
        st.integers(1, 48), st.integers(1, 48), st.sampled_from([1, 3, 4])
    ).flatmap(lambda s: arrays(np.uint8, s))
)
def test_sraw_roundtrip(arr):
    out = decode_sraw(encode_sraw(arr))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


@settings(max_examples=20, deadline=None)
@given(
    frames=st.lists(
        arrays(np.uint8, (8, 6, 3)), min_size=1, max_size=6
    )
)
def test_svid_roundtrip(frames):
    blobs = svid_frames(encode_svid(frames))
    assert len(blobs) == len(frames)
    for blob, frame in zip(blobs, frames):
        assert np.array_equal(decode_sraw(blob), frame)


def test_sraw_grayscale_2d_input():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_sraw(encode_sraw(g))
    assert out.shape == (3, 4, 1)
    assert np.array_equal(out[:, :, 0], g)


def test_magic_rejects_foreign_bytes():
    with pytest.raises(ValueError):
        decode_sraw(b"\x89PNG\r\n\x1a\n garbage")
    with pytest.raises(ValueError):
        svid_frames(b"RIFFxxxxWEBP")


def test_pil_foreign_format_path(spark):
    """Real-format (PNG) decode through the PIL gate — skipped where
    PIL isn't shipped, exercised automatically wherever it is."""
    import pytest

    pytest.importorskip("PIL")
    import io as _io

    import numpy as np
    from PIL import Image

    from sift_spark.operators.multimodal import MEDIA_SCHEMA, decode_features

    rng = np.random.default_rng(7)
    rows = []
    for mid in range(3):
        arr = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        rows.append((mid, "image", "image/png", bytearray(buf.getvalue()), 10, 12, 0))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_features(media).collect()}
    assert len(got) == 3
    for mid, r in got.items():
        assert (r.width, r.height, r.channels) == (10, 12, 3)
        assert r.px_mean is not None and 0.0 <= r.px_mean <= 255.0


def test_kafka_connector_smoke(spark):
    """Builds the production Kafka readStream wherever the connector
    jar is on the classpath (no broker needed to construct the plan);
    skipped elsewhere. Broker-free parse tests cover the JSON wiring
    either way."""
    import pytest

    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception:
        pytest.skip("spark-sql-kafka connector not on the classpath")

    from sift_spark.streaming.sources import kafka_event_stream

    df = kafka_event_stream(spark, "localhost:9092", "events")
    assert df.isStreaming
    assert {"event_id", "ts", "user_id", "event_type", "value", "props"} <= set(df.columns)
