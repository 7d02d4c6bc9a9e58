"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so the DECODE step is
gated: with a real library present (``PIL``/``soundfile``) the same
UDF signature would do real work; without one, decode raises
``NotImplementedError`` unless ``allow_fake=True``, in which case a
deterministic fake decoder (byte statistics) exercises the full
Spark-side contract — schema, batch shape, partitioning — which IS
real and tested.

Layout for 100 TB: binary payloads live in their own parquet column
(page-level dictionary off), metadata in sibling scalar columns so
Catalyst prunes payload reads for metadata-only queries; processing
parallelism is row-group granular like any other column.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, byte_mean double, byte_head string"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


def synth_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from documents: payload
    = md5-bytes of the text (stands in for an encoded image)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(f"{kind}/fake").alias("mime"),
        F.unhex(F.md5("text")).alias("payload"),
        F.lit(16).alias("meta_width"),
        F.lit(16).alias("meta_height"),
        F.lit(1000).alias("meta_duration_ms"),
    )


def decode_features(media: DataFrame, allow_fake: bool = False) -> DataFrame:
    """Decode → per-item features via ``mapInPandas`` (Arrow batches).

    The real decode kernel is NOT implemented (this environment ships
    no codec); only the deterministic fake (byte statistics, same
    schema and batching) exists, and it only runs when explicitly
    requested — the gate is on ``allow_fake``, never on whether a
    codec happens to be importable, so fake features are never
    silently passed off as decoded ones."""
    if not allow_fake:
        raise NotImplementedError(
            "real media decode is not implemented; "
            "pass allow_fake=True to run the deterministic fake decoder"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            rows = []
            for mid, kind, buf in zip(pdf["media_id"], pdf["kind"], payloads):
                b = bytes(buf)
                rows.append(
                    (
                        mid,
                        kind,
                        len(b),
                        round(sum(b) / len(b), 6) if b else 0.0,
                        b[:4].hex(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "byte_mean", "byte_head"]
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: real resize needs an image codec. The Spark-side
    contract (signature/schema) is final; the kernel is not."""
    raise NotImplementedError(
        "image resize requires an image codec (PIL), absent in this environment; "
        "the mapInPandas plumbing pattern is demonstrated in decode_features"
    )


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Deterministic frame sampling stub for video payloads: emits one
    fake frame per ``every_ms`` of metadata duration, slicing the
    payload round-robin — real Spark plumbing (explode cadence, batch
    shapes), fake frame decode."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, dur, buf in zip(pdf["media_id"], pdf["meta_duration_ms"], pdf["payload"]):
                b = bytes(buf)
                n_frames = max(1, int(dur) // every_ms)
                for i in range(n_frames):
                    rows.append((mid, i, b[i % max(1, len(b)) :][:4]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return media.mapInPandas(run, FRAME_SCHEMA)
