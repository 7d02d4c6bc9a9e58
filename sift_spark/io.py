"""Table loading helpers for the driver-generated parquet test corpus."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # driver testdata stores ts as timestamp[us] (plain
        # TimestampType — this conf is a no-op for it); set so a true
        # TIMESTAMP(NANOS) events file reads as int64 nanos instead of
        # erroring under a caller-provided session. Operators accept
        # either via epoch_seconds() type detection.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


# --- generic format dispatch -------------------------------------------------
# the reference reads/writes text-ish corpora (sift/corpora, format.py);
# a Spark-native engine should speak every built-in columnar/text format
# through one entry point so pipelines swap storage without code edits.

FORMATS = ("parquet", "orc", "json", "csv", "text")


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite", **options) -> None:
    """Write in any built-in format. CSV gets a header by default
    (schema survives the round trip with ``read_table``); avro is
    gated — it needs the external spark-avro package, and the error
    says so instead of stub-succeeding."""
    if fmt == "avro":
        try:
            df.write.mode(mode).options(**options).format("avro").save(path)
            return
        except Exception as exc:
            raise RuntimeError(
                "avro needs the external spark-avro package "
                "(--packages org.apache.spark:spark-avro_2.13:<version>)"
            ) from exc
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {FORMATS} or 'avro'")
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", "true")
    w.options(**options).format(fmt).save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema=None, **options):
    """Read any built-in format back. CSV re-applies the explicit
    ``schema`` when given (header-only CSV reads everything as
    string otherwise — pass the writer's ``df.schema`` for a
    lossless round trip)."""
    if fmt not in FORMATS and fmt != "avro":
        raise ValueError(f"unknown format {fmt!r}; one of {FORMATS} or 'avro'")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.options(**options).format(fmt).load(path)
