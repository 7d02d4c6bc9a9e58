"""Multi-JVM execution proof: run a representative query slice on
``local-cluster[2,2,2048]`` — two SEPARATE executor JVMs with a real
serialization boundary, executor-side Python workers, and
executor-hosted localCheckpoint blocks — and print one JSON line of
per-query row counts + order-insensitive value hashes.

Every other test and bench in this repo runs ``local[*]`` (one JVM, no
closure serialization, no remote block fetches); this script is the
evidence that the plans — the CC localCheckpoint loop, the GEMM
cogroup, the shared-artifact consumers, the IRLS trainer, a streaming
twin — actually survive being scheduled across processes.
tests/test_multijvm.py runs this as a subprocess and asserts the
hashes equal the same slice computed on the in-process local[*]
session; run standalone with an explicit master to compare by hand:

    python scripts/multijvm_slice.py 'local-cluster[2,2,2048]'
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SIFT_MULTIJVM_SF", "/root/testdata/sf0.001")

# The slice: one per risk class. CC is forced down the DISTRIBUTED
# rounds (driver gate off) so the per-round localCheckpoint path is
# what multi-JVM exercises; entity_components does the same over
# string vertex ids through the star variant.
SLICE = (
    "dedup_clusters",        # CC loop: per-round localCheckpoint blocks on executors
    "entity_components",     # star CC over strings (distinct codepath)
    "dedup_minhash_lsh",     # shared shingle/token artifact consumer
    "ann_ivf_bucketed",      # Arrow cogroup/pandas-UDF GEMM tiles
    "quality_classifier",    # grouped IRLS: 1-row collected partials + broadcast weights
    "events_tumbling",       # windowed agg (batch twin of the streaming shape)
)


def run_slice(spark) -> dict:
    """Run the slice + a streaming twin; return {name: {rows, hash}}."""
    from tests.parity import _pandas_rows, value_hash

    import __spark_entry__ as E

    # force the DISTRIBUTED paths — the driver fast-path gates would
    # otherwise hide exactly the machinery this slice exists to prove
    spark.conf.set("spark.sift.cc.driverEdgeLimit", "0")
    spark.conf.set("spark.sift.logreg.driverGroupLimit", "0")
    qs = E.queries()
    out = {}
    try:
        for name in SLICE:
            pdf = qs[name](spark, SF_DIR).toPandas()
            out[name] = {
                "rows": len(pdf),
                "hash": value_hash(_pandas_rows(pdf), list(pdf.columns)),
            }
    finally:
        spark.conf.unset("spark.sift.cc.driverEdgeLimit")
        spark.conf.unset("spark.sift.logreg.driverGroupLimit")

    # streaming twin: file-source stream over events.parquet →
    # watermarked tumbling counts, drained with availableNow (the
    # file source wants a DIRECTORY, so stage the file into one)
    import shutil
    import tempfile

    from sift_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        stream_tumbling_counts,
    )

    stage = tempfile.mkdtemp(prefix="sift-multijvm-events-")
    try:
        shutil.copy(f"{SF_DIR}/events.parquet", os.path.join(stage, "events.parquet"))
        stream = stream_tumbling_counts(read_event_stream(spark, stage))
        pdf = run_available_now(stream, "multijvm_tumbling").toPandas()
        out["stream_tumbling"] = {
            "rows": len(pdf),
            "hash": value_hash(_pandas_rows(pdf), list(pdf.columns)),
        }
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return out


def package_zip() -> str:
    """Zip the sift_spark package for ``addPyFile`` — executor Python
    workers are SEPARATE processes in multi-JVM mode and do not
    inherit the driver's sys.path (the first thing this harness
    caught: every pandas-UDF closure pickles by module reference, so
    the package must ship to workers exactly as it would on a real
    cluster via ``spark-submit --py-files``). Delegates to the
    library helper (sift_spark.deploy), which session.get_spark also
    calls automatically for non-local masters."""
    from sift_spark.deploy import package_zip as _pz

    return _pz()


def main() -> None:
    master = sys.argv[1] if len(sys.argv) > 1 else "local-cluster[2,2,2048]"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .appName("sift_multijvm_slice")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # executors are separate JVMs; make sure their python workers
        # run the same interpreter as the driver
        .config("spark.pyspark.python", sys.executable)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(package_zip())
    try:
        result = run_slice(spark)
    finally:
        spark.stop()
    print("MULTIJVM_RESULT " + json.dumps(result, sort_keys=True))


if __name__ == "__main__":
    main()
