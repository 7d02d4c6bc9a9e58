"""Deterministic sampling: stability across repartitioning (the
property rand()-based sampling lacks)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_split_stable_under_repartition(spark):
    from sift_spark.operators.sampling import train_test_split

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    _, test1 = train_test_split(docs, "doc_id", 0.1)
    _, test2 = train_test_split(docs.repartition(17), "doc_id", 0.1)
    ids1 = {r.doc_id for r in test1.collect()}
    ids2 = {r.doc_id for r in test2.collect()}
    assert ids1 == ids2 and ids1  # identical membership, non-empty


def test_split_disjoint_and_complete(spark):
    from sift_spark.operators.sampling import train_test_split

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    train, test = train_test_split(docs, "doc_id", 0.1)
    n = docs.count()
    nt, ns = train.count(), test.count()
    assert nt + ns == n
    assert train.join(test, "doc_id", "inner").count() == 0


def test_stratified_rates(spark):
    from pyspark.sql import functions as F

    from sift_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = stratified_sample(docs, "doc_id", "lang", {"en": 0.2, "de": 0.5})
    base = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # unknown strata kept whole; sampled strata strictly reduced
    for lang, n in base.items():
        if lang in ("en", "de"):
            assert got.get(lang, 0) < n
        else:
            assert got[lang] == n
