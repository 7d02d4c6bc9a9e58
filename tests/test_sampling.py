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


def test_dsir_weights_favor_target_lang(spark):
    """DSIR importance weights rank target-language docs above
    off-target ones (the whole point of importance resampling)."""
    from sift_spark.operators.sampling import dsir_importance_weights

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    n_docs = len(langs)
    allw = dsir_importance_weights(docs, target_lang="en", k=n_docs).collect()
    assert len(allw) == n_docs
    # weights sorted desc with doc_id tie-break
    ws = [(r.weight, r.doc_id) for r in allw]
    assert ws == sorted(ws, key=lambda t: (-t[0], t[1]))
    # the distributional property: target-language docs score higher
    # on average than off-target docs (the synthetic corpus shares
    # cross-lingual vocabulary, so per-doc overlap is expected — the
    # MEAN separation is what importance weighting guarantees)
    en_w = [r.weight for r in allw if langs[r.doc_id] == "en"]
    other_w = [r.weight for r in allw if langs[r.doc_id] != "en"]
    assert sum(en_w) / len(en_w) > sum(other_w) / len(other_w)
    # and the top of the ranking is enriched vs the base rate
    base = len(en_w) / n_docs
    top_share = sum(1 for r in allw[:50] if langs[r.doc_id] == "en") / 50
    assert top_share > base
    plan = dsir_importance_weights(docs)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_pack_sequences_sharded_equals_per_shard_global_pack(spark):
    """Each shard of the sharded packer must pack exactly like
    pack_sequences run on that shard's documents alone — the property
    that lets a training job pack shards fully independently — and the
    result must be deterministic under input repartitioning."""
    from pyspark.sql import functions as F

    from sift_spark.operators.sampling import pack_sequences, pack_sequences_sharded
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sized = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens")
    )
    out = pack_sequences_sharded(sized, n_shards=4, max_tokens=512).collect()
    assert out
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard_id, {})[r.doc_id] = (r.bin_id, r.bin_offset)

    # determinism under layout change
    out2 = pack_sequences_sharded(sized.repartition(7), n_shards=4, max_tokens=512).collect()
    assert {(r.doc_id, r.shard_id, r.bin_id, r.bin_offset) for r in out2} == {
        (r.doc_id, r.shard_id, r.bin_id, r.bin_offset) for r in out
    }

    # per-shard ≡ global pack of that shard's docs
    shard_docs = {s: set(m) for s, m in by_shard.items()}
    assert len(shard_docs) > 1, "fixture should span multiple shards"
    for s, doc_ids in shard_docs.items():
        solo = pack_sequences(
            sized.where(F.col("doc_id").isin([int(d) for d in doc_ids])),
            max_tokens=512,
        ).collect()
        assert {r.doc_id: (r.bin_id, r.bin_offset) for r in solo} == by_shard[s]

    # bin invariants: offsets inside capacity, bins contiguous from 0,
    # offsets strictly increasing within a bin's hash order
    for r in out:
        assert 0 <= r.bin_offset < 512
    for s, m in by_shard.items():
        bins = sorted({b for b, _ in m.values()})
        assert bins == list(range(len(bins)))


def test_stratified_kfold_balance_and_stability(spark):
    from collections import Counter

    from sift_spark.io import table
    from sift_spark.operators.sampling import stratified_kfold
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    got = stratified_kfold(docs, "doc_id", "lang", k=5).collect()
    per = Counter((r["stratum"], r["fold"]) for r in got)
    strata = {r["stratum"] for r in got}
    for s in strata:
        sizes = [per.get((s, f), 0) for f in range(5)]
        assert max(sizes) - min(sizes) <= 1, (s, sizes)
    # membership is layout-invariant
    got2 = stratified_kfold(docs.repartition(7), "doc_id", "lang", k=5).collect()
    assert sorted((r["doc_id"], r["fold"]) for r in got) == sorted(
        (r["doc_id"], r["fold"]) for r in got2
    )
