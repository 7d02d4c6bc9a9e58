"""Round-7 artifact plumbing: token-column provenance (the
with_tokens/classify shortcut must trust metadata, never a bare
column name), the corpus_tokens/corpus_tf accounting queries, and the
public CorpusArtifacts lifecycle API (build → release → rebuild,
multi-dataset isolation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sift_spark.functions.core import is_token_artifact, tagged_tokens
from sift_spark.models.text import with_tokens
from tests.conftest import SF_SMOKE


def _docs_frame(spark):
    return spark.createDataFrame(
        [(1, "a b c a"), (2, "x y"), (3, "z")], "doc_id long, text string"
    )


def test_with_tokens_ignores_untagged_toks_column(spark):
    # a caller frame carrying its OWN differently-computed toks column
    # (here: pre-uppercased) must NOT be silently trusted — the split
    # from text wins
    docs = _docs_frame(spark).withColumn(
        "toks", F.split(F.upper(F.col("text")), " ")
    )
    assert not is_token_artifact(docs)
    out = {r["doc_id"]: r["toks"] for r in with_tokens(docs).collect()}
    assert out[1] == ["a", "b", "c", "a"]  # not the uppercased imposter


def test_with_tokens_shortcuts_on_tagged_artifact(spark):
    docs = _docs_frame(spark).select("*", tagged_tokens(F.col("text")))
    assert is_token_artifact(docs)
    # provenance survives projection, filter, and persist
    slim = docs.select("doc_id", "toks").where(F.col("doc_id") > 0).persist()
    try:
        assert is_token_artifact(slim)
        out = {r["doc_id"]: r["toks"] for r in with_tokens(slim).collect()}
        assert out[1] == ["a", "b", "c", "a"]
    finally:
        slim.unpersist()


def test_feature_base_ignores_untagged_toks(spark):
    from sift_spark.operators.classify import _feature_base

    docs = _docs_frame(spark)
    imposter = docs.withColumn("toks", F.array(F.lit("wrong")))
    base = {r["doc_id"]: r["n_tokens"] for r in _feature_base(docs).collect()}
    base_imposter = {
        r["doc_id"]: r["n_tokens"] for r in _feature_base(imposter).collect()
    }
    assert base == base_imposter  # imposter column ignored, text re-split
    tagged = docs.select("*", tagged_tokens(F.col("text")))
    base_tagged = {
        r["doc_id"]: r["n_tokens"] for r in _feature_base(tagged).collect()
    }
    assert base == base_tagged


def test_corpus_artifacts_release_and_isolation(spark):
    sf_dir = SF_SMOKE
    from sift_spark.queries import (
        _SHINGLE_CACHE,
        _TF_CACHE,
        _TOKENS_CACHE,
        corpus_artifacts,
    )

    app = spark.sparkContext.applicationId
    art = corpus_artifacts(spark, sf_dir)
    toks, tf, sh = art.tokens(), art.tf(), art.shingles()
    assert toks.storageLevel.useMemory and tf.storageLevel.useMemory
    assert (app, sf_dir) in _TOKENS_CACHE and (app, sf_dir) in _TF_CACHE
    assert (app, sf_dir, 3) in _SHINGLE_CACHE

    # a second dataset handle must not be touched by this release
    other_key = (app, "/such/other/dataset")
    _TOKENS_CACHE[other_key] = toks  # sentinel entry, never unpersisted via it

    released = art.release()
    assert released == 3
    assert (app, sf_dir) not in _TOKENS_CACHE
    assert (app, sf_dir) not in _TF_CACHE
    assert (app, sf_dir, 3) not in _SHINGLE_CACHE
    assert other_key in _TOKENS_CACHE  # isolation
    _TOKENS_CACHE.pop(other_key)
    assert not toks.storageLevel.useMemory and not toks.storageLevel.useDisk

    # rebuild after release works and re-persists
    toks2 = art.tokens()
    assert toks2.storageLevel.useMemory
    assert art.release() == 1


def test_corpus_accounting_queries_shapes(spark):
    sf_dir = SF_SMOKE
    from sift_spark.queries import corpus_artifacts, q_corpus_tf, q_corpus_tokens

    try:
        t = q_corpus_tokens(spark, sf_dir)
        assert t.columns == ["doc_id", "n_toks", "first_tok", "last_tok"]
        assert t.count() > 0
        tf = q_corpus_tf(spark, sf_dir)
        assert tf.columns == ["doc_id", "term", "tf"]
        # tf sums back to the token totals — the artifact is the
        # corpus posting table, not a sample
        n_tokens = t.agg(F.sum("n_toks")).collect()[0][0]
        assert tf.agg(F.sum("tf")).collect()[0][0] == n_tokens
    finally:
        corpus_artifacts(spark, sf_dir).release()
