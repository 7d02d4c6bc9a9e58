"""Round-9 degenerate-input guards: the audit/report operators must
return explicit values (vacuous 1.0 or documented NULL), never an
engine-dependent divide-by-zero, when the corpus is empty, has no
near-dup pairs, or has fewer than 2 ranked terms."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_lsh_recall_probe_no_exact_pairs_is_vacuous_one(spark):
    from sift_spark.operators.dedup import lsh_recall_probe

    docs = _docs(
        spark,
        [
            (1, "a", "alpha beta gamma delta epsilon zeta"),
            (2, "a", "one two three four five six seven"),
        ],
    )
    row = lsh_recall_probe(docs, n=3, threshold=0.8).collect()[0]
    assert row.n_exact == 0
    assert row.recall == 1.0  # nothing to miss, not NULL


def test_token_zipf_fit_single_term_reports_null_fit(spark):
    from sift_spark.operators.text_analysis import token_zipf_fit

    docs = _docs(spark, [(1, "a", "word word word")])
    row = token_zipf_fit(docs).collect()[0]
    assert row.n_terms == 1
    assert row.slope is None and row.intercept is None and row.r2 is None


def test_token_zipf_fit_two_terms_still_fits(spark):
    from sift_spark.operators.text_analysis import token_zipf_fit

    docs = _docs(spark, [(1, "a", "aa aa aa bb")])
    row = token_zipf_fit(docs).collect()[0]
    assert row.n_terms == 2
    assert row.slope is not None


def test_vocab_coverage_empty_heldout_reports_zero_and_null(spark):
    from sift_spark.operators.text_analysis import vocab_coverage

    # every doc_id % 5 != 0 -> held-out split is empty
    docs = _docs(
        spark,
        [(1, "a", "alpha beta"), (2, "a", "beta gamma"), (3, "a", "gamma")],
    )
    row = vocab_coverage(docs).collect()[0]
    assert row.heldout_tokens == 0 and row.covered_tokens == 0
    assert row.coverage is None and row.oov_rate is None


def test_contamination_summary_empty_corpus_null_clean_rate(spark):
    from sift_spark.operators.text_analysis import contamination_summary

    docs = _docs(spark, []).where(F.lit(False))
    bench = _docs(spark, [(100, "b", "alpha beta gamma delta epsilon")])
    row = contamination_summary(docs, bench).collect()[0]
    assert row.n_corpus_docs == 0
    assert row.clean_rate is None


def test_lsh_recall_probe_sample_mod_equals_prefiltered_probe(spark):
    """sample_mod=s must equal running the FULL probe on the
    deterministic 1/s hash-slice — the audit gate's scale lever
    (r10, added after the sf5 study measured the exact side
    quadratic on duplicate-heavy corpora)."""
    from pyspark.sql import functions as F

    from sift_spark.operators.dedup import lsh_recall_probe
    from sift_spark.operators.sampling import hash_bucket
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sampled = lsh_recall_probe(docs, n=3, threshold=0.8, sample_mod=3).collect()[0]
    slice_docs = docs.where(hash_bucket(F.col("doc_id"), "lshprobe", 3) == 0)
    manual = lsh_recall_probe(slice_docs, n=3, threshold=0.8).collect()[0]
    assert sampled == manual
    full = lsh_recall_probe(docs, n=3, threshold=0.8).collect()[0]
    assert sampled.n_exact <= full.n_exact  # the slice audits fewer pairs
