"""Units for the round-8-continuation operators: token_zipf_fit and
shard_skew_report."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_zipf_fit_matches_numpy_ols(spark):
    from sift_spark.operators.text_analysis import token_zipf_fit

    # frequencies by construction: a=5, b=3, c=2, d=1 (ties impossible)
    docs = _docs(spark, [
        (1, "a a a b b c"),
        (2, "a a b c d"),
    ])
    row = token_zipf_fit(docs).collect()[0]
    assert row.n_terms == 4
    freqs = [5, 3, 2, 1]
    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(f) for f in freqs]
    mx = sum(xs) / 4
    my = sum(ys) / 4
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / 4
    var = sum((x - mx) ** 2 for x in xs) / 4
    slope = cov / var
    assert abs(row.slope - round(slope, 6)) < 2e-6
    assert abs(row.intercept - round(my - slope * mx, 6)) < 2e-6
    assert 0.0 < row.r2 <= 1.0


def test_token_zipf_fit_max_rank_caps_points(spark):
    from sift_spark.operators.text_analysis import token_zipf_fit

    docs = _docs(spark, [(1, "a a a b b c"), (2, "a d e f")])
    row = token_zipf_fit(docs, max_rank=3).collect()[0]
    assert row.n_terms == 3


def test_shard_skew_report_conserves_and_normalizes(spark):
    from sift_spark.operators.sampling import shard_skew_report

    sized = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).cast("bigint").alias("n_tokens"),
    )
    rows = shard_skew_report(sized, n_shards=4).collect()
    assert {r.shard_id for r in rows} <= {0, 1, 2, 3}
    # token conservation
    assert sum(r.n_tokens for r in rows) == sum((i % 7) + 1 for i in range(200))
    assert sum(r.n_docs for r in rows) == 200
    # fractions sum to 1, skew averages 1 over the observed shards
    assert abs(sum(r.frac_tokens for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.skew for r in rows) / len(rows) - 1.0) < 1e-4


def test_shard_skew_matches_packer_sharding(spark):
    """The report must describe the SAME shard assignment
    pack_sequences_sharded executes ('pack:'-salted hash)."""
    from sift_spark.operators.sampling import (
        pack_sequences_sharded,
        shard_skew_report,
    )

    sized = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(5).cast("bigint").alias("n_tokens")
    )
    packed = pack_sequences_sharded(sized, n_shards=4, max_tokens=16)
    pk = {
        r.shard_id: r.cnt
        for r in packed.groupBy("shard_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    rep = {r.shard_id: r.n_docs for r in shard_skew_report(sized, n_shards=4).collect()}
    assert pk == rep


def test_filter_funnel_is_monotone_and_consistent(spark):
    from sift_spark.operators.text_analysis import filter_funnel, gopher_rules

    docs = _docs(spark, [
        (1, " ".join(["the word and more text here"] * 12)),   # passes
        (2, "short doc"),                                      # fails n_words
        (3, " ".join(["####"] * 60)),                          # fails symbol+alpha+stop
        (4, " ".join(["supercalifragilistic"] * 60)),          # fails mean_len
    ])
    row = filter_funnel(docs).collect()[0]
    seq = [row.n_docs, row.after_n_words, row.after_mean_len,
           row.after_symbol, row.after_alpha, row.after_stopwords]
    assert seq == sorted(seq, reverse=True), seq        # funnel only narrows
    n_pass = gopher_rules(docs).where("passes").count()
    assert row.after_stopwords == n_pass                 # last stage == passes
    assert abs(row.pass_rate - round(n_pass / row.n_docs, 6)) < 1e-9


def test_vocab_coverage_full_vocab_covers_shared_terms(spark):
    from sift_spark.operators.sampling import shard_skew_report  # noqa: F401
    from sift_spark.operators.text_analysis import vocab_coverage

    # doc 5 and 10 are held out (doc_id % 5 == 0); term 'zzz' appears
    # ONLY in the heldout split, so it can never be covered
    docs = _docs(spark, [
        (1, "a b c a"), (2, "a b d"), (3, "b c"), (4, "a d"),
        (5, "a b zzz"), (10, "c zzz zzz"),
    ])
    row = vocab_coverage(docs, vocab_size=100).collect()[0]
    assert row.heldout_tokens == 6
    assert row.covered_tokens == 3          # a, b, c covered; 3x zzz not
    assert row.coverage == 0.5 and row.oov_rate == 0.5
    # shrinking the vocab can only shrink coverage
    row1 = vocab_coverage(docs, vocab_size=1).collect()[0]
    assert row1.covered_tokens <= row.covered_tokens
    assert row1.n_vocab == 1


def test_contamination_summary_consistent_with_components(spark):
    from sift_spark.operators.dedup import fuzzy_contamination
    from sift_spark.operators.text_analysis import (
        contamination_check,
        contamination_summary,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(spark, [
        (1, base), (2, base + " extra tail words here"),
        (3, "completely different text with no overlap at all whatsoever"),
        (20, base),                    # benchmark doc (doc_id % 20 == 0)
    ])
    corpus = docs.where("doc_id % 20 != 0")
    bench = docs.where("doc_id % 20 = 0")
    row = contamination_summary(corpus, bench).collect()[0]
    assert row.n_corpus_docs == 3
    # bounds that must hold by construction
    assert row.n_both <= min(row.n_exact, row.n_fuzzy)
    assert max(row.n_exact, row.n_fuzzy) <= row.n_flagged <= row.n_exact + row.n_fuzzy
    assert abs(row.clean_rate - round((3 - row.n_flagged) / 3, 6)) < 1e-9
    # components agree: the fuzzy count matches the standalone screen
    nf = fuzzy_contamination(corpus, bench, threshold=0.5).count()
    assert row.n_fuzzy == nf
    ne = (contamination_check(corpus, bench)
          .where("contamination >= 0.5").count())
    assert row.n_exact == ne
    # doc 1 verbatim-duplicates the benchmark doc: something must flag
    assert row.n_flagged >= 1


def test_dedup_rate_by_source_counts(spark):
    from sift_spark.operators.dedup import dedup_rate_by_source

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b")],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc1 long, doc2 long"
    )
    rows = {r.source: r for r in dedup_rate_by_source(docs, pairs).collect()}
    assert rows["a"].n_docs == 2 and rows["a"].n_dup_docs == 2
    assert rows["a"].dup_rate == 1.0
    assert rows["b"].n_docs == 3 and rows["b"].n_dup_docs == 2
    assert abs(rows["b"].dup_rate - round(2 / 3, 6)) < 1e-9


def test_dedup_rate_by_source_dedups_multi_pair_docs(spark):
    from sift_spark.operators.dedup import dedup_rate_by_source

    docs = spark.createDataFrame([(1, "a"), (2, "a"), (3, "a")],
                                 "doc_id long, source string")
    # doc 1 appears in two pairs — must count once
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "doc1 long, doc2 long")
    row = dedup_rate_by_source(docs, pairs).collect()[0]
    assert row.n_dup_docs == 3 and row.dup_rate == 1.0


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_vocab_coverage_plan_broadcast_semi(spark):
    """The K-row vocab must reach the held-out postings as a broadcast
    LEFT SEMI hash join (never a shuffle of the posting table against
    it); the only BNLJ is the 1-row scalar injections."""
    from sift_spark.operators.text_analysis import vocab_coverage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(vocab_coverage(docs))
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_shard_skew_plan_single_scalar_join(spark):
    from pyspark.sql import functions as F

    from sift_spark.operators.sampling import shard_skew_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sized = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    plan = _plan(shard_skew_report(sized))
    # exactly the one broadcast 1-row total injection, nothing else
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan


def test_lsh_recall_probe_consistency(spark):
    from sift_spark.operators.dedup import (
        lsh_recall_probe,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    base = "one two three four five six seven eight nine ten"
    docs = _docs(spark, [
        (1, base), (2, base + " eleven"),     # near-dup pair
        (3, "totally different words in this other document here now"),
    ])
    row = lsh_recall_probe(docs, threshold=0.5).collect()[0]
    assert row.n_exact == ngram_jaccard_pairs(docs, 3, 0.5).count()
    assert row.n_lsh == minhash_lsh_pairs(docs, n=3, threshold=0.5).count()
    # the LSH verified set is a subset of the exact set
    assert row.n_lsh == row.n_exact - row.n_missed
    assert 0.0 <= row.recall <= 1.0
    assert row.n_exact >= 1          # the construction guarantees a pair


def test_ann_recall_report_bounds_and_nprobe_monotonic(spark):
    from sift_spark.operators.similarity import ann_recall_report

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    low = ann_recall_report(emb, k=5, nprobe=1).collect()[0]
    hi = ann_recall_report(emb, k=5, nprobe=4).collect()[0]
    for r in (low, hi):
        assert 0.0 <= r.min_recall <= r.avg_recall <= 1.0
        assert 0.0 <= r.full_recall_frac <= 1.0
        assert r.n_queries > 0
    # probing more centroids can only help recall
    assert hi.avg_recall >= low.avg_recall
