"""Plan assertions: pushdown / broadcast / codegen guards for the
flagship queries (SURVEY §5.4). A perf regression that flips a
broadcast to a sort-merge join or loses parquet pushdown fails here,
not in a bench eyeball."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_filter_pushdown(spark):
    from sift_spark.operators.relational import q1_pricing_summary

    df = q1_pricing_summary(spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet"))
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q3_broadcasts_customer(spark):
    from sift_spark.io import table
    from sift_spark.operators.relational import q3_shipping_priority

    df = q3_shipping_priority(
        table(spark, SF_SMOKE, "customer"),
        table(spark, SF_SMOKE, "orders"),
        table(spark, SF_SMOKE, "lineitem"),
    )
    assert "BroadcastHashJoin" in _plan(df)


def test_q1_column_pruning(spark):
    from sift_spark.operators.relational import q1_pricing_summary

    df = q1_pricing_summary(spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet"))
    plan = _plan(df)
    # scan must not read join keys/partkeys we don't use
    assert "l_partkey" not in plan and "l_suppkey" not in plan


def test_entity_counts_is_single_shuffle(spark):
    from sift_spark.corpora.synthetic import wikify_links
    from sift_spark.models.links import entity_counts

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    df = entity_counts(wikify_links(docs))
    plan = _plan(df)
    assert plan.count("Exchange") == 1, plan
    # column pruning goes all the way: only text is read (doc_id is
    # unused by the aggregate and pruned from the scan)
    assert "ReadSchema: struct<text:string>" in plan
    # map-side combine before the single shuffle
    assert "partial_count" in plan


def test_entity_mention_tf_broadcasts_idf(spark):
    from sift_spark.corpora.synthetic import wikify_links
    from sift_spark.models.text import entity_mention_term_frequency, entity_mentions, term_idfs

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    df = entity_mention_term_frequency(
        entity_mentions(docs, wikify_links(docs)), term_idfs(docs)
    )
    assert "BroadcastHashJoin" in _plan(df)


def test_wholestage_codegen_in_text_models(spark):
    from sift_spark.models.text import term_frequencies

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    df = term_frequencies(docs, max_ngram=2)
    plan = _plan(df)
    # whole pipeline is JVM expressions: no Python evaluation nodes
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # single shuffle with map-side combine; scan pruned to text
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan
    assert "ReadSchema: struct<text:string>" in plan


def test_unigram_logprob_no_cartesian_and_broadcast_total(spark):
    """The 1-row total must ride in as a broadcast nested-loop (a
    single-row join is fine); the term join must be hash-keyed, never
    a cartesian product."""
    from sift_spark.operators.text_analysis import unigram_logprob

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = _plan(unigram_logprob(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_pagerank_joins_are_keyed(spark):
    """Comention self-join and every iteration join must be keyed
    (hash/sort-merge), never a cartesian product."""
    from sift_spark.corpora.synthetic import wikify_links
    from sift_spark.models.links import entity_pagerank

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = _plan(entity_pagerank(wikify_links(docs)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
