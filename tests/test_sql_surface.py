"""The plain-SQL surface: registered base + derived views answer
spark.sql queries, agree with the operator API, and keep pushdown
through the view boundary."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_sql_over_base_and_derived_views(spark):
    from sift_spark.sql import register_views

    views = register_views(spark, SF_SMOKE)
    assert {"documents", "lineitem", "links", "doc_quality"} <= set(views)

    # joins across base and derived views work in plain SQL
    got = spark.sql(
        """
        SELECT l.target, count(*) AS n
        FROM links l JOIN documents d ON l.doc_id = d.doc_id
        WHERE d.lang = 'en'
        GROUP BY l.target
        ORDER BY n DESC, l.target LIMIT 5
        """
    ).collect()
    assert got and all(r["n"] > 0 for r in got)

    # the view agrees with the operator API
    from sift_spark.models.links import entity_counts
    from sift_spark.corpora.synthetic import wikify_links
    from sift_spark.io import table

    want = {
        (r["target"], r["count"])
        for r in entity_counts(
            wikify_links(table(spark, SF_SMOKE, "documents")), min_count=1
        ).collect()
    }
    have = {
        (r["target"], r["count"])
        for r in spark.sql("SELECT target, count FROM entity_counts").collect()
    }
    assert have == want


def test_sql_views_keep_pushdown(spark):
    """A filter written in SQL against the documents view reaches the
    parquet scan (the view boundary is transparent to Catalyst)."""
    from sift_spark.sql import register_views

    register_views(spark, SF_SMOKE, derived=False)
    df = spark.sql("SELECT doc_id FROM documents WHERE doc_id = 42")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,42)]" in plan, plan
