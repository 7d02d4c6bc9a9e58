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


def test_register_catalog_covers_every_registry_query(spark):
    """Round-8: the plain-SQL user gets the WHOLE catalog — one temp
    view per queries() entry, each queryable via spark.sql, with
    pushdown through a sampled catalog view asserted."""
    from sift_spark.queries import QUERIES
    from sift_spark.sql import register_catalog, register_views

    register_views(spark, SF_SMOKE, derived=False)
    out = register_catalog(spark, SF_SMOKE)
    assert len(out) == len(QUERIES)
    # spot-run a few through pure SQL (cheap, varied families)
    assert spark.sql("SELECT * FROM lang_id").count() > 0
    assert spark.sql(
        "SELECT doc1, doc2 FROM dedup_minhash_lsh WHERE jaccard >= 0.8"
    ).count() >= 0
    row = spark.sql(
        "SELECT status, count(*) AS n FROM profile_drift GROUP BY status ORDER BY status"
    ).collect()
    assert {r["status"] for r in row} == {"added", "kept", "removed"}
    # pushdown through a catalog view: pii_redact is a pure map-side
    # projection over the RAW documents scan (not the cached token
    # artifact), so a doc_id filter written in SQL must reach the
    # parquet scan through the view boundary
    plan = (
        spark.sql("SELECT doc_id FROM pii_redact WHERE doc_id = 42")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,42)]" in plan, plan
