"""SQL surface: register the corpus tables and the engine's derived
model views on a SparkSession so users can work in plain ``spark.sql``
(the reference's users script against model outputs; this exposes the
same artifacts relationally).

Views are DataFrames, so Catalyst inlines them into each query —
filters/projections over a view push down into the underlying parquet
scan exactly as if the query had been written against the operators
directly (plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sift_spark.io import TABLES, table

# view name → builder(docs_tables) for derived model views
def _links(t):
    from sift_spark.corpora.synthetic import wikify_links

    return wikify_links(t["documents"])


def _mentions(t):
    from sift_spark.corpora.synthetic import wikify_links
    from sift_spark.models.text import entity_mentions

    return entity_mentions(t["documents"], wikify_links(t["documents"]), window=2)


def _entity_counts(t):
    from sift_spark.corpora.synthetic import wikify_links
    from sift_spark.models.links import entity_counts

    return entity_counts(wikify_links(t["documents"]), min_count=1)


def _term_idfs(t):
    from sift_spark.models.text import term_idfs

    return term_idfs(t["documents"], min_df=2)


def _quality(t):
    from sift_spark.operators.text_analysis import quality_score

    return quality_score(t["documents"])


DERIVED = {
    "links": _links,
    "mentions": _mentions,
    "entity_counts": _entity_counts,
    "term_idfs": _term_idfs,
    "doc_quality": _quality,
}


def register_views(spark: SparkSession, sf_dir: str,
                   derived: bool = True) -> dict[str, DataFrame]:
    """Create temp views for every base table (``region`` …
    ``embeddings``) and, when ``derived=True``, the model views
    (``links``, ``mentions``, ``entity_counts``, ``term_idfs``,
    ``doc_quality``). Returns the name → DataFrame map."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    if derived:
        for name, build in DERIVED.items():
            df = build(out)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def register_catalog(spark: SparkSession, sf_dir: str,
                     names: list[str] | None = None) -> dict[str, DataFrame]:
    """Register EVERY registry query as a temp view under its query
    name — the plain-``spark.sql`` user gets the whole catalog
    (``SELECT * FROM dedup_minhash_lsh WHERE jaccard > 0.9`` …), not
    just the five model views. Returns the name → DataFrame map.

    Views are DataFrames, so Catalyst inlines them: filters and
    projections over a catalog view push into the underlying scans
    exactly as the operator composition would (plan-asserted on a
    sample in tests/test_sql_surface.py). Two caveats, by design:
    registering the FULL catalog runs real jobs — the eager-execution
    shingle family materializes its artifacts, and the trainer
    queries (quality_classifier's IRLS rounds, bpe/unigram training,
    Word2Vec) execute their whole driver-coordinated training at
    REGISTRATION, since their result tables ARE the trained models;
    pass ``names`` to register a cheap subset when that cost is not
    wanted up front. And a catalog name shadows a same-named DERIVED
    model view (register_views) since the registry form is the
    checked one. ``names``: optional subset to register
    (default: all)."""
    from sift_spark.queries import QUERIES

    out: dict[str, DataFrame] = {}
    for name in (names if names is not None else list(QUERIES)):
        df = QUERIES[name](spark, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call convenience: register views, run the query."""
    register_views(spark, sf_dir)
    return spark.sql(query)
