"""Incremental maintenance: slice-merge equals full recompute;
stream-static enrichment joins."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from tests.conftest import SF_SMOKE


def test_merge_counts_equals_full_recompute(spark):
    from sift_spark.corpora.synthetic import wikify_links
    from sift_spark.models.links import entity_counts
    from sift_spark.operators.incremental import merge_counts

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    half1 = docs.where(F.col("doc_id") % 2 == 0)
    half2 = docs.where(F.col("doc_id") % 2 == 1)
    # min_count=0 on the slices: thresholds apply after merging
    c1 = entity_counts(wikify_links(half1), min_count=0)
    c2 = entity_counts(wikify_links(half2), min_count=0)
    merged = merge_counts(c1, c2, ["target"], ["count"]).where(F.col("count") > 1)
    full = entity_counts(wikify_links(docs), min_count=1)
    assert {(r.target, r["count"]) for r in merged.collect()} == {
        (r.target, r["count"]) for r in full.collect()
    }


def test_upsert_latest(spark):
    from sift_spark.operators.incremental import upsert_latest

    old = spark.createDataFrame(
        [Row(k="a", v="old-a", ver=1), Row(k="b", v="old-b", ver=5)]
    )
    delta = spark.createDataFrame(
        [Row(k="a", v="new-a", ver=2), Row(k="b", v="stale-b", ver=5), Row(k="c", v="new-c", ver=1)]
    )
    out = {r.k: r.v for r in upsert_latest(old, delta, ["k"], "ver").collect()}
    # a: delta newer; b: tie -> delta wins; c: insert
    assert out == {"a": "new-a", "b": "stale-b", "c": "new-c"}


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static join: streaming events enriched with a static
    per-user profile (the standard dimension-enrichment pattern)."""
    from sift_spark.streaming.events import read_event_stream, run_available_now

    d = tmp_path / "ev"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{SF_SMOKE}/events.parquet")
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    profile = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("lifetime_events"))

    stream = read_event_stream(spark, str(d))
    enriched = stream.join(profile, "user_id")  # stream-static join
    out = run_available_now(
        enriched.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.max("lifetime_events").alias("le")
        ),
        "t_enrich",
    )
    rows = out.collect()
    assert rows and all(r.n == r.le for r in rows)  # every event matched its profile


def test_scd2_merge_semantics(spark):
    """SCD2 merge: attribute changes open versions, duplicates are
    no-ops, closed history never rewrites, untouched keys pass
    through, brand-new keys create history."""
    from pyspark.sql import Row

    from sift_spark.operators.incremental import scd2_merge

    history = spark.createDataFrame(
        [
            # key 1: one closed + one open row
            Row(k=1, plan="free", valid_from=100, valid_to=200),
            Row(k=1, plan="pro", valid_from=200, valid_to=None),
            # key 2: untouched by the batch
            Row(k=2, plan="free", valid_from=150, valid_to=None),
        ]
    )
    updates = spark.createDataFrame(
        [
            Row(k=1, plan="pro", ts=250),        # duplicate of current → no-op
            Row(k=1, plan="enterprise", ts=300),  # real change
            Row(k=3, plan="free", ts=400),        # brand-new key
        ]
    )
    out = scd2_merge(history, updates, ["k"], ["plan"])
    rows = {(r.k, r.plan, r.valid_from): r.valid_to for r in out.collect()}
    assert rows == {
        (1, "free", 100): 200,            # closed row untouched
        (1, "pro", 200): 300,             # open row closed at the change
        (1, "enterprise", 300): None,     # new open version
        (2, "free", 150): None,           # untouched key passes through
        (3, "free", 400): None,           # new key opens history
    }
    # replaying the same batch is a no-op
    again = scd2_merge(out, updates, ["k"], ["plan"])
    assert {(r.k, r.plan, r.valid_from): r.valid_to for r in again.collect()} == rows


def test_snapshot_delta_classifies_all_change_kinds(spark):
    from sift_spark.operators.incremental import snapshot_delta

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (4, "d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["change"] for r in snapshot_delta(old, new).collect()}
    assert got == {1: "unchanged", 2: "updated", 3: "deleted", 4: "added"}


def test_term_drift_direction_and_noise_floor(spark):
    from sift_spark.operators.incremental import term_drift

    old = spark.createDataFrame(
        [(1, "alpha alpha alpha beta"), (2, "alpha beta beta gamma")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha beta beta beta"), (2, "beta beta delta delta delta")],
        "doc_id long, text string",
    )
    rows = {r["term"]: r for r in term_drift(old, new, min_total=3).collect()}
    # gamma (1+0) and alpha-drop side terms below the floor are pruned
    assert "gamma" not in rows
    assert rows["alpha"]["log_ratio"] < 0      # 4 -> 1
    assert rows["beta"]["log_ratio"] > 0       # 3 -> 5
    assert rows["delta"]["c_old"] == 0 and rows["delta"]["log_ratio"] > 0
    assert rows["beta"]["rate_old"] == round(3 * 1e6 / 8, 6)
    assert rows["beta"]["rate_new"] == round(5 * 1e6 / 9, 6)
