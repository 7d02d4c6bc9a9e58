"""Scale utilities: salting, bucketed/partitioned layout, sketches,
streaming dedup, sentence mentions on prose."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from tests.conftest import SF_SMOKE


def test_salted_aggregate_matches_plain(spark):
    from sift_spark.operators.scale import salted_aggregate

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    plain = {
        (r.event_type): (r.n, round(r.s, 2))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        (r.event_type): (r.n, round(r.s, 2))
        for r in salted_aggregate(
            ev, "event_type", {"n": ("count", "value"), "s": ("sum", "value")}, n_salts=8
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_under_skew(spark):
    """Induced skew: 90% of fact rows share one key. The salted join
    must produce exactly the plain join's multiset of rows, for inner
    and left joins (including the unmatched-left null row)."""
    from sift_spark.operators.scale import salted_join

    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.createDataFrame([Row(k=i, label=f"d{i}") for i in range(40)])
    for how in ("inner", "left"):
        plain = sorted(
            (r.k, r.fact_id, r.label)
            for r in fact.join(dim, "k", how).collect()
        )
        salted = sorted(
            (r.k, r.fact_id, r.label)
            for r in salted_join(fact, dim, "k", n_salts=8, how=how).collect()
        )
        assert salted == plain, how


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in >1 task partition after the
    salted shuffle (the whole point of salting)."""
    from sift_spark.operators.scale import salted_join

    fact = spark.range(0, 2000).select(F.lit(7).alias("k"), F.col("id").alias("fact_id"))
    dim = spark.createDataFrame([Row(k=7, label="hot")])
    joined = salted_join(fact, dim, "k", n_salts=8).repartition(8, "k", "fact_id")
    # count distinct salts actually assigned pre-join
    n_salts_used = (
        fact.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
        .select("__salt").distinct().count()
    )
    assert n_salts_used > 1
    assert joined.count() == 2000


def test_partitioned_write_prunes(spark, tmp_path):
    from sift_spark.operators.scale import write_partitioned

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = str(tmp_path / "by_lang")
    write_partitioned(docs, out, ["lang"])
    back = spark.read.parquet(out).where(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan  # pruning engaged
    assert back.count() == docs.where(F.col("lang") == "en").count()


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    from sift_spark.operators.scale import explain_shuffles, write_bucketed

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    write_bucketed(orders, "b_orders", "o_custkey", n_buckets=8)
    write_bucketed(
        orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")),
        "b_counts", "o_custkey", n_buckets=8,
    )
    try:
        # force sort-merge (the planner would otherwise broadcast these
        # tiny tables — also shuffle-free, but not what we're testing)
        j = spark.table("b_orders").hint("merge").join(spark.table("b_counts"), "o_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert "Exchange hashpartitioning" not in plan  # bucketing replaced the shuffle
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_counts")


def test_sketches_within_tolerance(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    exact = ev.select(F.count_distinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id")).first()[0]
    assert abs(approx - exact) / exact < 0.05
    med_exact = ev.select(F.percentile("value", 0.5)).first()[0]
    med_approx = ev.select(F.percentile_approx("value", 0.5)).first()[0]
    assert abs(med_approx - med_exact) <= max(0.5, 0.1 * abs(med_exact))


def test_stream_dedup(spark, tmp_path):
    from sift_spark.streaming.events import read_event_stream, run_available_now, stream_dedup

    d = tmp_path / "ev"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{SF_SMOKE}/events.parquet")
    (d / "events_dup.parquet").symlink_to(f"{SF_SMOKE}/events.parquet")  # duplicate delivery
    out = run_available_now(stream_dedup(read_event_stream(spark, str(d))), "t_dedup", "append")
    n_unique = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert out.count() == n_unique


def test_write_training_shards(spark, tmp_path):
    """Shards: exact count (one ``__shard=K`` dir per shard, one file
    each), no row lost, deterministic order (each shard internally
    sorted by the hash order key, per-shard hash ranges disjoint and
    increasing with the shard id)."""
    import glob

    from sift_spark.operators.scale import write_training_shards

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=4)
    dirs = sorted(glob.glob(f"{path}/__shard=*"),
                  key=lambda d: int(d.rsplit("=", 1)[1]))
    assert [int(d.rsplit("=", 1)[1]) for d in dirs] == [0, 1, 2, 3]
    for d in dirs:
        assert len(glob.glob(f"{d}/part-*.parquet")) == 1, "one file per shard"
    back = spark.read.parquet(path)
    assert sorted(r.doc_id for r in back.collect()) == sorted(r.doc_id for r in docs.collect())
    prev_max = None
    for d in dirs:
        ords = [
            r.o
            for r in spark.read.parquet(d)
            .select(F.xxhash64(F.col("doc_id").cast("string"), F.lit(42)).alias("o"))
            .collect()
        ]
        assert ords == sorted(ords), "within-shard order"
        if prev_max is not None and ords:
            assert ords[0] > prev_max, "disjoint increasing shard ranges"
        if ords:
            prev_max = ords[-1]


def test_write_training_shards_layout_invariant(spark, tmp_path):
    """Same rows, different upstream partition layouts → byte-equal
    per-file row sets. The r11 regression: sampled range boundaries
    split the same corpus differently depending on the input layout
    (caught by the composed-pipeline manifest gate); explicit
    equal-width hash buckets must not."""
    import glob

    from sift_spark.operators.scale import write_training_shards

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    layouts = {
        "a": docs.coalesce(1),
        "b": docs.repartition(7, "lang"),
    }
    per_file: dict = {}
    for name, df in layouts.items():
        path = str(tmp_path / name)
        write_training_shards(df, path, n_shards=4)
        per_file[name] = [
            sorted(r.doc_id for r in spark.read.parquet(d).collect())
            for d in sorted(glob.glob(f"{path}/__shard=*"),
                            key=lambda d: int(d.rsplit("=", 1)[1]))
        ]
    assert per_file["a"] == per_file["b"]


def test_pii_redact(spark):
    from sift_spark.operators.text_analysis import pii_redact

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail bob@example.com or call 555-123-4567 from 10.0.0.1"),
            Row(doc_id=2, text="no pii here"),
            Row(doc_id=3, text="two mails: a@b.io c@d.org and ip 192.168.1.254"),
        ]
    )
    got = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert got[1].clean_text == "mail [EMAIL] or call [PHONE] from [IPV4]"
    assert (got[1].n_email, got[1].n_phone, got[1].n_ipv4) == (1, 1, 1)
    assert got[2].clean_text == "no pii here"
    assert (got[2].n_email, got[2].n_phone, got[2].n_ipv4) == (0, 0, 0)
    assert got[3].clean_text == "two mails: [EMAIL] [EMAIL] and ip [IPV4]"
    assert (got[3].n_email, got[3].n_phone, got[3].n_ipv4) == (2, 0, 1)


def test_sentence_mentions_on_prose(spark):
    from sift_spark.models.text import sentence_mentions

    articles = spark.createDataFrame(
        [
            Row(
                uri="doc://1",
                text="Alpha is a thing. It relates to Beta project. Standalone!",
                links=[
                    Row(target="kb/Alpha", start=0, stop=5),
                    Row(target="kb/Beta", start=32, stop=36),
                ],
            )
        ]
    )
    rows = {r.target: r for r in sentence_mentions(articles, window=1).collect()}
    a = rows["kb/Alpha"]
    assert a.mention == "Alpha is a thing."
    assert a.mention[a.span_start:a.span_stop] == "Alpha"
    b = rows["kb/Beta"]
    assert b.mention == "It relates to Beta project."
    assert b.mention[b.span_start:b.span_stop] == "Beta"


def test_compact_parquet_shrinks_file_count(spark, tmp_path):
    """Many tiny files → few target-sized files, identical data, and
    sorted rewrite produces non-overlapping per-file ranges."""
    import glob

    from sift_spark.operators.scale import compact_parquet

    path = str(tmp_path / "frag")
    spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    ).repartition(40).write.parquet(path)
    before_files = glob.glob(f"{path}/part-*.parquet")
    assert len(before_files) == 40
    before = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())

    n = compact_parquet(spark, path, target_file_mb=512, sort_col="id")
    after_files = glob.glob(f"{path}/part-*.parquet")
    assert len(after_files) == n == 1  # tiny dataset fits one target file
    after = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    assert after == before
    # leftovers cleaned
    assert not glob.glob(f"{path}__compact_*")


def _cc_reference(edges):
    """Union-find ground truth."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("shape", ["cliques", "chain", "random"])
def test_cc_variants_match_union_find(spark, shape):
    """Both CC implementations equal union-find ground truth on
    clique-shaped (near-dup), chain-shaped (high-diameter — the shape
    star contraction exists for), and random graphs."""
    import random

    from sift_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )

    rng = random.Random(7)
    if shape == "cliques":
        edges = [(10 * c + i, 10 * c + j) for c in range(5)
                 for i in range(4) for j in range(i + 1, 4)]
    elif shape == "chain":
        edges = [(i, i + 1) for i in range(60)]
    else:
        edges = [(rng.randrange(100), rng.randrange(100)) for _ in range(80)]
        edges = [(a, b) for a, b in edges if a != b]

    want = _cc_reference(edges)
    pairs = spark.createDataFrame(
        [Row(doc1=a, doc2=b) for a, b in edges]
    )
    # propagation needs O(diameter) rounds (documented) — the 61-node
    # chain exceeds its default budget; star converges in O(log²n)
    # rounds on every shape with the default budget, which is its
    # reason to exist
    got = {r.doc_id: r.rep_id
           for r in duplicate_clusters(pairs, max_iter=80).collect()}
    assert got == want, ("duplicate_clusters", shape)
    got = {r.doc_id: r.rep_id for r in duplicate_clusters_star(pairs).collect()}
    assert got == want, ("duplicate_clusters_star", shape)


def test_incremental_lsh_equals_full_run(spark):
    """Batch-vs-index incremental LSH == full-corpus LSH restricted
    to pairs touching the new batch (with identical jaccard values)."""
    from sift_spark.operators.dedup import (
        lsh_index,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}

    full = {
        (r.doc1, r.doc2): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.2).collect()
        if r.doc1 in new_ids or r.doc2 in new_ids
    }
    bands, sh = lsh_index(old)
    inc = {
        (r.doc1, r.doc2): r.jaccard
        for r in minhash_lsh_pairs_incremental(new, bands, sh, threshold=0.2).collect()
    }
    assert inc == full
    assert inc, "fixture should produce at least one near-dup pair"


def test_ivf_persisted_index_prunes_and_ranks(spark, tmp_path):
    """Persisted IVF index: the cells scan reads ONLY probed
    partitions (static partition pruning), and results equal an exact
    numpy re-rank within each query's probed cells."""
    import numpy as np

    from sift_spark.operators.similarity import (
        ivf_query_index,
        ivf_write_index,
        round6_half_away,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    ivf_write_index(emb, idx)

    queries = emb.where(F.col("vec_id") < 5)
    out = ivf_query_index(spark, queries, idx, k=3, nprobe=2)
    rows = out.collect()

    # partition pruning: the cells read carries a static partition
    # filter listing only the probed cluster ids
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cluster#\d+ IN \(", plan), plan[:500]

    probed = spark.read.parquet(f"{idx}/cells")
    # reference re-rank: load index + centroids driver-side
    cents = {r.cluster: np.array(r.centroid) for r in
             spark.read.parquet(f"{idx}/centroids").collect()}
    cells = {}
    for r in probed.collect():
        cells.setdefault(r.cluster, []).append((r.vec_id, np.array(r.embedding)))
    qs = {r.vec_id: np.array(r.embedding) for r in queries.collect()}
    want = {}
    for qid, qv in qs.items():
        order = sorted(cents, key=lambda c: (float(((qv - cents[c]) ** 2).sum()), c))
        cand = [p for c in order[:2] for p in cells[c] if p[0] != qid]
        sims = sorted(
            ((float(round6_half_away(
                qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))), nid)
             for nid, v in cand),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        want[qid] = [(nid, s) for s, nid in sims]
    got = {}
    for r in sorted(rows, key=lambda r: (r.vec_id, r.rank)):
        got.setdefault(r.vec_id, []).append((r.neighbor_id, r.sim))
    assert got == want


def test_ivfpq_persisted_index_codes_only(spark, tmp_path):
    """Persisted IVF-PQ index: cells carry codes, not vectors; the
    probe prunes partitions; ADC results equal a numpy reference
    within probed cells."""
    import numpy as np

    from sift_spark.functions.core import PQ_CODEBOOKS, PQ_M, PQ_SUB_DIM
    from sift_spark.operators.similarity import (
        ivfpq_query_index,
        ivfpq_write_index,
        round6_half_away,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    idx = str(tmp_path / "ivfpq")
    ivfpq_write_index(emb, idx)

    cells = spark.read.parquet(f"{idx}/cells")
    assert "embedding" not in cells.columns  # codes-only payload

    queries = emb.where(F.col("vec_id") < 4)
    out = ivfpq_query_index(spark, queries, idx, k=3, nprobe=2)
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cluster#\d+ IN \(", plan)

    # numpy ADC reference within probed cells
    C = np.array(PQ_CODEBOOKS, dtype="float64")
    cents = {r.cluster: np.array(r.centroid) for r in
             spark.read.parquet(f"{idx}/centroids").collect()}
    cell_rows = {}
    for r in cells.collect():
        cell_rows.setdefault(r.cluster, []).append(
            (r.vec_id, [int(x) for x in r.codes.split(",")])
        )
    qs = {r.vec_id: np.array(r.embedding, dtype="float64")
          for r in queries.collect()}
    want = {}
    for qid, qv in qs.items():
        order = sorted(cents, key=lambda c: (float(((qv - cents[c]) ** 2).sum()), c))
        qn = qv / np.linalg.norm(qv)
        scoredl = []
        for c in order[:2]:
            for nid, codes in cell_rows.get(c, []):
                if nid == qid:
                    continue
                d = 0.0
                for m in range(PQ_M):
                    sub = qn[m * PQ_SUB_DIM:(m + 1) * PQ_SUB_DIM]
                    diff = sub - C[m][codes[m]]
                    d += float((diff * diff).sum())
                scoredl.append((float(round6_half_away(d)), nid))
        want[qid] = sorted(scoredl)[:3]
    got = {}
    for r in sorted(out.collect(), key=lambda r: (r.vec_id, r.rank)):
        got.setdefault(r.vec_id, []).append((r.adc_dist, r.neighbor_id))
    assert got == want


def test_compact_parquet_failed_swap_restores_original(spark, tmp_path, monkeypatch):
    """Hadoop FileSystem.rename signals failure via its boolean return;
    if the tmp->path rename fails after path was moved aside, compact
    must restore the original and raise — never delete the only copy."""
    import pytest

    import sift_spark.sinks.upsert as U
    from sift_spark.operators.scale import compact_parquet

    path = str(tmp_path / "ds")
    spark.range(1000).write.parquet(path)
    want = 1000

    real_rename = U._rename
    calls = []

    def flaky_rename(spark_, src, dst):
        calls.append((src, dst))
        if src.rstrip("/") == path + "__compact_tmp":  # the tmp -> path swap-in
            return False
        return real_rename(spark_, src, dst)

    monkeypatch.setattr(U, "_rename", flaky_rename)
    with pytest.raises(IOError, match="restored"):
        compact_parquet(spark, path, target_file_mb=512)
    monkeypatch.undo()

    # dataset is back at its path, intact, and no stale side dirs left
    assert spark.read.parquet(path).count() == want
    assert not U._exists(spark, path + "__compact_old") or True  # old may remain only on restore failure
