"""Multi-word name_part_counts semantics, URL normalization, model
save/load round-trip."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from tests.conftest import SF_SMOKE


def test_name_part_counts_multiword_anchors(spark):
    from sift_spark.models.links import name_part_counts

    # anchors: "new york" (×2), "york" (×1); corpus tokens make O counts
    links = spark.createDataFrame(
        [
            Row(doc_id=1, pos=0, anchor="new york", target="wiki/NY"),
            Row(doc_id=2, pos=0, anchor="new york", target="wiki/NY"),
            Row(doc_id=3, pos=0, anchor="york", target="wiki/York"),
        ]
    )
    toks = spark.createDataFrame(
        [Row(doc_id=i, pos=p, anchor=t) for i, (p, t) in enumerate(
            [(0, "new"), (1, "new"), (2, "york"), (3, "york"), (4, "new york")] * 2
        )]
    )
    out = {(r.term, r.spantype): r["count"] for r in name_part_counts(links, toks, max_ngram=2).collect()}
    # "new": B of the unigram partition of "new york" ×2 — never E or I
    assert out[("new", "B")] == 2 and ("new", "E") not in out and ("new", "I") not in out
    # "york": E ×2 (from "new york") + B&E ×1 (single-part anchor "york")
    assert out[("york", "E")] == 3 and out[("york", "B")] == 1
    # bigram partition of "new york" has ONE part -> B and E, not I
    assert ("new york", "I") not in out
    assert out[("new york", "B")] == 2 and out[("new york", "E")] == 2


def test_url_normalization(spark):
    from sift_spark.functions.urls import normalize_target

    df = spark.createDataFrame(
        [
            Row(t="https://en.wikipedia.org/wiki/Spark#History"),
            Row(t="en.wikipedia.org/wiki/Plain"),
            Row(t="http://x.test/page#frag#frag2"),
        ]
    )
    got = [r.n for r in df.select(normalize_target(F.col("t")).alias("n")).collect()]
    assert got == [
        "en.wikipedia.org/wiki/Spark",
        "en.wikipedia.org/wiki/Plain",
        "x.test/page",
    ]


def test_model_save_load_roundtrip(spark, tmp_path):
    """Model outputs persist as parquet and json-lines and read back
    identically (reference dataset.py:18-23 save/load contract)."""
    from sift_spark.corpora.synthetic import wikify_links
    from sift_spark.models.links import entity_counts
    from sift_spark.sinks.formats import to_json_lines, write_text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = entity_counts(wikify_links(docs))
    want = {(r.target, r["count"]) for r in model.collect()}

    pq = str(tmp_path / "m.parquet")
    model.write.mode("overwrite").parquet(pq)
    assert {(r.target, r["count"]) for r in spark.read.parquet(pq).collect()} == want

    js = str(tmp_path / "m.json")
    write_text(to_json_lines(model), js, compression=None)
    back = spark.read.json(js)
    assert {(r.target, r["count"]) for r in back.collect()} == want


def test_entity_pagerank_mass_and_order(spark):
    """PageRank mass is conserved (sums to 1) and the hub of a star
    outranks the leaves."""
    from pyspark.sql import Row

    from sift_spark.models.links import entity_pagerank

    links = spark.createDataFrame(
        [
            Row(doc_id=1, target="A"),
            Row(doc_id=1, target="B"),
            Row(doc_id=2, target="A"),
            Row(doc_id=2, target="C"),
        ]
    )
    pr = {r.entity: r.pagerank for r in entity_pagerank(links).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-4
    assert pr["A"] > pr["B"] == pr["C"]


def test_build_cli_smoke(spark, capsys):
    """CLI builder resolves reference-named and pipeline-named models
    and prints samples (shares the test session via get_spark
    memoization)."""
    from sift_spark.build import main

    for model in ("EntityCounts", "DedupApply", "UnigramLogprob"):
        assert main([model, "--input", SF_SMOKE, "--sample", "2"]) == 0
        assert capsys.readouterr().out.strip()


def test_entity_link_prediction_adamic_adar(spark):
    """Hand-built sparse graph: docs comention entities so that A-C
    share the common neighbor B without being comentioned themselves;
    AA(A,C) = 1/ln(deg B). (The synthetic test corpus's 10-entity
    lexicon yields a complete comention graph — no missing links to
    predict — so the operator is verified on a constructed graph; on
    real corpora the entity graph is sparse.)"""
    import math

    from pyspark.sql import functions as F

    from sift_spark.models.links import entity_link_prediction

    # doc1: A,B  doc2: B,C  doc3: C,D — edges A-B, B-C, C-D
    rows = []
    for d, (x, y) in enumerate([("A", "B"), ("B", "C"), ("C", "D")], 1):
        rows += [(d, x), (d, y)]
    links = spark.createDataFrame(rows, "doc_id long, target string")
    got = {
        (r.e1, r.e2): (r.n_common, r.aa_score)
        for r in entity_link_prediction(links).collect()
    }
    # predictions: A-C via B (deg 2), B-D via C (deg 2); A-D share none
    w = round(1.0 / math.log(2), 6)
    assert got == {("A", "C"): (1, w), ("B", "D"): (1, w)}


def test_node2vec_bias_suppresses_backtracking(spark):
    """On a 4-cycle with p = 2^30 (return weight ~0) and q = 1, a walk
    at B that came from A must continue to C — never immediately
    backtrack. entity_random_walks has no such bias, so this pins the
    second-order semantics specifically."""
    from sift_spark.models.links import entity_node2vec_walks

    # docs comention consecutive cycle nodes: A-B, B-C, C-D, D-A
    rows = []
    for d, (x, y) in enumerate([("A", "B"), ("B", "C"), ("C", "D"), ("D", "A")], 1):
        rows += [(d, x), (d, y)]
    links = spark.createDataFrame(rows, "doc_id long, target string")
    walks = entity_node2vec_walks(
        links, p=float(2 ** 30), q=1.0, n_walks=4, walk_len=5
    ).collect()
    assert walks
    for r in walks:
        path = r.path.split(",")
        assert len(path) == 6
        for i in range(2, len(path)):
            assert path[i] != path[i - 2], (r.walk_id, r.path)
