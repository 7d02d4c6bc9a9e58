"""End-to-end sift workflow: Wikipedia dump → redirects → articles →
normalized links → every model family → sink. The reference's whole
reason to exist, as one integration flow."""

from __future__ import annotations

import gzip
import glob
import json

WIKI_XML = """<mediawiki>
  <page>
    <title>Apache Spark</title>
    <ns>0</ns>
    <id>1</id>
    <revision><text>'''Apache Spark''' is an engine. It runs [[MapReduce|map reduce]] and beats [[Hadoop]]. See [[Apache Hadoop|Hadoop]] again.</text></revision>
  </page>
  <page>
    <title>Hadoop</title>
    <ns>0</ns>
    <id>2</id>
    <redirect title="Apache Hadoop" />
    <revision><text>#REDIRECT [[Apache Hadoop]]</text></revision>
  </page>
  <page>
    <title>Apache Hadoop</title>
    <ns>0</ns>
    <id>3</id>
    <revision><text>'''Apache Hadoop''' stores data. It predates [[Apache Spark]].</text></revision>
  </page>
</mediawiki>
"""


def test_dump_to_models_to_sink(spark, tmp_path):
    from sift_spark.corpora.redirects import redirect_links, resolve_transitive
    from sift_spark.corpora.wikipedia import (
        article_links,
        dump_articles,
        dump_redirects,
        read_dump,
    )
    from sift_spark.models.links import entity_counts, entity_inlinks, entity_vocab
    from sift_spark.models.text import sentence_mentions
    from sift_spark.sinks.formats import to_json_lines, write_text

    dump = tmp_path / "dump.xml"
    dump.write_text(WIKI_XML)

    pages = read_dump(spark, str(dump))
    rds = resolve_transitive(dump_redirects(pages))
    articles = dump_articles(pages)
    links = redirect_links(article_links(articles), rds)

    # the [[Hadoop]] link must resolve through the redirect
    counts = {r.target: r["count"] for r in entity_counts(links, min_count=0).collect()}
    # direct [[Apache Hadoop|Hadoop]] + redirect-resolved [[Hadoop]]
    # + the Hadoop page's own first-bold self link
    assert counts["en.wikipedia.org/wiki/Apache_Hadoop"] == 3
    assert counts["en.wikipedia.org/wiki/Apache_Spark"] == 2   # self-bold + backlink
    assert "en.wikipedia.org/wiki/Hadoop" not in counts        # fully rewritten

    inl = {r.target: r.n_inlinks for r in entity_inlinks(links).collect()}
    assert inl["en.wikipedia.org/wiki/Apache_Hadoop"] == 2     # Spark page + itself

    vocab = entity_vocab(links, 0, 100)
    assert vocab.count() >= 3

    mentions = sentence_mentions(articles, window=1)
    assert mentions.count() > 0

    out = str(tmp_path / "model_out")
    write_text(to_json_lines(entity_counts(links, min_count=0)), out)
    lines = []
    for f in glob.glob(out + "/part-*.txt.gz"):
        lines += gzip.open(f, "rt").read().splitlines()
    parsed = {json.loads(l)["target"]: json.loads(l)["count"] for l in lines}
    assert parsed == counts


def test_training_data_pipeline(spark, tmp_path):
    """End-to-end LLM training-data path: quality/repetition/dedup
    filter → near-dup removal → DSIR selection → sequence packing →
    deterministic shard export. Every stage is an already-[q]/[t]-
    checked operator; this asserts the COMPOSITION holds (row
    accounting, determinism across reruns)."""
    import glob

    from pyspark.sql import functions as F

    from sift_spark.operators.dedup import dedup_apply
    from sift_spark.operators.sampling import (
        dsir_importance_weights,
        pack_sequences,
    )
    from sift_spark.operators.scale import write_training_shards
    from sift_spark.operators.text_analysis import filtered_corpus
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")

    # 1. heuristic filter (exact-dedup + quality + repetition)
    kept = filtered_corpus(docs, min_tokens=10, min_score=0.3)
    n_kept = kept.count()
    assert 0 < n_kept <= docs.count()

    # 2. near-dup removal over the survivors
    survivors = dedup_apply(docs.join(kept.select("doc_id"), "doc_id"))
    n_surv = survivors.count()
    assert 0 < n_surv <= n_kept

    # 3. DSIR selection toward English over the surviving docs
    surv_docs = docs.join(survivors.select("doc_id"), "doc_id")
    selected = dsir_importance_weights(surv_docs, target_lang="en", k=n_surv // 2)
    n_sel = selected.count()
    assert n_sel == n_surv // 2

    # 4. pack into ~512-token bins
    packed = pack_sequences(
        kept.join(selected.select("doc_id"), "doc_id"), max_tokens=512
    )
    rows = packed.collect()
    assert len(rows) == n_sel
    assert all(r.bin_offset < 512 for r in rows)

    # 5. deterministic shard export — two runs, identical bytes-level
    # row placement
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    final = surv_docs.join(selected.select("doc_id"), "doc_id")
    write_training_shards(final, out1, n_shards=2)
    write_training_shards(final.repartition(7), out2, n_shards=2)
    a = [sorted(r.doc_id for r in spark.read.parquet(f).collect())
         for f in sorted(glob.glob(f"{out1}/part-*.parquet"))]
    b = [sorted(r.doc_id for r in spark.read.parquet(f).collect())
         for f in sorted(glob.glob(f"{out2}/part-*.parquet"))]
    assert a == b, "shard membership must be layout-invariant"
