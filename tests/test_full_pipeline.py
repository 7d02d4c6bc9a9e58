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
