"""Sentence segmentation + Wikipedia article→model-layer adapter."""

from __future__ import annotations

from pyspark.sql import Row


def test_sentence_segmentation(spark):
    from sift_spark.functions.sentences import explode_sentences

    df = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                text="Dr. Smith works at Acme Inc. in town. He founded it in 1999! Really?\nNew line sentence",
            )
        ]
    )
    sents = [r.sentence for r in explode_sentences(df).orderBy("sent_idx").collect()]
    # "Inc." does not split; ".", "!", "?" and newline do
    assert sents == [
        "Dr. Smith works at Acme Inc. in town.",
        "He founded it in 1999!",
        "Really?",
        "New line sentence",
    ]


def test_wikipedia_links_feed_models(spark, tmp_path):
    from sift_spark.corpora.wikipedia import article_links, dump_articles, read_dump
    from sift_spark.models.links import entity_counts, entity_inlinks

    xml = """<mediawiki>
  <page>
    <title>A</title><ns>0</ns><id>1</id>
    <revision><text>'''A''' links [[B|to b]] and [[C]] and [[B]].</text></revision>
  </page>
  <page>
    <title>D</title><ns>0</ns><id>2</id>
    <revision><text>'''D''' also links [[B]].</text></revision>
  </page>
</mediawiki>"""
    p = tmp_path / "dump.xml"
    p.write_text(xml)
    links = article_links(dump_articles(read_dump(spark, str(p))))
    # anchors reconstructed from char offsets match the link text
    anchors = {(r.target, r.anchor) for r in links.collect()}
    assert ("en.wikipedia.org/wiki/B", "to b") in anchors
    assert ("en.wikipedia.org/wiki/C", "C") in anchors
    counts = {r.target: r["count"] for r in entity_counts(links, min_count=0).collect()}
    assert counts["en.wikipedia.org/wiki/B"] == 3
    inl = {r.target: r.n_inlinks for r in entity_inlinks(links).collect()}
    assert inl["en.wikipedia.org/wiki/B"] == 2  # A and D both link B
