"""Real-format reader smoke tests (VERDICT r5 #7).

The synthetic fixtures in test_corpora.py exercise the parsers on
minimal layouts; these fixtures are faithful slices of the PUBLIC
formats the readers target — a MediaWiki export-0.11 dump excerpt
(namespaced root, <siteinfo>, full revision metadata, infobox /
cite-ref / table / file / category / interlanguage markup, exactly
the layout of enwiki-*-pages-articles.xml; reference parity:
sift/corpora/wikipedia.py:9, wikicorpus.py:45/175/199) and a WARC/1.0
file with warcinfo / request / response / metadata records and full
HTTP header blocks (the CommonCrawl record layout; reference parity:
sift/corpora/commoncrawl.py:14/67). Both run END TO END into the
downstream models: dump → articles → native offset links →
entity_counts, and WARC → extract_main_content → lang_id /
filter_language.
"""

from __future__ import annotations

import os

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def wiki_pages(spark):
    from sift_spark.corpora.wikipedia import read_dump

    return read_dump(spark, os.path.join(DATA, "enwiki_sample.xml"))


def test_enwiki_dump_pages_and_redirects(spark, wiki_pages):
    from sift_spark.corpora.wikipedia import dump_redirects

    rows = {r.uri: r for r in wiki_pages.collect()}
    assert len(rows) == 4
    hadoop = rows["en.wikipedia.org/wiki/Apache_Hadoop"]
    assert hadoop.ns == "0" and hadoop.pid == 5919308 and hadoop.redirect is None
    assert "'''Apache Hadoop'''" in hadoop.content
    talk = rows["en.wikipedia.org/wiki/Talk:Apache_Hadoop"]
    assert talk.ns == "1"
    rds = dump_redirects(wiki_pages).collect()
    assert [(r.source, r.target) for r in rds] == [
        ("en.wikipedia.org/wiki/Map_reduce", "en.wikipedia.org/wiki/MapReduce")
    ]


def test_enwiki_dump_markup_to_text_and_links(spark, wiki_pages):
    from sift_spark.corpora.wikipedia import dump_articles

    arts = {r.uri: r for r in dump_articles(wiki_pages).collect()}
    # ns-0 non-redirect articles only
    assert sorted(arts) == [
        "en.wikipedia.org/wiki/Apache_Hadoop",
        "en.wikipedia.org/wiki/MapReduce",
    ]
    had = arts["en.wikipedia.org/wiki/Apache_Hadoop"]
    # every markup class of the real dump is gone from the plain text
    for marker in ("{{", "}}", "[[", "]]", "{|", "|}", "<!--", "<ref", "'''", "=="):
        assert marker not in had.text, marker
    # infobox/shortdesc templates dropped wholesale; refs dropped;
    # table CONTENT kept while structure dropped; categories and
    # interlanguage links removed
    assert "Infobox" not in had.text and "cite web" not in had.text
    assert "Release history" in had.text and "December 2011" in had.text
    assert "Category:" not in had.text and "de:Apache" not in had.text
    # heading text survives without the = fences
    assert "History" in had.text
    # external-link label survives without the URL brackets
    assert "Official website" in had.text and "https://" not in had.text.split("hadoop.apache.org")[0][-20:]
    # offset links: first-bold self link + piped + plain, offsets index
    # the anchor text exactly
    targets = {l.target for l in had.links}
    assert "en.wikipedia.org/wiki/Apache_Hadoop" in targets  # first-bold self
    assert "en.wikipedia.org/wiki/MapReduce" in targets
    assert "en.wikipedia.org/wiki/Open-source_software" in targets  # normalized capital
    assert "en.wikipedia.org/wiki/Big_data" in targets  # piped, underscored
    for l in had.links:
        assert had.text[l.start : l.stop].strip()
    piped = [l for l in had.links if l.target == "en.wikipedia.org/wiki/Big_data"]
    assert any(had.text[l.start : l.stop] == "big data analytics" for l in piped) or any(
        had.text[l.start : l.stop] == "big data" for l in piped
    )


def test_enwiki_dump_feeds_entity_counts_end_to_end(spark, wiki_pages):
    from sift_spark.corpora.wikipedia import article_links, dump_articles
    from sift_spark.models.links import entity_counts

    links = article_links(dump_articles(wiki_pages))
    counts = {r.target: r["count"] for r in entity_counts(links, min_count=0).collect()}
    # MapReduce: lead [[MapReduce]] + history piped link + its own
    # first-bold self link. Apache Hadoop: first-bold self + the
    # table-cell [[Apache Hadoop|2.0]] (cell CONTENT survives table
    # stripping by design) + the MapReduce article's lead link
    assert counts["en.wikipedia.org/wiki/MapReduce"] == 3
    assert counts["en.wikipedia.org/wiki/Apache_Hadoop"] == 3
    assert counts["en.wikipedia.org/wiki/Apache_Spark"] == 2  # see-also + MR article


@pytest.fixture(scope="module")
def warc_df(spark):
    from sift_spark.corpora.warc import read_warc

    return read_warc(spark, os.path.join(DATA, "crawl_sample.warc"))


def test_warc_response_records_parsed(spark, warc_df):
    rows = {r.url: r for r in warc_df.collect()}
    # 200 responses only: warcinfo/request/metadata and the 404 drop
    assert sorted(rows) == [
        "https://beispiel.de/handbuch",
        "https://example.org/articles/stream-processing",
    ]
    en = rows["https://example.org/articles/stream-processing"]
    assert "HTTP/1.1 200 OK" in en.headers and "nginx" in en.headers
    assert en.payload.startswith("<!DOCTYPE html>")
    assert "</html>" in en.payload


def test_warc_boilerplate_removal_and_lang_id_end_to_end(spark, warc_df):
    from pyspark.sql import functions as F

    from sift_spark.corpora.warc import filter_language, warc_articles
    from sift_spark.operators.text_analysis import lang_id

    arts = {r.uri: r for r in warc_articles(warc_df).collect()}
    en = arts["https://example.org/articles/stream-processing"]
    # nav/footer link clouds dropped, prose kept, scripts/styles gone
    assert "stream processing engine" in en.text
    assert "Privacy" not in en.text and "Sitemap" not in en.text
    assert "About" not in en.text
    assert "function nav" not in en.text and "font: 14px" not in en.text
    # the in-article anchor survives as an offset link
    assert [l.target for l in en.links] == ["https://example.org/spark"]
    [l] = en.links
    assert en.text[l.start : l.stop] == "Spark documentation"

    articles = warc_articles(warc_df)
    ided = {
        r.doc_id: r.lang_pred
        for r in lang_id(
            articles.select(F.col("uri").alias("doc_id"), "text")
        ).collect()
    }
    assert ided["https://example.org/articles/stream-processing"] == "en"
    assert ided["https://beispiel.de/handbuch"] == "de"
    kept = filter_language(articles, "en").collect()
    assert [r.uri for r in kept] == ["https://example.org/articles/stream-processing"]
