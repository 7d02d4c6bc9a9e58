"""Corpora readers: Wikipedia XML, Wikidata JSON, WARC, redirects."""

from __future__ import annotations

import os

import pytest

WIKI_XML = """<mediawiki>
  <page>
    <title>Apache Spark</title>
    <ns>0</ns>
    <id>1</id>
    <revision><text>'''Apache Spark''' is an engine. {{Infobox|x=1}} It powers [[MapReduce|map reduce]] jobs and [[Hadoop]].&lt;!--c--&gt;</text></revision>
  </page>
  <page>
    <title>Spark</title>
    <ns>0</ns>
    <id>2</id>
    <redirect title="Apache Spark" />
    <revision><text>#REDIRECT [[Apache Spark]]</text></revision>
  </page>
  <page>
    <title>Talk:Apache Spark</title>
    <ns>1</ns>
    <id>3</id>
    <revision><text>talk page</text></revision>
  </page>
</mediawiki>
"""


@pytest.fixture(scope="module")
def wiki_dump(tmp_path_factory):
    p = tmp_path_factory.mktemp("wiki") / "dump.xml"
    # the page splitter keys on the reference delimiter layout
    p.write_text(WIKI_XML.replace("</page>", "</page>").replace("  </page>", "  </page>"))
    return str(p)


def test_wikipedia_dump_parse(spark, wiki_dump):
    from sift_spark.corpora.wikipedia import dump_articles, dump_redirects, read_dump

    pages = read_dump(spark, wiki_dump)
    rows = {r.uri: r for r in pages.collect()}
    assert len(rows) == 3
    spark_page = rows["en.wikipedia.org/wiki/Apache_Spark"]
    assert spark_page.ns == "0" and spark_page.pid == 1 and spark_page.redirect is None

    rds = dump_redirects(pages).collect()
    assert [(r.source, r.target) for r in rds] == [
        ("en.wikipedia.org/wiki/Spark", "en.wikipedia.org/wiki/Apache_Spark")
    ]

    arts = {r.uri: r for r in dump_articles(pages).collect()}
    assert list(arts) == ["en.wikipedia.org/wiki/Apache_Spark"]  # ns-0 non-redirects only
    art = arts["en.wikipedia.org/wiki/Apache_Spark"]
    assert "{{" not in art.text and "[[" not in art.text and "<!--" not in art.text
    targets = {l.target for l in art.links}
    assert "en.wikipedia.org/wiki/MapReduce" in targets
    assert "en.wikipedia.org/wiki/Hadoop" in targets
    # first-bold self link injected
    assert "en.wikipedia.org/wiki/Apache_Spark" in targets
    # offsets index the anchor text
    for l in art.links:
        assert art.text[l.start:l.stop].strip() != ""


WIKI_TABLE = """Intro sentence.
{| class="wikitable" style="width:60%"
|+ Caption text
|-
! Header A !! Header B
|-
| [[Cell One|cell one]] || style="color:red" | 42
|-
| plain cell
|}
Outro sentence."""


def test_wiki_table_markup_stripped():
    """{|…|} structure lines vanish; cell content (incl. links)
    survives — reference wikicorpus.py:30-31,82-83 RE_P12/RE_P13."""
    from sift_spark.corpora.wikipedia import (
        extract_anchored_links,
        wiki_to_anchored_text,
    )

    out = wiki_to_anchored_text("en.wikipedia.org/wiki/T", WIKI_TABLE)
    for junk in ("{|", "|}", "|-", "wikitable", "width:60%", "!!"):
        assert junk not in out, f"{junk!r} survived: {out!r}"
    text, links = extract_anchored_links(out)
    for kept in ("Intro sentence.", "Caption text", "Header A", "Header B",
                 "cell one", "42", "plain cell", "Outro sentence."):
        assert kept in text
    assert any(t == "en.wikipedia.org/wiki/Cell_One" for t, _, _ in links)


WIKIDATA_LINES = [
    '{"id":"Q1","labels":{"en":{"value":"universe"}},"sitelinks":{"enwiki":{"title":"Universe"}},"claims":{"P31":[{"mainsnak":{"snaktype":"value","datatype":"wikibase-item","datavalue":{"type":"wikibase-entityid","value":{"numeric-id":2}}}}],"P571":[{"mainsnak":{"snaktype":"value","datatype":"time","datavalue":{"type":"time","value":{"time":"-13798000000"}}}}]}}',
    '{"id":"Q2","labels":{"en":{"value":"thing"}},"sitelinks":{},"claims":{}}',
    '{"id":"P31","labels":{"en":{"value":"instance of"}},"claims":{}}',
    '{"id":"P571","labels":{"en":{"value":"inception"}},"claims":{}}',
]


def test_wikidata_relations(spark, tmp_path):
    from sift_spark.corpora.wikidata import read_items, relations

    p = tmp_path / "wd.json"
    p.write_text("\n".join(WIKIDATA_LINES))
    items = read_items(spark, str(p))
    assert items.count() == 4
    rels = {(r.entity, r.predicate, r.value) for r in relations(items).collect()}
    assert ("Universe", "instance of", "thing") in rels
    assert ("Universe", "inception", "-13798000000") in rels


def _warc_record(url: str, html: str) -> str:
    http = f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n{html}"
    head = f"WARC-Type: response\r\nWARC-Target-URI: {url}\r\n\r\n"
    return "WARC/1.0\r\n" + head + http + "\r\n\r\n"


def test_warc_articles(spark, tmp_path):
    from sift_spark.corpora.warc import read_warc, warc_articles

    p = tmp_path / "crawl.warc"
    p.write_text(
        _warc_record("http://x.test/a", '<html><body><p>Hello <a href="http://y.test/b">world link</a> end</p><script>var x=1;</script></body></html>')
        + _warc_record("http://x.test/b", "<html><body>No links here</body></html>")
    )
    recs = read_warc(spark, str(p))
    assert recs.count() == 2
    arts = {r.uri: r for r in warc_articles(recs).collect()}
    a = arts["http://x.test/a"]
    assert "Hello" in a.text and "world link" in a.text and "script" not in a.text.lower()
    assert [l.target for l in a.links] == ["http://y.test/b"]
    assert a.text[a.links[0].start:a.links[0].stop] == "world link"


BOILERPLATE_HTML = """<html><body>
<nav><ul>
<li><a href="http://x.test/">Home</a></li>
<li><a href="http://x.test/about">About</a></li>
<li><a href="http://x.test/contact">Contact</a></li>
</ul></nav>
<article>
<p>The quick brown fox jumps over the lazy dog while the
sun sets slowly behind the rolling green hills of the valley,
and a <a href="http://y.test/ref">reference link</a> sits inline.</p>
<p>A second paragraph continues the story with many more words
about the countryside and the animals that live peacefully there.</p>
</article>
<footer><a href="http://x.test/privacy">Privacy</a> |
<a href="http://x.test/terms">Terms</a> |
<a href="http://x.test/sitemap">Sitemap</a></footer>
</body></html>"""


def test_warc_boilerplate_removed(spark, tmp_path):
    """Nav/footer link blocks drop; article prose + inline links stay
    (dragnet-style density classifier, reference commoncrawl.py:71)."""
    from sift_spark.corpora.warc import read_warc, warc_articles

    p = tmp_path / "bp.warc"
    p.write_text(_warc_record("http://x.test/article", BOILERPLATE_HTML))
    art = warc_articles(read_warc(spark, str(p))).collect()[0]
    assert "quick brown fox" in art.text
    assert "second paragraph" in art.text
    for junk in ("Home", "Privacy", "Sitemap", "Contact"):
        assert junk not in art.text, f"boilerplate {junk!r} survived"
    assert [l.target for l in art.links] == ["http://y.test/ref"]
    assert art.text[art.links[0].start:art.links[0].stop] == "reference link"


def test_warc_language_filter(spark, tmp_path):
    from sift_spark.corpora.warc import filter_language, read_warc, warc_articles

    p = tmp_path / "lf.warc"
    p.write_text(
        _warc_record("http://x.test/en", "<html><body>the cat is on the mat and the dog is here</body></html>")
        + _warc_record("http://x.test/fr", "<html><body>le chat est sur le tapis et le chien est la</body></html>")
    )
    arts = warc_articles(read_warc(spark, str(p)))
    en = [r.uri for r in filter_language(arts, "en").collect()]
    fr = [r.uri for r in filter_language(arts, "fr").collect()]
    assert en == ["http://x.test/en"]
    assert fr == ["http://x.test/fr"]


def test_redirect_fixpoint(spark):
    from sift_spark.corpora.redirects import resolve_transitive, synth_redirects

    resolved = {(r.source, r.target) for r in resolve_transitive(synth_redirects(spark)).collect()}
    assert ("wiki/vector", "wiki/table") in resolved  # 2-hop chain collapsed
    assert ("wiki/column", "wiki/table") in resolved
    # fixpoint property: no resolved target is still a redirect source
    sources = {s for s, _ in resolved}
    assert not any(t in sources and t != s for s, t in resolved if (t, t) not in resolved)


def test_wikidata_corrupt_lines_skipped(spark, tmp_path):
    """Malformed JSON lines (truncated dumps, trailing commas) must
    not kill the read — schema-based parse nulls them out and valid
    rows survive."""
    from sift_spark.corpora.wikidata import read_items

    p = tmp_path / "wd.json"
    p.write_text(
        "\n".join(
            [
                WIKIDATA_LINES[0],
                '{"id": "Q_truncated", "labels": {',      # broken JSON
                "not json at all",
                WIKIDATA_LINES[1],
            ]
        )
    )
    items = read_items(spark, str(p))
    ids = {r.id for r in items.select("id").collect() if r.id}
    assert {"Q1", "Q2"} <= ids
    assert "Q_truncated" not in ids


def test_warc_truncated_record_skipped(spark, tmp_path):
    """A torn WARC record (no HTTP payload separator) yields no row;
    intact records still parse."""
    from sift_spark.corpora.warc import read_warc

    good = _warc_record("http://x.test/ok", "<html><body>fine page here</body></html>")
    torn = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x.test/torn\r\n"
    p = tmp_path / "torn.warc"
    p.write_text(good + torn)
    rows = read_warc(spark, str(p)).collect()
    assert [r.url for r in rows] == ["http://x.test/ok"]


def test_table_markup_only_stripped_inside_tables():
    """Cell/separator patterns must not fire outside {|…|} regions:
    prose '!!' and lines legitimately starting with | survive."""
    from sift_spark.corpora.wikipedia import strip_table_markup

    text = "Wow!! Amazing.\n|piped prose line\n{|\n! H1 !! H2\n|}\nAfter."
    out = strip_table_markup(text)
    assert "Wow!! Amazing." in out
    assert "|piped prose line" in out
    assert "!!" not in out.replace("Wow!! Amazing.", "")
    assert "H1" in out and "H2" in out and "{|" not in out and "|}" not in out


def test_table_markup_nested_tables():
    from sift_spark.corpora.wikipedia import strip_table_markup

    text = "Pre.\n{|\n| outer cell\n{|\n| inner cell\n|}\n| outer again\n|}\nPost."
    out = strip_table_markup(text)
    for kept in ("Pre.", "outer cell", "inner cell", "outer again", "Post."):
        assert kept in out
    for junk in ("{|", "|}", "|-"):
        assert junk not in out
