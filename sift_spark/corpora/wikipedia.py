"""Wikipedia dump ingestion, re-architected for the DataFrame stack.

Reference behavior (WHAT): sift/corpora/wikipedia.py:9 splits the XML
dump on page boundaries, parses page metadata + revision text
(wikicorpus.py:175 ``extract_page``), strips wiki markup to plain
text while converting wikilinks to offset-tracked anchors
(wikicorpus.py:45 ``remove_markup``, :199 ``extract_links``), and
derives redirect pairs (wikipedia.py:36).

This implementation (HOW): Spark's text source with a custom
``lineSep`` handles the distributed page split (each page lands as
one row, splittable across executors — same effect as the
reference's Hadoop record delimiter, no RDD API). Page parsing and
markup stripping are genuinely imperative (recursive templates,
offset bookkeeping), so they run as ``mapInPandas`` over Arrow
batches using only the stdlib — the one place in the corpus path
where Python is the right tool. Everything downstream (redirects,
link models) is DataFrame-native.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WIKI_PREFIX = "en.wikipedia.org/wiki/"

PAGE_SCHEMA = (
    "uri string, ns string, pid long, redirect string, content string"
)
ARTICLE_SCHEMA = (
    "uri string, text string, links array<struct<target:string,start:int,stop:int>>"
)

# --- markup stripping (own regex set; semantics follow wikicorpus.py) ------
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_REF = re.compile(r"<ref[^>]*?/>|<ref[^>]*?>.*?</ref>", re.DOTALL)
_NOWIKI = re.compile(r"<nowiki[^>]*?>.*?</nowiki>", re.DOTALL)
_MATH = re.compile(r"<math[^>]*?>.*?</math>", re.DOTALL)
_TAG = re.compile(r"<[^>]+?>", re.DOTALL)
_HEADING = re.compile(r"(==+)\s*(.*?)\s*\1")
_URL_LINK = re.compile(r"\[\w+://[^ \]]*( ([^\]]*))?\]")
_PIPED_LINK = re.compile(r"\[\[:?([^\[\]|]*)\|([^\[\]]*)\]\]", re.DOTALL)
_PLAIN_LINK = re.compile(r"\[\[:?([^\[\]]*)\]\]", re.DOTALL)
_CATEGORY = re.compile(r"\[\[Category:[^\[\]]*\]\]")
_FILE_IMAGE = re.compile(r"\[\[(?:[fF]ile|[iI]mage):[^\[\]]*(?:\[\[[^\]]*\]\][^\[\]]*)*\]\]")
_BOLD_ITAL = re.compile(r"'{2,5}")
_ANCHOR = re.compile(r'<a href="([^"]*)">(.*?)</a>', re.DOTALL)
# Internal link representation while markup passes run: \x01 target
# \x02 display \x03. Control chars never occur in real wikitext (they
# are stripped from input), so link spans are unforgeable by page
# content — unlike the previous raw ``<a href>`` interleaving, where a
# quote/angle-bracket in a title or a stray ``<a `` in page text could
# truncate or spoof an anchor (r9 fuzz finding, minimal input [["]]).
_SENT_OPEN, _SENT_MID, _SENT_CLOSE = "\x01", "\x02", "\x03"
_SENT_STRIP = re.compile("[\x01\x02\x03]")
_SENT_LINK = re.compile("\x01([^\x01\x02\x03]*)\x02([^\x01\x02\x03]*)\x03", re.DOTALL)
# an open+target orphaned by nested links (its display swallowed an
# inner link): drop the target text with the markers, keep the display
_SENT_ORPHAN_OPEN = re.compile("\x01[^\x01\x02\x03]*\x02", re.DOTALL)
# stray unterminated "<a href…" the tag stripper could not consume
# (no closing ">" exists after it) — drop the "<" run so it cannot
# read as an anchor open once real anchors are emitted around it
# ("<+" so "<<a href" cannot re-expose a new open after one removal).
# Requires the href attribute so ordinary prose like "x <a threshold"
# survives: the emitted-anchor parser only ever matches '<a href="',
# so an attribute-less "<a " can never spoof a mention (r10 advice).
_STRAY_ANCHOR_OPEN = re.compile(r"<+(?=a\s+href)")


def _href_escape(s: str) -> str:
    """Percent-encode the chars that would break the ``<a href="…">``
    round-trip ('%' first so the encoding is reversible)."""
    return (
        s.replace("%", "%25").replace('"', "%22").replace("<", "%3C").replace(">", "%3E")
    )


def _href_unescape(s: str) -> str:
    return (
        s.replace("%22", '"').replace("%3C", "<").replace("%3E", ">").replace("%25", "%")
    )
_LANGLINKS = re.compile(r"(\n\[\[[a-z][a-z][\w-]*:[^:\]]+\]\])+$")
# table formatting (reference wikicorpus.py:30-31,82-83 RE_P12/RE_P13
# semantics): structure lines ({| / |- / |}) drop whole, cell/caption
# markers drop but their content stays. The cell/separator patterns
# only ever run on lines INSIDE a {|…|} region (the reference's RE_P13
# requires table-line context for the same reason): prose like "Wow!!"
# or a line legitimately starting with | outside a table must survive.
_TABLE_INLINE_SEP = re.compile(r"\|\||!!")
_TABLE_CAPTION = re.compile(r"^[ \t]*\|\+[ \t]*", re.MULTILINE)
_TABLE_CELL = re.compile(r"^[ \t]*[|!]+[ \t]*", re.MULTILINE)


def strip_table_markup(text: str) -> str:
    """Remove ``{| … |}`` table formatting, keep cell content.

    Same behavior as the reference's RE_P12/RE_P13 passes: table
    begin/row/end lines vanish with their style attributes; ``|+``
    captions and ``|``/``!`` cell markers vanish while the cell text
    (including any wikilinks, which are converted downstream)
    survives; inline ``||``/``!!`` separators become line breaks.
    A depth counter tracks nested tables; text outside any table
    passes through untouched.
    """
    out = []
    depth = 0
    for line in text.split("\n"):
        stripped = line.lstrip(" \t")
        if stripped.startswith("{|"):
            depth += 1
            continue  # table-begin structure line drops whole
        if depth == 0:
            out.append(line)
            continue
        if stripped.startswith("|}"):
            depth -= 1
            continue
        if stripped.startswith("|-"):
            continue
        cells = _TABLE_INLINE_SEP.sub("\n", line)
        cells = _TABLE_CAPTION.sub("", cells)
        out.append(_TABLE_CELL.sub("", cells))
    return "\n".join(out)


def strip_templates(text: str) -> str:
    """Remove {{…}} blocks, handling nesting by depth counting."""
    out = []
    depth = 0
    i = 0
    n = len(text)
    while i < n:
        if text.startswith("{{", i):
            depth += 1
            i += 2
        elif text.startswith("}}", i) and depth > 0:
            depth -= 1
            i += 2
        else:
            if depth == 0:
                out.append(text[i])
            i += 1
    return "".join(out)


def wiki_to_anchored_text(uri: str, text: str) -> str:
    """Markup → plain text with links as ``<a href>`` anchors.

    Links are carried through the markup passes as control-char
    sentinels and only rendered to ``<a href>`` at the end, with the
    href percent-encoded (see ``_href_escape``). Consequences the r9
    fuzzer demanded: a quote/angle bracket in a link title can no
    longer truncate the href; a bold span nested in a link display (or
    vice versa) resolves to the inner link instead of leaking ``<a ``
    fragments; pre-existing ``<a>`` tags in page text are stripped
    like any other HTML tag rather than masquerading as our anchors.
    """
    text = _SENT_STRIP.sub("", text)  # page text can never forge a sentinel
    text = _LANGLINKS.sub("", text)
    text = strip_templates(text)
    text = _COMMENT.sub("", text)
    text = _REF.sub("", text)
    text = _NOWIKI.sub("", text)
    text = _MATH.sub("", text)
    text = strip_table_markup(text)
    text = _FILE_IMAGE.sub("", text)
    text = _CATEGORY.sub("", text)
    text = _HEADING.sub(r"\2", text)
    # first bolded span names the article entity (wiki convention,
    # mirrors wikicorpus.py:72). Skip bolds inside wikilink brackets —
    # [[T|'''b''']] is a bold DISPLAY for a link to T, not a
    # self-mention (the [[ / ]] balance test is exact here because
    # nested bracket forms — files, images — were stripped above).
    for m in re.finditer(r"'''(.*?)'''", text):
        prefix = text[: m.start()]
        if prefix.count("[[") == prefix.count("]]"):
            text = (
                text[: m.start()]
                + f"{_SENT_OPEN}{uri}{_SENT_MID}{m.group(1)}{_SENT_CLOSE}"
                + text[m.end() :]
            )
            break
    text = _URL_LINK.sub(lambda mm: mm.group(2) or "", text)
    text = _PIPED_LINK.sub(
        lambda mm: f"{_SENT_OPEN}{WIKI_PREFIX}{mm.group(1)}{_SENT_MID}{mm.group(2)}{_SENT_CLOSE}",
        text,
    )
    text = _PLAIN_LINK.sub(
        lambda mm: f"{_SENT_OPEN}{WIKI_PREFIX}{mm.group(1)}{_SENT_MID}{mm.group(1)}{_SENT_CLOSE}",
        text,
    )
    text = _BOLD_ITAL.sub("", text)
    text = _TAG.sub("", text)
    text = _STRAY_ANCHOR_OPEN.sub("", text)
    text = _SENT_LINK.sub(
        lambda mm: f'<a href="{_href_escape(mm.group(1))}">{mm.group(2)}</a>', text
    )
    text = _SENT_ORPHAN_OPEN.sub("", text)  # imbalanced nesting leftovers
    text = _SENT_STRIP.sub("", text)
    return text.strip()


def normalise_wikilink(title: str) -> str:
    """Wiki title normalization (wikicorpus.py:188): underscores,
    leading capital."""
    s = title.replace(" ", "_").strip("_").strip()
    if s and s[0].islower():
        s = s[0].upper() + s[1:]
    return s


def extract_anchored_links(text: str):
    """Strip ``<a>`` anchors, returning (plain_text, [(target, start,
    stop)]) with offsets into the plain text (wikicorpus.py:199)."""
    links = []
    out = []
    pos = 0
    plain_len = 0
    for m in _ANCHOR.finditer(text):
        out.append(text[pos : m.start()])
        plain_len += m.start() - pos
        anchor = m.group(2)
        target = m.group(1)
        if target.startswith(WIKI_PREFIX):
            # wiki targets were href-escaped by wiki_to_anchored_text;
            # decode before normalizing. (Gated on the prefix so WARC
            # HTML hrefs — real URLs with their own %-encodings — pass
            # through untouched.)
            target = WIKI_PREFIX + normalise_wikilink(
                _href_unescape(target[len(WIKI_PREFIX) :])
            )
        links.append((target, plain_len, plain_len + len(anchor)))
        out.append(anchor)
        plain_len += len(anchor)
        pos = m.end()
    out.append(text[pos:])
    return "".join(out), links


def read_dump(spark: SparkSession, path: str) -> DataFrame:
    """Dump file(s) → (uri, ns, pid, redirect, content), one row per
    ``<page>``. The custom lineSep makes the scan splittable."""
    raw = spark.read.option("lineSep", "\n  </page>\n").text(path)
    pages = raw.where(F.instr(F.col("value"), "<page>") > 0).select(
        (F.concat(F.expr("substring(value, instr(value, '<page>'))"), F.lit("</page>"))).alias("page_xml")
    )

    def parse(batches: Iterator) -> Iterator:
        import xml.etree.ElementTree as ET

        import pandas as pd

        for pdf in batches:
            rows = []
            for xml_str in pdf["page_xml"]:
                # records normally end at the stripped delimiter and we
                # re-append </page>; a trailing fragment (EOF, or a dump
                # whose layout differs from the 2-space convention) may
                # still carry its own </page> plus trailing content —
                # cut at the first close tag so ET sees one element.
                close = xml_str.find("</page>")
                if close != -1:
                    xml_str = xml_str[: close + len("</page>")]
                try:
                    e = ET.fromstring(xml_str)
                except ET.ParseError:
                    continue
                title = e.findtext("title") or ""
                ns = e.findtext("ns") or "0"
                pid = int(e.findtext("id") or 0)
                redirect_el = e.find("redirect")
                redirect = redirect_el.attrib.get("title") if redirect_el is not None else None
                content = None if redirect is not None else e.findtext("revision/text")
                uri = WIKI_PREFIX + title.replace(" ", "_")
                rows.append((uri, ns, pid, redirect, content))
            yield pd.DataFrame(rows, columns=["uri", "ns", "pid", "redirect", "content"])

    return pages.mapInPandas(parse, PAGE_SCHEMA)


def dump_redirects(pages: DataFrame) -> DataFrame:
    """Redirect pairs (source, target) from parsed pages
    (wikipedia.py:36) — pure built-ins (regex normalization via
    expressions, no Python)."""
    t = F.col("redirect")
    norm = F.concat(
        F.upper(F.substring(F.regexp_replace(F.trim(t), " ", "_"), 1, 1)),
        F.expr("substring(regexp_replace(trim(redirect), ' ', '_'), 2)"),
    )
    return (
        pages.where(F.col("redirect").isNotNull())
        .select(F.col("uri").alias("source"), F.concat(F.lit(WIKI_PREFIX), norm).alias("target"))
        .distinct()
    )


def article_links(articles: DataFrame) -> DataFrame:
    """Adapter: nested article link arrays → the flat link table the
    model layer consumes (doc_id, pos, anchor, start, stop, target).
    ``pos`` is the per-document link ordinal (links are emitted in
    text order). Pure built-ins: explode + substring."""
    exploded = articles.select(
        F.col("uri").alias("doc_id"),
        F.col("text"),
        F.posexplode("links").alias("pos", "link"),
    )
    from sift_spark.functions.urls import normalize_target

    return exploded.select(
        "doc_id",
        "pos",
        F.trim(
            F.expr("substring(text, link.start + 1, link.stop - link.start)")
        ).alias("anchor"),
        F.col("link.start").alias("start"),
        F.col("link.stop").alias("stop"),
        # protocol + #fragment trimming, as every reference link model
        # applies to targets (sift/models/links.py:20-24)
        normalize_target(F.col("link.target")).alias("target"),
    )


def dump_articles(pages: DataFrame) -> DataFrame:
    """Markup-stripped article corpus with offset links:
    (uri, text, links) — mirrors WikipediaArticles (wikipedia.py:68)."""
    arts = pages.where(
        (F.col("ns") == "0") & F.col("redirect").isNull() & F.col("content").isNotNull()
    ).select("uri", "content")

    def clean(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for uri, content in zip(pdf["uri"], pdf["content"]):
                anchored = wiki_to_anchored_text(uri, content)
                text, links = extract_anchored_links(anchored)
                rows.append((uri, text, links))
            yield pd.DataFrame(rows, columns=["uri", "text", "links"])

    return arts.mapInPandas(clean, ARTICLE_SCHEMA)
