"""Hypothesis fuzz of the wiki-markup pipeline (r9 hardening for the
dump-scale ingestion story): arbitrary text — including adversarial
fragments of every markup class the real dumps contain — must never
crash the parser, and the offsets `extract_anchored_links` returns
must always be consistent (each (target, start, stop) slice of the
plain text equals the anchor text the link was emitted with).

No Spark session: these are the pure-Python kernels the Arrow-batched
reader calls per page (sift_spark/corpora/wikipedia.py; reference
parity sift/wikicorpus.py:45/199)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sift_spark.corpora.wikipedia import (
    extract_anchored_links,
    wiki_to_anchored_text,
)

# fragments of every markup class, composable in any order — the
# generator interleaves them with arbitrary unicode text so nesting,
# imbalance, and truncation all occur
_FRAGMENTS = st.sampled_from([
    "{{", "}}", "{{cite web|url=x|title={{nested}}}}",
    "[[", "]]", "[[Target]]", "[[Target|anchor]]", "[[Target#Frag|a]]",
    "[[File:Img.jpg|thumb|cap with [[Link]]]]", "[[Category:Stuff]]",
    "[[de:Thema]]", "'''bold'''", "''ital''", "== Heading ==",
    "{|\n! h\n|-\n| cell || cell2\n|}", "{|", "|}", "|-", "|+cap",
    "<ref>r</ref>", "<ref name='x'/>", "<!-- <page> -->", "<!--",
    "<math>x^2</math>", "<nowiki>[[raw]]</nowiki>", "<br/>", "</div>",
    "<a href=\"evil\">pre-existing anchor</a>",
    "[http://x.com label]", "[http://x.com]",
])

_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


@st.composite
def markup_soup(draw):
    parts = draw(st.lists(st.one_of(_FRAGMENTS, _TEXT), max_size=30))
    return "".join(parts)


@given(markup_soup())
@settings(max_examples=300, deadline=None)
def test_markup_pipeline_never_crashes_and_offsets_consistent(soup):
    anchored = wiki_to_anchored_text("en.wikipedia.org/wiki/Fuzz", soup)
    plain, links = extract_anchored_links(anchored)
    assert "<a " not in plain  # every anchor consumed
    for _target, start, stop in links:
        assert 0 <= start <= stop <= len(plain)


@given(st.lists(st.tuples(_TEXT, _TEXT), max_size=8), _TEXT)
@settings(max_examples=150, deadline=None)
def test_offsets_roundtrip_for_wellformed_anchors(pairs, tail):
    """For WELL-FORMED anchor text the extracted (start, stop) slices
    must reproduce each anchor exactly."""
    frags, expect = [], []
    for target, anchor in pairs:
        if "<" in target or '"' in target or "<" in anchor:
            continue
        frags.append(f'<a href="{target}">{anchor}</a>')
        expect.append(anchor)
    text = tail.replace("<", "") + "".join(frags)
    plain, links = extract_anchored_links(text)
    assert len(links) == len(expect)
    for (_t, s, e), want in zip(links, expect):
        assert plain[s:e] == want
