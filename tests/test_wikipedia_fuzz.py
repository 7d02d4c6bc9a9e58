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
    # r10 hardening atoms: quote/angle titles, stray anchor opens,
    # bold-link nesting, literal percent-escapes (VERDICT r9 #1)
    '"', "<a ", "<<a ", "</a>", '[["]]', "[[x\"y|'''q''']]", "%22", "%",
    "<", ">", "'''[[N|m]]'''", "[[a<b|c>d]]", 'href="', "'''",
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
    # The anchor parser only ever matches '<a href="…">', so THAT is
    # the spoofable token; a bare "<a " in prose ("x <a threshold") is
    # inert and must SURVIVE into plain text (r10 advice — the old
    # blanket '"<a " not in plain' invariant was deleting user prose).
    assert "<a href" not in plain  # every parseable anchor consumed
    for _target, start, stop in links:
        assert 0 <= start <= stop <= len(plain)


def test_quote_and_angle_titles_roundtrip():
    """r9 fuzz regression (minimal input ``[["]]``): quotes/angles in
    link titles must not truncate hrefs or shift later offsets."""
    soup = '[["Weird Al" Yankovic]] recorded [["Heroes"|the song]] and [[a<b>c]].'
    plain, links = extract_anchored_links(
        wiki_to_anchored_text('en.wikipedia.org/wiki/"Fuzz"', soup)
    )
    assert "<a " not in plain
    assert [t for t, _, _ in links] == [
        'en.wikipedia.org/wiki/"Weird_Al"_Yankovic',
        'en.wikipedia.org/wiki/"Heroes"',
        "en.wikipedia.org/wiki/Ac",
    ]
    for t, s, e in links:
        assert plain[s:e]  # every span lands inside plain
    assert plain[links[0][1] : links[0][2]] == '"Weird Al" Yankovic'
    assert plain[links[1][1] : links[1][2]] == "the song"


def test_nested_bold_and_link_resolve_to_inner_link():
    """Bold span inside a link display (and vice versa) must resolve
    to one clean anchor — previously leaked ``<a `` fragments."""
    for soup, want_target, want_anchor in [
        ("[[T|'''b''']]", "en.wikipedia.org/wiki/T", "b"),
        ("'''[[T|x]]'''", "en.wikipedia.org/wiki/T", "x"),
    ]:
        plain, links = extract_anchored_links(
            wiki_to_anchored_text("en.wikipedia.org/wiki/Fuzz", soup)
        )
        assert "<a " not in plain, (soup, plain)
        assert "wiki/Fuzz" not in plain  # orphaned href text must not leak
        (target, s, e) = links[-1]
        assert target == want_target and plain[s:e] == want_anchor, (soup, plain, links)


def test_literal_percent_in_title_survives_escape_roundtrip():
    plain, links = extract_anchored_links(
        wiki_to_anchored_text("en.wikipedia.org/wiki/Fuzz", "pre [[x%22y]]")
    )
    assert links == [("en.wikipedia.org/wiki/X%22y", 4, 9)]
    assert plain == "pre x%22y"


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


def test_prose_less_than_a_survives():
    """r10 advice regression: ordinary prose containing "<a " (a
    comparison, not markup) must survive markup stripping verbatim —
    only the spoofable "<a href" opens get consumed."""
    plain, links = extract_anchored_links(
        wiki_to_anchored_text("en.wikipedia.org/wiki/Fuzz", "x <a threshold and b<a c")
    )
    assert plain == "x <a threshold and b<a c"
    assert links == []
