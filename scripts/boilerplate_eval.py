#!/usr/bin/env python
"""Quantify the dragnet stand-in (VERDICT r9 ask #9).

The reference (sift/corpora/commoncrawl.py:67) extracts main content
with dragnet, a trained ML extractor; sift_spark's
``warc.extract_main_content`` is a stdlib text/link-density block
classifier. This script replaces the unquantified "weaker extraction"
claim with numbers: it generates ~120 LABELED synthetic HTML pages —
content sentences wrapped in the page archetypes CommonCrawl actually
contains (nav bars, footers, sidebars, tag clouds, comment sections,
table layouts, link farms, tiny pages) — and scores word-level
precision/recall of:

  - extract_main_content (the density classifier), vs
  - the naive full-text baseline (keep every word — what
    remove_boilerplate=False / html_to_text does).

Gold labels are known by construction: the generator records which
words belong to content blocks vs boilerplate blocks. Scoring is
multiset word overlap (shared vocabulary between content and
boilerplate is kept natural, so common words create the same
ambiguity a real benchmark has).

    python scripts/boilerplate_eval.py        # writes BOILERPLATE_EVAL.json

Deterministic (seeded); no Spark session needed — the kernel under
test is a pure function.
"""

from __future__ import annotations

import json
import os
import random
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sift_spark.corpora.warc import extract_main_content  # noqa: E402

CONTENT_WORDS = (
    "the quick brown fox jumps over lazy dog distributed engine query "
    "partition shuffle analysis corpus entity research history culture "
    "science physics model training language network memory study "
    "result experiment measured evidence conclusion method"
).split()
BOILER_WORDS = (
    "home about contact login register subscribe newsletter privacy "
    "terms copyright menu search categories tags archive share tweet "
    "follow sponsored advertisement related trending popular next "
    "previous comments reply posted cookie settings sitemap rss"
).split()

_WORD_RE = re.compile(r"[a-z]+")


def _sentence(rng: random.Random, words, n_lo=8, n_hi=22) -> str:
    return " ".join(rng.choice(words) for _ in range(rng.randint(n_lo, n_hi)))


def _nav(rng) -> str:
    items = "".join(
        f'<li><a href="/x{i}">{rng.choice(BOILER_WORDS)} {rng.choice(BOILER_WORDS)}</a></li>'
        for i in range(rng.randint(4, 10))
    )
    return f"<nav><ul>{items}</ul></nav>"


def _footer(rng) -> str:
    links = " ".join(
        f'<a href="/f{i}">{rng.choice(BOILER_WORDS)}</a>' for i in range(rng.randint(5, 12))
    )
    return f"<footer><div>{links} {rng.choice(BOILER_WORDS)} {rng.choice(BOILER_WORDS)}</div></footer>"


def _sidebar(rng) -> str:
    rows = "".join(
        f'<li><a href="/s{i}">{_sentence(rng, BOILER_WORDS, 2, 4)}</a></li>'
        for i in range(rng.randint(5, 10))
    )
    return f"<aside><h3>{rng.choice(BOILER_WORDS)}</h3><ul>{rows}</ul></aside>"


def _tag_cloud(rng) -> str:
    return "<div class='tags'>" + " ".join(
        f'<a href="/t{i}">{rng.choice(BOILER_WORDS)}</a>' for i in range(rng.randint(8, 20))
    ) + "</div>"


def _cookie_banner(rng) -> str:
    # the hard false-positive class: LONG, linkless boilerplate prose
    return ("<div class='cookie'>we use cookie technology to improve your "
            "experience and measure audience this website stores settings "
            f"{_sentence(rng, BOILER_WORDS, 10, 18)} accept or manage preferences</div>")


def _legal(rng) -> str:
    return ("<div class='legal'>all rights reserved reproduction in whole or "
            f"in part without permission is prohibited {_sentence(rng, BOILER_WORDS, 8, 14)}</div>")


def _long_comment(rng) -> str:
    # prose-shaped user comment: long, low link density — labeled
    # boilerplate (dragnet's training labels treat comments as such)
    return f"<div class='comment'>{_sentence(rng, BOILER_WORDS + CONTENT_WORDS, 12, 25)}</div>"


def _stealth_banner(rng) -> str:
    # cookie banner with NO class hint — only the lexical filter can
    # see it (stress section; partially caught by design)
    return ("<div>we use cookie technology to improve your experience "
            "and measure audience this website stores settings "
            f"{_sentence(rng, BOILER_WORDS, 10, 18)} accept or manage preferences</div>")


def _stealth_comment(rng) -> str:
    # prose-shaped comment with NO class hint: indistinguishable from
    # content without rendering context — the DOCUMENTED residual
    # failure mode (kept in the stress section so the eval stays
    # honest about what the extractor cannot do)
    return f"<div>{_sentence(rng, BOILER_WORDS + CONTENT_WORDS, 12, 25)}</div>"


def _content_heading(rng, gold: Counter) -> str:
    s = _sentence(rng, CONTENT_WORDS, 2, 5)  # short: below min_words
    gold.update(_WORD_RE.findall(s))
    return f"<h2>{s}</h2>"


def _content_list(rng, gold: Counter) -> str:
    # content bullets: each <li> is its own short block — the density
    # classifier's hard false-negative class
    items = []
    for _ in range(rng.randint(3, 6)):
        s = _sentence(rng, CONTENT_WORDS, 3, 7)
        gold.update(_WORD_RE.findall(s))
        items.append(f"<li>{s}</li>")
    return "<ul>" + "".join(items) + "</ul>"


def _content_para(rng, gold: Counter, with_link=False) -> str:
    s = _sentence(rng, CONTENT_WORDS, 12, 30)
    gold.update(_WORD_RE.findall(s))
    if with_link:
        anchor = _sentence(rng, CONTENT_WORDS, 1, 3)
        gold.update(_WORD_RE.findall(anchor))
        s += f' see <a href="/ref">{anchor}</a> for more'
        gold.update(["see", "for", "more"])
    return f"<p>{s}</p>"


def make_page(rng: random.Random, archetype: str):
    """Returns (html, gold_content_counter, boiler_counter)."""
    gold: Counter = Counter()
    boiler: Counter = Counter()

    def b(html_frag: str) -> str:
        boiler.update(_WORD_RE.findall(re.sub(r"<[^>]*>", " ", html_frag).lower()))
        return html_frag

    parts = ["<html><head><script>var x=1;</script><style>.a{}</style></head><body>"]
    if archetype == "article":
        parts += [b(_nav(rng)), b(_cookie_banner(rng))]
        parts += [_content_heading(rng, gold)]
        parts += [_content_para(rng, gold, with_link=(i % 3 == 0)) for i in range(rng.randint(4, 9))]
        if rng.random() < 0.6:
            parts += [_content_list(rng, gold)]
        parts += [b(_sidebar(rng)), b(_legal(rng)), b(_footer(rng))]
    elif archetype == "linkfarm":
        parts += [b(_nav(rng)), b(_tag_cloud(rng))]
        parts += [_content_para(rng, gold) for _ in range(rng.randint(1, 2))]
        parts += [b(_tag_cloud(rng)), b(_sidebar(rng)), b(_footer(rng))]
    elif archetype == "short":
        parts += [_content_heading(rng, gold), _content_para(rng, gold)]
        parts += [b(_cookie_banner(rng)), b(_footer(rng))]
    elif archetype == "table_layout":
        parts += [b(_nav(rng)), "<table><tr><td>", b(_sidebar(rng)), "</td><td>"]
        parts += [_content_para(rng, gold, with_link=True) for _ in range(rng.randint(3, 6))]
        parts += [_content_list(rng, gold)] if rng.random() < 0.5 else []
        parts += ["</td></tr></table>", b(_legal(rng)), b(_footer(rng))]
    elif archetype == "comments":
        parts += [b(_nav(rng))]
        parts += [_content_heading(rng, gold)]
        parts += [_content_para(rng, gold) for _ in range(rng.randint(3, 6))]
        for _ in range(rng.randint(3, 8)):
            parts += [b(_long_comment(rng))]
        parts += [b(_footer(rng))]
    elif archetype == "stealth":
        # stress: boilerplate with NO class/id hints at all
        parts += [b(_nav(rng)), b(_stealth_banner(rng))]
        parts += [_content_heading(rng, gold)]
        parts += [_content_para(rng, gold) for _ in range(rng.randint(3, 6))]
        for _ in range(rng.randint(2, 4)):
            parts += [b(_stealth_comment(rng))]
        parts += [b(_footer(rng))]
    parts.append("</body></html>")
    return "".join(parts), gold, boiler


def score(pred_words: Counter, gold: Counter):
    tp = sum((pred_words & gold).values())
    p = tp / max(sum(pred_words.values()), 1)
    r = tp / max(sum(gold.values()), 1)
    f1 = 2 * p * r / max(p + r, 1e-9)
    return p, r, f1


def main() -> None:
    rng = random.Random(1234)
    archetypes = ["article"] * 40 + ["linkfarm"] * 25 + ["short"] * 15 + \
                 ["table_layout"] * 20 + ["comments"] * 20
    per_arch: dict[str, list] = {}
    rows = []
    for arch in archetypes:
        html, gold, boiler = make_page(rng, arch)
        pred = Counter(_WORD_RE.findall(re.sub(r"<[^>]*>", " ", extract_main_content(html)).lower()))
        full = gold + boiler  # the naive keep-everything baseline
        rows.append((arch, score(pred, gold), score(full, gold)))
        per_arch.setdefault(arch, []).append(rows[-1])

    def agg(triples):
        n = len(triples)
        return {
            "precision": round(sum(t[0] for t in triples) / n, 4),
            "recall": round(sum(t[1] for t in triples) / n, 4),
            "f1": round(sum(t[2] for t in triples) / n, 4),
        }

    # stress pages (SEPARATE from the headline aggregate, so the r10→
    # r11 comparison stays apples-to-apples): boilerplate with no
    # class/id hints — documents what the extractor still cannot do
    stress_rows = []
    for _ in range(12):
        html, gold, boiler = make_page(rng, "stealth")
        pred = Counter(_WORD_RE.findall(re.sub(r"<[^>]*>", " ", extract_main_content(html)).lower()))
        stress_rows.append(("stealth", score(pred, gold), score(gold + boiler, gold)))

    result = {
        "n_pages": len(rows),
        "extractor": agg([r[1] for r in rows]),
        "fulltext_baseline": agg([r[2] for r in rows]),
        "by_archetype": {
            a: {"extractor": agg([r[1] for r in v]), "fulltext": agg([r[2] for r in v]),
                "n": len(v)}
            for a, v in sorted(per_arch.items())
        },
        "stress_no_class_hints": {
            "extractor": agg([r[1] for r in stress_rows]),
            "fulltext": agg([r[2] for r in stress_rows]),
            "n": len(stress_rows),
            "note": "unclassed cookie banner (lexical filter partially catches) "
                    "+ unclassed prose comments (indistinguishable from content "
                    "without rendering context — the documented residual failure mode)",
        },
    }
    with open(os.path.join(REPO, "BOILERPLATE_EVAL.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
