#!/usr/bin/env python
"""Deterministic multi-GB Wikidata JSON dump generator — the scale
stand-in for a real `latest-all.json` slice (the sandbox has no
network; same rationale as make_big_dump.py).

Emits the REAL dump layout: a JSON array with one entity per line and
trailing commas (`[` … `{...},` … `]`), which
sift_spark.corpora.wikidata.read_items must parse line-wise. The
entity catalog carries the pathologies a real dump slice has:

- Q-items with multilingual labels (CJK/RTL/emoji), ~60% with an
  enwiki sitelink; ~1% P-items defining predicate labels
- claims: wikibase-item (zipf-skewed target qids — hot entities
  dominate, like the real graph), time, monolingualtext, string, url,
  plus datatypes the relation builder must IGNORE (quantity,
  globe-coordinate, commonsMedia) and snaktype novalue/somevalue rows
- items with EMPTY claims, items missing the `en` label, deprecated
  lexeme ids (L…) that must fall through every Q/P filter
- structural noise: blank lines, a handful of TRUNCATED lines
  (simulating a cut download) that must not kill the parse

Usage:
    python scripts/make_big_wikidata.py [--out .data/bigwikidata.json]
        [--items 1200000] [--seed 7]
"""

from __future__ import annotations

import argparse
import json
import os
import random

LANG_LABELS = [
    ("en", "entity {i} label"),
    ("de", "Entität {i}"),
    ("fr", "entité {i}"),
    ("zh", "实体{i}"),
    ("ar", "كيان {i}"),
    ("emoji", "🚀 {i} 🎯"),
]

# predicate catalog: (pid, en label, datatype it usually carries)
PREDICATES = [
    ("P31", "instance of", "wikibase-item"),
    ("P279", "subclass of", "wikibase-item"),
    ("P17", "country", "wikibase-item"),
    ("P569", "date of birth", "time"),
    ("P570", "date of death", "time"),
    ("P856", "official website", "url"),
    ("P1476", "title", "monolingualtext"),
    ("P2044", "elevation", "quantity"),          # must be ignored
    ("P625", "coordinate location", "globe-coordinate"),  # ignored
    ("P18", "image", "commonsMedia"),            # ignored
]


def _zipf_qid(rng: random.Random, n: int) -> int:
    return int(min(n - 1, rng.paretovariate(1.1))) + 1


def _claims(rng: random.Random, n_items: int) -> dict:
    claims: dict = {}
    for _ in range(rng.randint(0, 6)):
        pid, _, dt = PREDICATES[rng.randrange(len(PREDICATES))]
        r = rng.random()
        if r < 0.04:
            snak = {"snaktype": "novalue", "datatype": dt}
        elif r < 0.08:
            snak = {"snaktype": "somevalue", "datatype": dt}
        elif dt == "wikibase-item":
            snak = {
                "snaktype": "value", "datatype": dt,
                "datavalue": {"type": "wikibase-entityid",
                              "value": {"numeric-id": _zipf_qid(rng, n_items)}},
            }
        elif dt == "time":
            snak = {
                "snaktype": "value", "datatype": dt,
                "datavalue": {"type": "time",
                              "value": {"time": f"+{1200 + rng.randrange(900)}-0{rng.randrange(1,9)}-01T00:00:00Z"}},
            }
        elif dt == "monolingualtext":
            snak = {
                "snaktype": "value", "datatype": "string",
                "datavalue": {"type": "monolingualtext",
                              "value": {"text": f"text value {rng.randrange(10**6)}"}},
            }
        elif dt == "url":
            snak = {
                "snaktype": "value", "datatype": dt,
                "datavalue": {"type": "string",
                              "value": {"text": f"https://example.org/{rng.randrange(10**6)}"}},
            }
        else:  # quantity / globe-coordinate / commonsMedia — ignored downstream
            snak = {
                "snaktype": "value", "datatype": dt,
                "datavalue": {"type": dt, "value": {"text": str(rng.random())}},
            }
        claims.setdefault(pid, []).append({"mainsnak": snak})
    return claims


def _item(rng: random.Random, i: int, n_items: int) -> dict:
    qid = f"Q{i}"
    labels = {}
    for lang, tmpl in LANG_LABELS:
        if lang == "en" and rng.random() < 0.05:
            continue  # ~5% miss the en label
        if lang != "en" and rng.random() < 0.5:
            continue
        labels[lang] = {"value": tmpl.format(i=i)}
    sitelinks = {}
    if rng.random() < 0.6:
        sitelinks["enwiki"] = {"title": f"Entity {i}"}
    if rng.random() < 0.2:
        sitelinks["dewiki"] = {"title": f"Entität {i}"}
    return {
        "type": "item", "id": qid, "labels": labels,
        "sitelinks": sitelinks, "claims": _claims(rng, n_items),
    }


def write_dump(out: str, n_items: int, seed: int) -> None:
    rng = random.Random(seed)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w", encoding="utf-8") as fh:
        fh.write("[\n")
        # predicate definitions first (real dumps interleave; the
        # reader must not care about position — shuffle a few later)
        for pid, plabel, _ in PREDICATES:
            fh.write(json.dumps({
                "type": "property", "id": pid,
                "labels": {"en": {"value": plabel}},
                "sitelinks": {}, "claims": {},
            }, ensure_ascii=False) + ",\n")
        for i in range(1, n_items + 1):
            line = json.dumps(_item(rng, i, n_items), ensure_ascii=False)
            r = rng.random()
            if r < 0.0005:
                fh.write("\n")  # blank line
            if r < 0.0002:
                fh.write(line[: len(line) // 2] + "\n")  # truncated record
                continue
            if r < 0.0004:
                fh.write(json.dumps({
                    "type": "lexeme", "id": f"L{i}",
                    "labels": {}, "sitelinks": {}, "claims": {},
                }) + ",\n")
            fh.write(line + ",\n")
        # last record without trailing comma, then the array close
        fh.write(json.dumps(_item(rng, n_items + 1, n_items), ensure_ascii=False) + "\n")
        fh.write("]\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".data/bigwikidata.json")
    ap.add_argument("--items", type=int, default=1_200_000)
    ap.add_argument("--seed", type=int, default=7)
    a = ap.parse_args()
    write_dump(a.out, a.items, a.seed)
    print(f"{a.out}: {os.path.getsize(a.out) / 1e9:.2f} GB, {a.items} items")


if __name__ == "__main__":
    main()
