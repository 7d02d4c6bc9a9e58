"""Unigram-LM tokenizer (hard-EM SentencePiece variant): exact
equality with an independent pure-Python reference, segmentation
round-trip, and coverage invariants."""

from __future__ import annotations

import math
from collections import Counter

from tests.conftest import SF_SMOKE

L = 5  # max piece length, matching the operator default


def _ref_viterbi(word, logp):
    # independent re-implementation (forward DP, scan all js, strict >)
    n = len(word)
    best = [-1e18] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - L), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                lp = -100.0 if i - j == 1 else None
            if lp is None:
                continue
            if best[j] + lp > best[i]:
                best[i] = best[j] + lp
                back[i] = j
    pieces, i = [], n
    while i > 0:
        pieces.append(word[back[i]:i])
        i = back[i]
    return list(reversed(pieces))


def _ref_train(texts, vocab_size=120, n_iter=3, seed_size=400):
    words = Counter()
    for t in texts:
        words.update(t.split(" "))
    # seed: tf-weighted substring counts
    subs = Counter()
    for w, tf in words.items():
        for ln in range(1, min(len(w), L) + 1):
            for i in range(len(w) - ln + 1):
                subs[w[i:i + ln]] += tf
    top = sorted(subs.items(), key=lambda pc: (-pc[1], pc[0]))[:seed_size]
    counts = dict(top)
    for p, c in subs.items():
        if len(p) == 1:
            counts.setdefault(p, c)
    for _ in range(n_iter):
        total = sum(counts.values())
        logp = {p: math.log(c / total) for p, c in counts.items() if c > 0}
        observed = Counter()
        for w, tf in words.items():
            for piece in _ref_viterbi(w, logp):
                observed[piece] += tf
        multi = sorted(
            ((p, c) for p, c in observed.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        chars = {p: observed.get(p, 0) for p in counts if len(p) == 1}
        budget = max(vocab_size - len(chars), 0)
        counts = dict(multi[:budget])
        counts.update(chars)
    return sorted(counts.items(), key=lambda pc: (-pc[1], pc[0]))


def test_unigram_train_equals_python_reference(spark):
    from sift_spark.io import table
    from sift_spark.operators.tokenizer import unigram_train_counts

    docs = table(spark, SF_SMOKE, "documents")
    got = unigram_train_counts(docs)
    ref = _ref_train([r["text"] for r in docs.select("text").collect()])
    assert got == ref
    # the distributed EM path (collect_words_max=0 forces it) produces
    # the identical inventory as the driver-side fast path
    assert unigram_train_counts(docs, collect_words_max=0) == got


def test_unigram_encode_roundtrips_and_covers(spark):
    from sift_spark.io import table
    from sift_spark.operators.tokenizer import (
        unigram_encode,
        unigram_train_counts,
    )

    docs = table(spark, SF_SMOKE, "documents")
    model = unigram_train_counts(docs)
    enc = {r["doc_id"]: r["pieces"] for r in unigram_encode(docs, model).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(enc) == set(texts)
    for doc_id, text in list(texts.items())[:50]:
        assert "".join(enc[doc_id]) == text.replace(" ", "")
    # compression: pieces per doc strictly below chars per doc
    some = next(iter(texts))
    assert len(enc[some]) < len(texts[some].replace(" ", ""))


def test_unigram_inventory_covers_all_corpus_chars(spark):
    from sift_spark.io import table
    from sift_spark.operators.tokenizer import unigram_train

    docs = table(spark, SF_SMOKE, "documents")
    rows = unigram_train(docs).collect()
    inventory = {r["piece"] for r in rows}
    chars = set()
    for r in docs.select("text").collect():
        chars.update(r["text"].replace(" ", ""))
    assert chars <= inventory
    # canonical order: count desc, piece asc
    counts = [(r["count"], r["piece"]) for r in rows]
    assert counts == sorted(counts, key=lambda cp: (-cp[0], cp[1]))
