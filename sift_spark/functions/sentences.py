"""Sentence segmentation as column expressions (reference parity:
sift/util.py:35 ``iter_sent_spans`` — regex-heuristic splitting with
abbreviation guards).

Used by the Wikipedia/WARC mention path, where real prose has
sentence structure (the synthetic corpus has none, so the driver
queries use token windows instead). Pure built-ins: one regexp split,
so segmentation happens inside codegen, not Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Split points: sentence-final punctuation + space, with negative
# lookbehinds for single-letter initials ("J. Smith"), two-letter
# capitalised abbreviations ("Ph.D."), dotted sequences ("e.g."),
# and common corporate abbreviations — plus hard newline breaks.
_ABBREV = "(?:[Ii]nc|[Pp]ty|[Ll]td)"
SENTENCE_SPLIT_RE = (
    r"(?<!\s[a-z]\.)"
    r"(?<!\w\.\w.)"
    r"(?<![A-Z][a-z]\.)"
    rf"(?<!{_ABBREV}\.)"
    r"(?<=[.?!])\s+|\s*\n\s*"
)


def sentences(text: Column) -> Column:
    """array<string> of sentence spans (empties removed)."""
    return F.filter(
        F.transform(F.split(text, SENTENCE_SPLIT_RE), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def explode_sentences(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(id, sent_idx, sentence) — one row per sentence."""
    return docs.select(
        F.col(id_col),
        F.posexplode(sentences(F.col(text_col))).alias("sent_idx", "sentence"),
    )
