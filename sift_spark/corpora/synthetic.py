"""Deterministic wikifier: lift the flat ``documents`` table into the
reference's linked-document model.

The reference operates on documents shaped ``{_id, text, links:
[{target, start, stop}]}`` (reference sift/dataset.py:59
``Documents.format_item``). The driver corpus has no links, so this
module derives them deterministically: every occurrence of a token
from the fixed :data:`~sift_spark.functions.core.ENTITY_TOKENS`
lexicon is a mention whose target is ``wiki/<token>``. Pure built-in
expressions (split/posexplode/window cumsum) so every downstream model
has an exact DuckDB oracle.

Scale note: the only shuffle is the per-document window for character
offsets; its partition key is ``doc_id`` (perfectly distributable,
partition size = one document's tokens). At 100 TB the token explode
is map-local and offsets stay a within-doc window — no skew beyond
document length itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sift_spark.functions.core import ENTITY_TOKENS, WIKI_PREFIX, tokens


def token_offsets(toks: Column) -> Column:
    """Char start-offsets for each token of a single-space-joined
    token array, computed as a map-local fold (no per-document window
    shuffle — at 100 TB the offsets stay inside the scan stage)."""
    acc0 = F.struct(
        F.array().cast("array<int>").alias("offs"), F.lit(0).cast("int").alias("cum")
    )
    folded = F.aggregate(
        toks,
        acc0,
        lambda acc, t: F.struct(
            F.concat(acc["offs"], F.array(acc["cum"])).alias("offs"),
            (acc["cum"] + F.length(t) + 1).cast("int").alias("cum"),
        ),
    )
    return folded["offs"]


def token_pos_table(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, anchor) — token explode with positions only.
    Fully map-side (no offsets window); all aggregate models consume
    this one. Shortcuts on the session's provenance-tagged token
    artifact (metadata-checked, never the bare column name): the
    regex split is the dominant per-pass cost of the links family and
    the cached arrays are semantics-identical."""
    from sift_spark.functions.core import is_token_artifact

    col = F.col("toks") if is_token_artifact(docs) else tokens(F.col("text"))
    return docs.select("doc_id", F.posexplode(col).alias("pos", "anchor"))


def token_table(docs: DataFrame) -> DataFrame:
    """Explode documents into (doc_id, pos, anchor, start, stop).

    ``pos`` is the 0-based token index; ``start``/``stop`` are char
    offsets into ``text`` (documents are single-space tokenized, so
    start = sum(len+1) over preceding tokens).

    Offsets use a per-document window (one keyed shuffle, partition =
    one document — linear, skew bounded by document length). The
    shuffle-free alternative (:func:`token_offsets` fold) measured 3×
    slower: the expression-level fold is O(n²) in array copies, and a
    doc_id-keyed token shuffle is cheap at any scale.
    """
    from pyspark.sql import Window

    t = token_pos_table(docs)
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    return (
        t.withColumn(
            "start",
            F.coalesce(F.sum(F.length("anchor") + 1).over(w), F.lit(0)).cast("int"),
        )
        .withColumn("stop", (F.col("start") + F.length("anchor")).cast("int"))
    )


def wikify_links(docs: DataFrame, with_offsets: bool = False) -> DataFrame:
    """Entity link table: (doc_id, pos, anchor[, start, stop], target).

    Offset-free by default (map-side only — filter + concat on the
    token explode, no shuffle); pass ``with_offsets=True`` for the
    full reference link schema with char spans."""
    base = token_table(docs) if with_offsets else token_pos_table(docs)
    return (
        base.where(F.col("anchor").isin(*ENTITY_TOKENS))
        .withColumn("target", F.concat(F.lit(WIKI_PREFIX), F.col("anchor")))
    )


def wikify(docs: DataFrame) -> DataFrame:
    """Documents with a nested ``links`` column, mirroring the
    reference document model (sift/dataset.py:59)."""
    links = (
        wikify_links(docs, with_offsets=True)
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "target", "start", "stop"))
            ).alias("links")
        )
    )
    return docs.join(links, "doc_id", "left").withColumn(
        "links", F.coalesce(F.col("links"), F.array())
    )
