"""The composed LLM training-data pipeline (VERDICT r10 ask #1).

One lazy job graph from raw documents to packed training shards —
the end-to-end composition a pre-training data team actually runs,
built from the SAME [q]-verified operators the registry checks one
by one:

    raw docs
      → hold out an eval slice (train_test_split)
      → gopher rule filter + heuristic quality floor   [map-side]
      → exact dedup + banded MinHash-LSH near-dedup    [keyed shuffles]
      → contamination screen vs the held-out eval set  [broadcast]
      → temperature source mix                         [broadcast]
      → per-shard greedy sequence packing              [sharded windows]
      → deterministic shard export (write_training_shards)

Artifact sharing is the point: the session token artifact
(``corpus_artifacts(spark, sf_dir).tokens()``) and the shingle
artifact feed gopher/quality (token arrays), the MinHash signatures
AND the jaccard verify (shingles), the contamination probe
(shingles), and the packer (n_tokens) — the corpus is tokenized ONCE
and hashed ONCE for the whole pipeline, instead of once per stage.
Stage survivors travel as slim id-frames; the wide text column is
joined back exactly twice (exact-dedup's text hash, final export),
which is the 100 TB discipline: never shuffle text you can shuffle
an 8-byte id for.

Scale shape by stage (local[32] measurements in PIPELINE_sf5.json):
filters are pure projections fused into the scan; dedup shuffles are
keyed on text-hash / band buckets (never all-pairs); the
contamination and mix dims broadcast; packing is n_shards parallel
sorted windows; the export is exactly one range shuffle.

The composed-equals-staged guarantee is tested: running the fused
graph (one action at the end) produces byte-identical stage outputs
to materializing every stage separately without any shared artifacts
(tests/test_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sift_spark.caching import local_persist

DEFAULTS = dict(
    eval_fraction=0.02,
    min_quality=0.5,
    dedup_threshold=0.8,
    contamination_max=0.2,
    temp_alpha=0.3,
    n_shards=8,
    max_tokens=2048,
)


def llm_training_pipeline(
    spark: SparkSession,
    sf_dir: str,
    *,
    temp_budget: int,
    eval_fraction: float = DEFAULTS["eval_fraction"],
    min_quality: float = DEFAULTS["min_quality"],
    dedup_threshold: float = DEFAULTS["dedup_threshold"],
    contamination_max: float = DEFAULTS["contamination_max"],
    temp_alpha: float = DEFAULTS["temp_alpha"],
    n_shards: int = DEFAULTS["n_shards"],
    max_tokens: int = DEFAULTS["max_tokens"],
    share_artifacts: bool = True,
    persist_boundaries: bool = False,
) -> dict[str, DataFrame]:
    """Build the lazy stage graph; returns a dict of stage frames.

    ``temp_budget`` is the target document budget of the temperature
    mix (the one knob with no scale-free default — pass ≈ the share
    of the corpus you want to train on). ``share_artifacts=False``
    rebuilds tokens/shingles from raw text inside every stage — the
    semantics-identical no-reuse variant the composed-equals-staged
    test compares against (and the measurement of what sharing buys).

    Stage frames returned (all lazy; executing ``packed`` or
    ``export`` runs the whole composition as one job graph):
      raw, eval_set, train, filtered, deduped, decontaminated,
      mixed, packed, export (packed joined back to text — the frame
      ``write_training_shards`` exports).

    ``persist_boundaries=True`` marks each stage-survivor frame
    persisted (LAZY — no extra job; the cache fills inside the one
    export action). Without it the fused graph RECOMPUTES shared
    stage sub-plans wherever two downstream branches reference the
    same stage (measured at sf5, fresh JVMs: 31.9s fused-with-
    persists vs 55.7s without — PIPELINE_sf5.json; the no-artifact
    variant lands at 56.5s, so boundary persistence and artifact
    sharing each buy ~40%); with it the single action reuses each
    boundary like the staged run does. Off by default only because a
    caller who materializes stages themselves (the staged accounting
    run) would double-persist.
    """
    from sift_spark.io import table
    from sift_spark.operators.dedup import dedup_apply, dedup_exact, minhash_lsh_pairs
    from sift_spark.operators.sampling import (
        hash_bucket,
        pack_sequences_sharded,
        temperature_sample,
    )
    from sift_spark.operators.text_analysis import (
        contamination_check,
        gopher_rules,
        quality_score,
    )

    raw = table(spark, sf_dir, "documents")
    # ppm-granularity split (same keyed-hash family as
    # train_test_split, which cuts at PERCENT granularity — too coarse
    # for the fixed-size eval slice a big corpus wants: 200/250k docs
    # is 0.08%, which a percent cut rounds to an EMPTY eval set)
    ppm = F.lit(max(1, round(eval_fraction * 1_000_000)))
    bucket = hash_bucket(F.col("doc_id"), "split", 1_000_000)
    train, eval_set = raw.where(bucket >= ppm), raw.where(bucket < ppm)

    if share_artifacts:
        from sift_spark.queries import corpus_artifacts

        arts = corpus_artifacts(spark, sf_dir)
        tok_all, sh_all = arts.tokens(), arts.shingles(3)
    else:
        tok_all = sh_all = None

    def _tok(ids: DataFrame) -> DataFrame:
        """Token-artifact slice for a survivor id-frame (falls back to
        raw text when sharing is off — tokens_col re-splits)."""
        base = tok_all if tok_all is not None else raw
        return base.join(ids.select("doc_id"), "doc_id", "left_semi")

    def _sh(ids: DataFrame) -> DataFrame | None:
        if sh_all is None:
            return None
        return sh_all.join(ids.select("doc_id"), "doc_id", "left_semi")

    # --- stage 1: gopher rules + quality floor (both map-side) ----------
    t_train = _tok(train)
    g_keep = gopher_rules(t_train).where(F.col("passes")).select("doc_id")
    q_keep = (
        quality_score(t_train)
        .where(F.col("score") >= min_quality)
        .select("doc_id")
    )
    filtered = train.join(g_keep, "doc_id", "left_semi").join(
        q_keep, "doc_id", "left_semi"
    )
    if persist_boundaries:
        filtered = local_persist(filtered, eager=False)

    # --- stage 2: exact dedup + banded MinHash near-dedup ---------------
    d1 = dedup_exact(filtered)  # keeps the lowest doc_id per distinct text
    pairs = minhash_lsh_pairs(d1, threshold=dedup_threshold, sh=_sh(d1))
    # dedup_apply projects the slim doc columns; re-join for the text
    deduped = filtered.join(
        dedup_apply(d1.select("doc_id", "lang", "source", "n_chars"), pairs)
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    if persist_boundaries:
        deduped = local_persist(deduped, eager=False)

    # --- stage 3: contamination screen vs the held-out eval set ---------
    cont = contamination_check(deduped, eval_set, sh=_sh(deduped))
    c_keep = cont.where(F.col("contamination") <= contamination_max).select("doc_id")
    decontaminated = deduped.join(c_keep, "doc_id", "left_semi")
    if persist_boundaries:
        decontaminated = local_persist(decontaminated, eager=False)

    # --- stage 4: temperature source mix --------------------------------
    mixed = decontaminated.join(
        temperature_sample(
            decontaminated, alpha=temp_alpha, budget=temp_budget
        ).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    if persist_boundaries:
        mixed = local_persist(mixed, eager=False)

    # --- stage 5: per-shard greedy packing ------------------------------
    from sift_spark.models.text import tokens_col

    t_mixed = _tok(mixed)
    sized = t_mixed.select(
        "doc_id", F.size(tokens_col(t_mixed)).cast("bigint").alias("n_tokens")
    )
    packed = pack_sequences_sharded(
        sized, n_shards=n_shards, max_tokens=max_tokens
    )

    # --- stage 6: export frame (write_training_shards writes this) ------
    export = packed.join(raw.select("doc_id", "text", "lang", "source"), "doc_id")

    return {
        "raw": raw,
        "eval_set": eval_set,
        "train": train,
        "filtered": filtered,
        "deduped": deduped,
        "decontaminated": decontaminated,
        "mixed": mixed,
        "packed": packed,
        "export": export,
    }


def write_pipeline_shards(stages: dict[str, DataFrame], path: str,
                          n_shards: int = DEFAULTS["n_shards"]) -> None:
    """Export the pipeline's packed corpus with the deterministic
    global shuffle of :func:`~sift_spark.operators.scale.write_training_shards`
    — executing this single action runs the ENTIRE composed graph."""
    from sift_spark.operators.scale import write_training_shards

    write_training_shards(stages["export"], path, n_shards)


def shard_manifest(spark: SparkSession, path: str) -> list[dict]:
    """Hash-stable manifest of a written shard directory: one row per
    parquet part file with its row count and an ORDER-INDEPENDENT
    content hash (xor-free sum of per-row xxhash64 over the packed
    columns) — two exports are byte-equivalent iff their manifests
    match, regardless of task scheduling."""
    df = (
        spark.read.parquet(path)
        # key on the __shard partition column the export layout
        # recovers — a pure function of the row's hash, stable across
        # runs (filenames embed per-write UUIDs; part indexes would be
        # hash-permuted)
        .withColumn("__file", F.col("__shard").cast("int"))
        .withColumn(
            "__h",
            F.xxhash64(
                F.col("doc_id").cast("string"),
                F.col("shard_id").cast("string"),
                F.col("bin_id").cast("string"),
                F.col("bin_offset").cast("string"),
                F.col("n_tokens").cast("string"),
                F.col("text"),
            ),
        )
    )
    rows = (
        df.groupBy("__file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # decimal sum: exact and overflow-safe regardless of corpus size
            F.sum(F.col("__h").cast("decimal(38,0)")).alias("content_hash"),
        )
        .orderBy("__file")
        .collect()
    )
    return [
        {"part": r["__file"], "n_rows": r["n_rows"],
         "content_hash": str(r["content_hash"])}
        for r in rows
    ]
