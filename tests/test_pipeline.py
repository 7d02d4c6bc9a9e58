"""Composed-pipeline guards (VERDICT r10 ask #1).

The claim under test: the fused end-to-end graph with shared
token/shingle artifacts produces EXACTLY the outputs of running each
stage independently with no artifact reuse — sharing changes where
rows come from, never what they are — and the shard export is
deterministic (same manifest on re-run)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

BUDGET = 150  # well under the post-filter survivor count at sf0.001,
# so the temperature mix stage demonstrably downsamples


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


@pytest.fixture(scope="module")
def both_variants(spark):
    from sift_spark.pipeline import llm_training_pipeline

    shared = llm_training_pipeline(
        spark, SF_SMOKE, temp_budget=BUDGET, share_artifacts=True
    )
    solo = llm_training_pipeline(
        spark, SF_SMOKE, temp_budget=BUDGET, share_artifacts=False
    )
    return shared, solo


def test_every_stage_equal_with_and_without_artifact_sharing(both_variants):
    shared, solo = both_variants
    for stage in ("filtered", "deduped", "decontaminated", "mixed"):
        assert _ids(shared[stage]) == _ids(solo[stage]), stage


def test_stage_funnel_monotone_and_nonempty(both_variants):
    shared, _ = both_variants
    counts = {
        s: shared[s].count()
        for s in ("train", "filtered", "deduped", "decontaminated", "mixed")
    }
    order = ["train", "filtered", "deduped", "decontaminated", "mixed"]
    for a, b in zip(order, order[1:]):
        assert counts[a] >= counts[b], (a, b, counts)
    assert counts["mixed"] > 0, counts
    # every stage must DO something on the smoke corpus — a stage that
    # never drops a row here isn't being exercised by the test
    assert counts["filtered"] < counts["train"], counts
    assert counts["mixed"] < counts["decontaminated"], counts


def test_packing_matches_registered_operator(both_variants, spark):
    """The pipeline's pack stage must equal pack_sequences_sharded run
    directly over the surviving docs' token counts."""
    from pyspark.sql import functions as F

    from sift_spark.models.text import tokens_col
    from sift_spark.operators.sampling import pack_sequences_sharded
    from sift_spark.io import table

    shared, solo = both_variants
    raw = table(spark, SF_SMOKE, "documents")
    surv = raw.join(shared["mixed"].select("doc_id"), "doc_id", "left_semi")
    sized = surv.select(
        "doc_id", F.size(tokens_col(surv)).cast("bigint").alias("n_tokens")
    )
    want = {
        (r["doc_id"], r["n_tokens"], r["shard_id"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences_sharded(sized).collect()
    }
    for variant in (shared, solo):
        got = {
            (r["doc_id"], r["n_tokens"], r["shard_id"], r["bin_id"], r["bin_offset"])
            for r in variant["packed"].collect()
        }
        assert got == want


def test_shard_export_manifest_deterministic(spark, tmp_path):
    from sift_spark.pipeline import (
        llm_training_pipeline,
        shard_manifest,
        write_pipeline_shards,
    )

    manifests = []
    for run in ("a", "b"):
        stages = llm_training_pipeline(
            spark, SF_SMOKE, temp_budget=BUDGET, share_artifacts=(run == "a")
        )
        out = str(tmp_path / f"shards_{run}")
        write_pipeline_shards(stages, out)
        manifests.append(shard_manifest(spark, out))
    assert manifests[0] == manifests[1]
    assert sum(m["n_rows"] for m in manifests[0]) > 0
