"""r10 additions: the LSH banding design table and the per-language
tokenizer fertility gate."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_minhash_band_tuning_scurve_properties(spark):
    from sift_spark.functions.core import MINHASH_BANDS, MINHASH_ROWS
    from sift_spark.operators.dedup import minhash_band_tuning

    rows = {r.bands: r for r in minhash_band_tuning(spark, threshold=0.8).collect()}
    # every factorization of k=16 present
    assert sorted(rows) == [1, 2, 4, 8, 16]
    # collision probability at the threshold is monotone in bands;
    # the curve midpoint moves the other way
    bands = sorted(rows)
    for a, b in zip(bands, bands[1:]):
        assert rows[a].collide_at_threshold < rows[b].collide_at_threshold
        assert rows[a].s_curve_midpoint > rows[b].s_curve_midpoint
    for r in rows.values():
        # fn is the exact complement (same expression tree, same round)
        assert abs((1 - r.collide_at_threshold) - r.fn_at_threshold) < 2e-6
        assert 0.0 <= r.collide_at_low <= r.collide_at_threshold
    # the DEPLOYED banding (4x4) sits on the usable part of the curve:
    # >=85% collision for true pairs at 0.8, <10% at 0.4 — consistent
    # with lsh_recall_probe measuring recall 1.0 on the test corpora
    dep = rows[MINHASH_BANDS]
    assert dep.rows_per_band == MINHASH_ROWS
    assert dep.collide_at_threshold > 0.85
    assert dep.collide_at_low < 0.1


def test_tokenizer_fertility_hand_computed(spark):
    from sift_spark.operators.text_analysis import tokenizer_fertility

    docs = spark.createDataFrame(
        [
            (1, "aaaa bb", "en"),      # subwords: ceil(4/4)+ceil(2/4) = 2; words 2; chars 7
            (2, "cccccccc", "en"),     # subwords: 2; words 1; chars 8
            (3, "dd", "de"),           # subwords: 1; words 1; chars 2
        ],
        ["doc_id", "text", "lang"],
    )
    out = {r.lang: r for r in tokenizer_fertility(docs).collect()}
    en, de = out["en"], out["de"]
    assert (en.n_docs, en.total_words, en.total_subwords) == (2, 3, 4)
    assert abs(en.fertility - round(4 / 3, 6)) < 1e-9
    assert abs(en.chars_per_subword - round(15 / 4, 6)) < 1e-9
    assert (de.total_words, de.total_subwords, de.fertility) == (1, 1, 1.0)


def test_tokenizer_fertility_runs_on_corpus(spark):
    from sift_spark.operators.text_analysis import tokenizer_fertility

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = tokenizer_fertility(docs).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r.fertility is not None and r.fertility >= 1.0 - 1e-9
