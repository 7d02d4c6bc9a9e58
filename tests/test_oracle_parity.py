"""Every queries() entry must hash-match its DuckDB oracle — the same
check the driver runs at sf0.01, run here at sf0.001 for speed."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.parity import assert_parity, duck_con


def _pairs():
    from sift_spark.oracle import ORACLE
    from sift_spark.queries import QUERIES

    for name in QUERIES:
        if name in ORACLE:
            yield name


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", list(_pairs()))
def test_parity(spark, con, name):
    from sift_spark.oracle import ORACLE
    from sift_spark.queries import QUERIES

    df = QUERIES[name](spark, SF_SMOKE)
    assert_parity(df, con, ORACLE[name], name)


def test_all_queries_have_oracle_or_are_declared():
    from sift_spark.oracle import ORACLE
    from sift_spark.queries import QUERIES

    # queries without oracle must be the explicitly-declared [r] set
    declared_rows_only = {
        "skipgram_embeddings",
        # (r11: the multimodal family moved OUT of this set — synth
        # payloads are a closed form of doc_id, so generate_series
        # twins verify the decode/resize/frame kernels hash-exactly)
        # iterative driver-argmax loop; verified vs a Python reference
        "bpe_train",
        # applies bpe_train's merge table (driver-resident fold chain);
        # verified vs a pure-Python encoder in test_text_analysis
        "bpe_encode",
        # d×d eigendecomposition of a DATA-DEPENDENT covariance — not
        # expressible as a static SQL oracle (literal components would
        # break at other SFs and be mirroring); verified vs a full-data
        # numpy PCA at sf0.001 (test_new_ops_r3) AND at the driver's
        # sf0.01 plus partition-layout invariance (test_pca_r9)
        "embedding_pca",
        # hard-EM unigram tokenizer: verified exactly vs a pure-Python
        # reference in test_tokenizer
        "unigram_train",
    }
    missing = set(QUERIES) - set(ORACLE) - declared_rows_only
    assert not missing, f"queries missing oracle twins: {missing}"
