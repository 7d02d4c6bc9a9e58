"""Property tests for the SRAW/SVID codec (pure Python — no Spark)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from sift_spark.operators.multimodal import (
    decode_sraw,
    encode_sraw,
    encode_svid,
    svid_frames,
)


@settings(max_examples=50, deadline=None)
@given(
    arr=st.tuples(
        st.integers(1, 48), st.integers(1, 48), st.sampled_from([1, 3, 4])
    ).flatmap(lambda s: arrays(np.uint8, s))
)
def test_sraw_roundtrip(arr):
    out = decode_sraw(encode_sraw(arr))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


@settings(max_examples=20, deadline=None)
@given(
    frames=st.lists(
        arrays(np.uint8, (8, 6, 3)), min_size=1, max_size=6
    )
)
def test_svid_roundtrip(frames):
    blobs = svid_frames(encode_svid(frames))
    assert len(blobs) == len(frames)
    for blob, frame in zip(blobs, frames):
        assert np.array_equal(decode_sraw(blob), frame)


def test_sraw_grayscale_2d_input():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_sraw(encode_sraw(g))
    assert out.shape == (3, 4, 1)
    assert np.array_equal(out[:, :, 0], g)


def test_magic_rejects_foreign_bytes():
    with pytest.raises(ValueError):
        decode_sraw(b"\x89PNG\r\n\x1a\n garbage")
    with pytest.raises(ValueError):
        svid_frames(b"RIFFxxxxWEBP")
