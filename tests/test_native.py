"""Native batch-assembly kernels vs their numpy reference semantics."""
import numpy as np
import pytest

from flipped_tpu import native
from flipped_tpu.data.feature_store import uniform_downsample


def test_native_builds():
    assert native.available(), "g++ build of libfeature_pack.so failed"


def test_pack_features_matches_numpy():
    rs = np.random.RandomState(0)
    feats = [rs.randn(n, 8).astype(np.float32) for n in (20, 3, 10, 1)]
    out, lens = native.pack_features_batch(feats, max_feats=10, dim=8)
    assert out.shape == (4, 10, 8)
    for i, f in enumerate(feats):
        ref, ref_len = uniform_downsample(f, 10, 8)
        np.testing.assert_array_equal(out[i], ref)
        assert lens[i] == ref_len


def test_pack_lm_labels_matches_numpy():
    text = np.array([[1, 5, 6, 7, 2, -1, -1],
                     [1, -2, -2, 9, 4, 2, -1]], np.int32)
    prefix = np.array([3, 3])
    labels, mask, clean = native.pack_lm_labels(text, prefix)
    assert labels.tolist() == [[0, 0, 0, 7, 2, 0, 0], [0, 0, 0, 9, 4, 2, 0]]
    assert mask.tolist() == [[0, 0, 0, 1, 1, 0, 0], [0, 0, 0, 1, 1, 1, 0]]
    assert clean.tolist() == [[1, 5, 6, 7, 2, 0, 0], [1, 0, 0, 9, 4, 2, 0]]
