"""Native parallel .npy loader vs the NumPy reference path."""

import os

import numpy as np
import pytest

from hual_tpu.data.features import (FeatureStore, load_video_features,
                                    visual_feature_sampling)
from hual_tpu import native


@pytest.fixture(scope="module")
def feature_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feats")
    rng = np.random.default_rng(0)
    for i, n in enumerate([5, 64, 65, 100, 129, 7]):
        np.save(d / f"v{i}.npy", rng.normal(size=(n, 24)).astype(np.float32))
    # f8 file (native handles), and a 1-D file (native falls back)
    np.save(d / "v_f8.npy", rng.normal(size=(80, 24)))
    np.save(d / "v_1d.npy", rng.normal(size=(24,)).astype(np.float32))
    return str(d)


def test_native_builds():
    assert native.get_lib() is not None, "g++ build of npy_loader failed"


def test_native_matches_numpy_path(feature_dir):
    max_vlen = 64
    # numpy reference path (skip the 1-D file it can't represent)
    ref = load_video_features(feature_dir, max_vlen)

    files = sorted(os.listdir(feature_dir))
    paths = [os.path.join(feature_dir, f) for f in files if f.endswith(".npy")]
    packed, lengths, statuses = native.load_npy_batch(paths, max_vlen, 24)
    for i, p in enumerate(paths):
        vid = os.path.basename(p)[:-4]
        if statuses[i] != 0:
            assert vid == "v_1d"  # only the 1-D file is unsupported
            continue
        want = ref[vid]
        n = want.shape[0]
        assert lengths[i] == n
        np.testing.assert_allclose(packed[i, :n], want, rtol=1e-5, atol=1e-6)
        assert np.all(packed[i, n:] == 0)


def test_feature_store_native_equals_python(feature_dir):
    # remove the 1-D file's influence by comparing stores built both ways
    s_native = FeatureStore.from_dir(feature_dir, 64, use_native=True)
    s_python = FeatureStore.from_dir(feature_dir, 64, use_native=False)
    assert set(s_native.vid_index) == set(s_python.vid_index)
    for vid in s_python.vid_index:
        if vid == "v_1d":
            continue
        a = s_native.packed[s_native.vid_index[vid]]
        b = s_python.packed[s_python.vid_index[vid]]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        assert (s_native.lengths[s_native.vid_index[vid]]
                == s_python.lengths[s_python.vid_index[vid]])


def test_downsample_boundaries_match_native(feature_dir):
    # the bucket-mean rounding (half-to-even) must agree with np.round
    rng = np.random.default_rng(5)
    d = os.path.join(feature_dir, "boundary.npy")
    feat = rng.normal(size=(999, 24)).astype(np.float32)
    np.save(d, feat)
    packed, lengths, statuses = native.load_npy_batch([d], 64, 24)
    assert statuses[0] == 0
    want = visual_feature_sampling(feat, 64)
    np.testing.assert_allclose(packed[0], want, rtol=1e-5, atol=1e-6)
