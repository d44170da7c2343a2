import numpy as np
import pytest

from hual_tpu.data.features import (FeatureStore, quantize_features,
                                    visual_feature_sampling)


def naive_sampling(feature, max_num_clips):
    """Literal restatement of the reference bucket-mean downsampler
    (utils/data_utils.py:70-85) for cross-checking."""
    num_clips = feature.shape[0]
    if num_clips <= max_num_clips:
        return feature
    idxs = np.arange(0, max_num_clips + 1, 1.0) / max_num_clips * num_clips
    idxs = np.round(idxs).astype(np.int32)
    idxs[idxs > num_clips - 1] = num_clips - 1
    out = []
    for i in range(max_num_clips):
        s, e = idxs[i], idxs[i + 1]
        out.append(np.mean(feature[s:e], axis=0) if s < e else feature[s])
    return np.asarray(out)


@pytest.mark.parametrize("n,maxn", [(100, 64), (65, 64), (64, 64), (10, 64),
                                    (129, 64), (1000, 100), (101, 100)])
def test_sampling_matches_naive(n, maxn):
    rng = np.random.default_rng(n)
    feat = rng.normal(size=(n, 16)).astype(np.float32)
    got = visual_feature_sampling(feat, maxn)
    want = naive_sampling(feat, maxn)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_short_video_passthrough():
    feat = np.ones((5, 8), np.float32)
    out = visual_feature_sampling(feat, 64)
    assert out.shape == (5, 8)


def test_prefetch_iterator():
    """Host-pipeline prefetch utility (for splits too large for HBM)."""
    from hual_tpu.data.loader import prefetch

    assert list(prefetch(iter(range(10)), depth=2)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_feature_store_pack_and_gather():
    feats = {"a": np.ones((5, 8), np.float32),
             "b": 2 * np.ones((12, 8), np.float32)}
    store = FeatureStore(feats, max_vlen=10)
    rows = store.rows(["b", "a"])
    packed, lengths = store.gather(rows)
    assert packed.shape == (2, 10, 8)
    assert list(lengths) == [10, 5]
    assert np.all(packed[1, 5:] == 0)  # zero padding past vlen
    assert np.all(packed[0] == 2)


def test_quantize_features_error_bound_and_zero_rows():
    """int8 storage (model.feature_dtype='int8'): per-element dequant error
    is bounded by scale/2 = amax/254 per clip; all-zero (padding) clips
    dequantize to exact zeros."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 5, 16)).astype(np.float32) * 10
    x[2] = 0.0          # a whole zero video
    x[4, 3:] = 0.0      # zero padding rows inside a video
    q, scales = quantize_features(x)
    assert q.dtype == np.int8 and q.shape == x.shape
    assert scales.dtype == np.float32 and scales.shape == x.shape[:2]
    deq = q.astype(np.float32) * scales[..., None]
    amax = np.abs(x).max(axis=-1)
    bound = np.maximum(amax / 254.0, 1e-12)[..., None] + 1e-7
    assert np.all(np.abs(deq - x) < bound)
    assert np.all(deq[2] == 0.0)
    assert np.all(deq[4, 3:] == 0.0)
    assert np.all(scales[2] == 1.0)


def test_quantize_features_chunking_invariant():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(10, 4, 8)).astype(np.float32)
    q1, s1 = quantize_features(x, chunk_rows=3)
    q2, s2 = quantize_features(x, chunk_rows=4096)
    np.testing.assert_array_equal(q1, q2)
    np.testing.assert_array_equal(s1, s2)


def test_synthetic_queries_per_video_share_features(tmp_path):
    """queries_per_video>1 (real-data shape: ActivityNet ~3.4 moments/video):
    records share videos; the packed table stays per-video."""
    import json
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_data import make_dataset

    make_dataset(str(tmp_path), task="anet", n_train=10, n_test=5, vdim=16,
                 max_raw_len=20, seed=3, queries_per_video=3)
    feat_dir = os.path.join(str(tmp_path), "data", "features", "anet_i3d")
    npys = [f for f in os.listdir(feat_dir) if f.endswith(".npy")]
    # ceil(10/3)=4 train videos + ceil(5/3)=2 test videos
    assert len(npys) == 6
    train = json.load(open(os.path.join(str(tmp_path), "data", "anet_gt",
                                        "train.json")))
    assert len(train) == 10
    assert len({r[0] for r in train}) == 4   # shared vids
    # records of one vid agree on duration; store loads each vid once
    store = FeatureStore.from_dir(feat_dir, max_vlen=8)
    assert store.packed.shape[0] == 6
    by_vid = {}
    for vid, dur, span, sent in train:
        by_vid.setdefault(vid, set()).add(dur)
    assert all(len(d) == 1 for d in by_vid.values())
