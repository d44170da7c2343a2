import numpy as np
import pytest

from hual_tpu.data.features import FeatureStore, visual_feature_sampling


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
