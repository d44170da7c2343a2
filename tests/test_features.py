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
