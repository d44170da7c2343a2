"""Vectorized label synthesis vs a literal per-sample oracle.

The oracle below re-states the reference semantics (utils/data_loader.py:57-97)
as a straightforward per-sample loop; the framework path must match
bit-for-bit.
"""

import numpy as np
import pytest

from hual_tpu.data.labels import gene_soft_label, make_span_labels


def oracle_labels(s_inds, e_inds, vlens, max_len):
    bsz = len(s_inds)
    s_labels = np.zeros((bsz, max_len), np.float32)
    e_labels = np.zeros((bsz, max_len), np.float32)
    match_labels = np.zeros((bsz, max_len), np.int32)
    inner_labels = np.zeros((bsz, max_len), np.int32)
    for idx in range(bsz):
        st, et, cur = int(s_inds[idx]), int(e_inds[idx]), int(vlens[idx])
        s_labels[idx][0:cur] = 1e-10
        e_labels[idx][0:cur] = 1e-10
        y = (1 - cur * 1e-10 - 0.5) / 2
        s_labels[idx][st] += 0.5
        if st > 0:
            s_labels[idx][st - 1] = y
        else:
            s_labels[idx][st] += y
        if st < cur - 1:
            s_labels[idx][st + 1] = y
        else:
            s_labels[idx][st] += y
        e_labels[idx][et] += 0.5
        if et > 0:
            e_labels[idx][et - 1] = y
        else:
            e_labels[idx][et] += y
        if et < cur - 1:
            e_labels[idx][et + 1] = y
        else:
            e_labels[idx][et] += y
        ext = 2
        st_l, st_r = max(0, st - ext), min(st + ext, cur - 1)
        et_l, et_r = max(0, et - ext), min(et + ext, cur - 1)
        if st_r >= et_l:
            st_r = max(st, et_l - 1)
        match_labels[idx][st_l:st_r + 1] = 1
        match_labels[idx][st_r + 1:et_l] = 2
        inner_labels[idx][st_r + 1:et_l] = 1
        match_labels[idx][et_l:et_r + 1] = 3
    return s_labels, e_labels, match_labels, inner_labels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    T = 64
    vlens = rng.integers(1, T + 1, size=100)
    s = (rng.uniform(0, 1, 100) * vlens).astype(np.int64)
    e = s + (rng.uniform(0, 1, 100) * (vlens - s)).astype(np.int64)
    e = np.minimum(e, vlens - 1)
    s = np.minimum(s, e)
    got = make_span_labels(s, e, vlens, T)
    want = oracle_labels(s, e, vlens, T)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_edge_cases():
    # single-frame video: both neighbor folds accumulate on the target
    s_lab, e_lab, match, inner = make_span_labels(
        np.array([0]), np.array([0]), np.array([1]), 8)
    y = (1 - 1 * 1e-10 - 0.5) / 2
    assert s_lab[0, 0] == pytest.approx(1e-10 + 0.5 + 2 * y)
    assert np.all(s_lab[0, 1:] == 0)
    assert match[0, 0] == 3  # E paints last
    assert inner.sum() == 0


def test_match_window_collision_clamp():
    # st=5, et=7, vlen=20: windows overlap -> st_r clamped to max(st, et_l-1)
    _, _, match, inner = make_span_labels(
        np.array([5]), np.array([7]), np.array([20]), 20)
    # st_l=3, st_r clamped to max(5, 5-1)=5; E window [5,9] painted last
    assert list(match[0][3:10]) == [1, 1, 3, 3, 3, 3, 3]
    assert inner[0].sum() == 0


def test_gene_soft_label_normalized():
    Ssoft, Esoft, Msoft = gene_soft_label(3, 10, 16, 20, 0.3)
    assert Ssoft.sum() == pytest.approx(1.0, abs=1e-5)
    assert Esoft.sum() == pytest.approx(1.0, abs=1e-5)
    assert np.all(Ssoft[16:] == 0)
    assert Msoft.shape == (20, 4)
