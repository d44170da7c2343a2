"""Active-learning engine numerics, cross-checked against independent
implementations (torch for the segmented span decode, literal loops for the
geometry)."""

import numpy as np
import pytest

from hual_tpu.active.coefficients import F_RENEW, get_coff
from hual_tpu.active.renew import (_segmented_span_decode, append_annotation,
                                   mask_activepoints, renew_label)
from hual_tpu.active.uncertainty import (center_width_gauss, distance_score,
                                         distance_score_shift, fill_isactivate,
                                         model_uncertainty_batch, sigmoid,
                                         zero_runs)


def test_get_coff():
    c = get_coff(F_RENEW, "charades", 1)
    assert c.pos.distance == 4.0 and c.neg.model == 2.4 and c.uncert == 0.25
    c2 = get_coff(F_RENEW, "charades", 2)
    assert c2.pos.distance == 0.2


def test_get_coff_extrapolates_past_round_six():
    """The reference table stops at round 6; rounds 7..10 (the 10-round loop
    target) hold the round-6 weights — a documented extrapolation."""
    import pytest

    last = get_coff(F_RENEW, "charades", 6)
    for i in (7, 10, 25):
        assert get_coff(F_RENEW, "charades", i) == last
    assert get_coff(F_RENEW, "anet", 10) == get_coff(F_RENEW, "anet", 6)
    with pytest.raises(ValueError):
        get_coff(F_RENEW, "charades", 0)


def test_fill_isactivate_positives_and_negatives():
    a = fill_isactivate([5, 8], [2, 12], vlen=14, max_vlen=16)
    assert np.all(a[5:9] == 1)       # span between extreme positives
    assert np.all(a[:3] == -1)       # beyond left bracketing negative
    assert np.all(a[12:14] == -1)    # beyond right bracketing negative
    assert np.all(a[14:] == -100)    # past vlen
    assert np.all(a[3:5] == 0) and np.all(a[9:12] == 0)


def test_fill_isactivate_only_negatives():
    a = fill_isactivate([], [3, 7], vlen=10, max_vlen=12)
    assert a[3] == -1 and a[7] == -1
    assert np.all(a[[0, 1, 2, 4, 5, 6, 8, 9]] == 0)


def test_zero_runs_matches_scan():
    rng = np.random.default_rng(3)
    for _ in range(50):
        a = rng.choice([0.0, 1.0, -1.0, -100.0], size=30,
                       p=[0.5, 0.2, 0.2, 0.1])
        runs = zero_runs(a)
        # independent scan
        want, i = [], 0
        while i < len(a):
            if a[i] == 0:
                j = i
                while j < len(a) and a[j] == 0:
                    j += 1
                want.append([i, j - 1])
                i = j
            else:
                i += 1
        assert runs == want


def test_center_width_gauss_properties():
    g = center_width_gauss(center=8, width=6, vlen=16, max_vlen=20)
    assert g.shape == (20,)
    assert np.all(g[16:] == 0)
    assert g.max() == pytest.approx(6 / 16)       # peak scaled by width/vlen
    assert np.argmax(g) == 8


def test_distance_score_peaks_in_segments():
    score = distance_score([5, 8], [2, 12], vlen=14, max_vlen=16)
    # unannotated zero-runs are [3,4] and [9,11]
    assert score[3] > 0 and score[10] > 0
    assert score[6] == 0 and score[0] == 0 and score[13] == 0
    s_sh, e_sh = distance_score_shift([5, 8], [2, 12], 14, 16, shift=-0.3)
    assert s_sh.shape == e_sh.shape == (16,)


def test_model_uncertainty_batch_matches_scalar():
    rng = np.random.default_rng(5)
    N, T = 10, 16
    s1, e1, s2, e2 = [rng.normal(size=(N, T)) for _ in range(4)]
    vlens = rng.integers(4, T + 1, size=N)
    got = model_uncertainty_batch(s1, e1, s2, e2, vlens)
    for i in range(N):
        su = np.abs(sigmoid(s1[i]) - sigmoid(s2[i]))
        eu = np.abs(sigmoid(e1[i]) - sigmoid(e2[i]))
        want = su + eu
        want[vlens[i]:] = 0
        np.testing.assert_allclose(got[i], want, rtol=1e-12)


def test_append_annotation_oracle():
    ap = {"pos_idx": [], "neg_idx": []}
    append_annotation(5, ap, (3, 8))
    append_annotation(1, ap, (3, 8))
    assert ap == {"pos_idx": [5], "neg_idx": [1]}


def test_mask_activepoints_with_positives():
    s = np.ones(16)
    e = np.ones(16)
    s2, e2 = mask_activepoints(s.copy(), e.copy(), pos_idx=[6, 9],
                               neg_idx=[2, 13], vlen=16)
    # start must be <= min pos (6) and > left neg (2)
    assert np.all(s2[7:] == 0) and np.all(s2[:3] == 0) and np.all(s2[3:7] == 1)
    # end must be >= max pos (9) and < right neg (13)
    assert np.all(e2[:9] == 0) and np.all(e2[13:] == 0) and np.all(e2[9:13] == 1)


def test_segmented_span_decode_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(11)
    for _ in range(25):
        vlen = int(rng.integers(6, 20))
        max_vlen = vlen + int(rng.integers(0, 5))
        s = rng.uniform(0, 1, max_vlen)
        e = rng.uniform(0, 1, max_vlen)
        negs = sorted(rng.choice(np.arange(vlen), size=rng.integers(0, 3),
                                 replace=False).tolist())
        got = _segmented_span_decode(s, e, negs, vlen)
        # independent torch implementation of the same decode
        sp, ep = torch.from_numpy(s), torch.from_numpy(e)
        outer = torch.matmul(sp.unsqueeze(1), ep.unsqueeze(0))
        m = torch.zeros_like(outer)
        bounds = sorted(negs + [-1, vlen])
        for i in range(len(bounds) - 1):
            ll, rr = bounds[i], bounds[i + 1]
            m[ll + 1:rr, ll + 1:rr] = outer[ll + 1:rr, ll + 1:rr]
        m = torch.triu(m, diagonal=0)
        _, sidx = torch.max(torch.max(m, dim=1)[0], dim=0)
        _, eidx = torch.max(torch.max(m, dim=0)[0], dim=0)
        assert got == (sidx.item(), eidx.item())


def test_renew_label_respects_positive_constraints():
    rng = np.random.default_rng(13)
    coff = get_coff(F_RENEW, "charades", 1)
    vlen, max_vlen = 20, 24
    sprob = rng.uniform(0, 1, max_vlen)
    eprob = rng.uniform(0, 1, max_vlen)
    ap = {"pos_idx": [8, 11], "neg_idx": [3, 16]}
    sidx, eidx = renew_label([5, 14], ap, sprob, eprob, vlen, max_vlen, coff)
    assert 3 < sidx <= 8          # start after left neg, at/before min pos
    assert 11 <= eidx < 16        # end at/after max pos, before right neg


def test_renew_label_neg_only_stays_in_segment():
    rng = np.random.default_rng(17)
    coff = get_coff(F_RENEW, "charades", 1)
    vlen, max_vlen = 16, 16
    sprob = rng.uniform(0, 1, max_vlen)
    eprob = rng.uniform(0, 1, max_vlen)
    ap = {"pos_idx": [], "neg_idx": [7]}
    sidx, eidx = renew_label([4, 12], ap, sprob, eprob, vlen, max_vlen, coff)
    assert sidx <= eidx
    # the decoded span must not cross the negative point
    assert not (sidx <= 7 <= eidx)


def test_rank_uncertainty_accepts_ragged_reference_pickles():
    """Reference-written pickles pad logits to the per-batch max v_len
    (utils/data_utils.py:158-172), so rows can be ragged; rank_uncertainty
    must pad-and-stack them, and padding must not change the scores."""
    from hual_tpu.active.engine import rank_uncertainty

    rng = np.random.default_rng(3)
    T_full, n = 16, 6
    vlens = [16, 9, 12, 16, 7, 10]
    widths = [16, 9, 16, 16, 8, 12]   # per-record storage width >= vlen
    data_old, data_gt, last_prop = [], [], []
    for i, (vlen, w) in enumerate(zip(vlens, widths)):
        dur = 20.0
        data_old.append([f"v{i}", dur, [2.0, 9.0], "q",
                         {"pos_idx": [], "neg_idx": []}])
        data_gt.append([f"v{i}", dur, [3.0, 10.0], "q"])
        mk = lambda: rng.normal(size=w).astype(np.float32)
        last_prop.append({
            "vid": f"v{i}", "v_len": vlen, "duration": dur,
            "prop_logits": [mk(), mk()],
            "prop_logits1": [mk(), mk()],
            "prop_logits2": [mk(), mk()],
        })
    coff = get_coff(F_RENEW, "charades", 1)
    ranking = rank_uncertainty(data_old, data_gt, last_prop, coff)
    assert len(ranking) == n
    # scores match the per-sample scalar path on each record's own width
    for rec in ranking:
        p = last_prop[rec["idx"]]
        u = model_uncertainty_batch(
            p["prop_logits1"][0][None], p["prop_logits1"][1][None],
            p["prop_logits2"][0][None], p["prop_logits2"][1][None],
            np.asarray([p["v_len"]]))[0]
        assert np.isclose(rec["uncert_video"], u.sum())
