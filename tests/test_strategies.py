"""Annotation-selection strategy ablations (random / dichotomy / all)."""

import numpy as np
import pytest

from hual_tpu.active.coefficients import F_RENEW, get_coff
from hual_tpu.active.engine import choose_observation_point, renew_dataset


def _record(vlen=16, max_vlen=16, pos=None, neg=None, uncert=None):
    return {
        "idx": 0, "gt_idx": [4, 9], "old_idx": [3, 10],
        "old_ap": {"pos_idx": pos or [], "neg_idx": neg or []},
        "vlen": vlen, "max_vlen": max_vlen, "duration": 20.0,
        "uncert_frame": uncert if uncert is not None else np.zeros(max_vlen),
        "uncert_video": 0.0,
        "sprob": np.random.default_rng(0).uniform(0, 1, max_vlen),
        "eprob": np.random.default_rng(1).uniform(0, 1, max_vlen),
    }


def test_uncertainty_point_is_argmax():
    u = np.zeros(16)
    u[7] = 5.0
    assert choose_observation_point(_record(uncert=u), "uncertainty", None) == 7


def test_random_point_in_range():
    rng = np.random.default_rng(3)
    pts = {choose_observation_point(_record(vlen=10), "random", rng)
           for _ in range(50)}
    assert all(0 <= p < 10 for p in pts) and len(pts) > 3


def test_dichotomy_bisects_largest_segment():
    # no annotations: whole [0, vlen) is one segment -> midpoint
    assert choose_observation_point(_record(vlen=16), "dichotomy", None) == 7
    # with a positive span [6..8] and neg at 13: largest zero-run is [0..5]
    r = _record(pos=[6, 8], neg=[13])
    assert choose_observation_point(r, "dichotomy", None) == 2


def _tiny_round_inputs(n=10, T=16):
    rng = np.random.default_rng(5)
    data_old, data_gt, props = [], [], []
    for i in range(n):
        vid = f"v{i}"
        dur = 20.0
        gt = [5.0, 12.0]
        data_gt.append([vid, dur, gt, "q"])
        data_old.append([vid, dur, [4.0, 13.0], "q"])
        props.append({
            "vid": vid, "v_len": T, "duration": dur,
            "prop_logits": [rng.normal(size=T), rng.normal(size=T)],
            "prop_logits1": [rng.normal(size=T), rng.normal(size=T)],
            "prop_logits2": [rng.normal(size=T), rng.normal(size=T)],
        })
    return data_old, data_gt, props


@pytest.mark.parametrize("strategy", ["uncertainty", "random", "dichotomy"])
def test_renew_dataset_all_selection_annotates_everyone(strategy):
    data_old, data_gt, props = _tiny_round_inputs()
    coff = get_coff(F_RENEW, "charades", 1)
    new, stats = renew_dataset(data_old, data_gt, props, coff,
                               selection="all", point_strategy=strategy)
    assert stats["n_selected"] == 10
    for r in new:
        assert len(r[4]["pos_idx"]) + len(r[4]["neg_idx"]) == 1


def test_renew_dataset_half_selection_default():
    data_old, data_gt, props = _tiny_round_inputs()
    coff = get_coff(F_RENEW, "charades", 1)
    new, stats = renew_dataset(data_old, data_gt, props, coff)
    assert stats["n_selected"] == 5
    annotated = sum(1 for r in new
                    if r[4]["pos_idx"] or r[4]["neg_idx"])
    assert annotated == 5


def test_random_strategy_draws_fresh_points_each_round(tmp_path):
    """File-level regression: under the shipped mc_droprate=0.0 the two MC
    passes are identical, uncertainty is 0 everywhere, and the ranking keeps
    dataset order — a constant per-round seed would then replay the SAME
    random frame for every record each round (duplicate points, no new
    oracle information).  update_labels must fold the round index into the
    'random' strategy's seed."""
    import os

    from hual_tpu.active.engine import update_labels
    from hual_tpu.utils.io import load_json, save_json, save_pickle

    n, T = 12, 16
    rng = np.random.default_rng(9)
    data_root, results_root = str(tmp_path / "data"), str(tmp_path / "results")
    recs, preds = [], []
    for i in range(n):
        vid, dur = f"v{i}", 20.0
        recs.append([vid, dur, [4.0, 13.0], "q"])
        logits = [rng.normal(size=T).astype(np.float32),
                  rng.normal(size=T).astype(np.float32)]
        mc = [rng.normal(size=T).astype(np.float32),
              rng.normal(size=T).astype(np.float32)]
        preds.append({"vid": vid, "duration": dur, "psuedo_idx": [1, 5],
                      "sentence": "q", "v_len": T, "prop_idx": [2, 6],
                      "prop_logits": logits,
                      # identical passes == mc_droprate 0.0: uncertainty 0
                      "prop_logits1": mc, "prop_logits2": mc,
                      "m_score": rng.uniform(size=(T, 4)).astype(np.float32)})
    for sub in ("charades_re0", "charades_gt"):
        os.makedirs(os.path.join(data_root, sub))
        save_json(recs, os.path.join(data_root, sub, "train.json"))
        save_json(recs[:2], os.path.join(data_root, sub, "test.json"))

    for rnd in (1, 2):
        save_pickle(preds, os.path.join(results_root, "charades",
                                        f"re{rnd - 1}.pkl"))
        update_labels("charades", rnd, data_root=data_root,
                      results_root=results_root, selection="all",
                      point_strategy="random")

    r2 = load_json(os.path.join(data_root, "charades_re2", "train.json"))
    points = [r[4]["pos_idx"] + r[4]["neg_idx"] for r in r2]
    assert all(len(p) == 2 for p in points)
    # fresh per-round draws: the two points differ for some records
    # (P[all 12 collide] = 16^-12 under fresh draws; 1.0 under the bug)
    assert any(len(set(p)) == 2 for p in points)


def test_renew_dataset_diagnostics():
    """Round diagnostics: selected indices match the annotated records;
    before/after mIoU and the improved/worsened split are self-consistent."""
    data_old, data_gt, props = _tiny_round_inputs()
    coff = get_coff(F_RENEW, "charades", 1)
    new, stats = renew_dataset(data_old, data_gt, props, coff)

    annotated_idx = {i for i, r in enumerate(new)
                     if r[4]["pos_idx"] or r[4]["neg_idx"]}
    assert set(stats["selected_idx"]) == annotated_idx
    assert len(stats["selected_idx"]) == stats["n_selected"] == 5
    assert stats["n_pos"] + stats["n_neg"] == stats["n_selected"]
    # every old span here is [4,13] vs gt [5,12]: identical before-IoU
    assert 0.0 < stats["miou_selected_before"] <= 1.0
    assert 0.0 <= stats["miou_selected_after"] <= 1.0
    assert stats["n_improved"] + stats["n_worsened"] <= stats["n_selected"]
