"""Integration checks against the REAL reference datasets (read-only mount at
/root/reference, skipped when absent): record formats, tokenizer behavior on
real sentences, and an AL label-update round driven by real GT records."""

import os

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "data")),
                                reason="reference mount not available")

from hual_tpu.data.datasets import Processor  # noqa: E402
from hual_tpu.utils.io import load_json, save_json, save_pickle  # noqa: E402


def test_real_record_counts_and_format():
    test_recs = load_json(os.path.join(REF, "data/charades_gt/test.json"))
    assert len(test_recs) == 3720
    re0 = load_json(os.path.join(REF, "data/charades_re0/train.json"))
    assert len(re0) == 12403
    vid, dur, (s, e), sent = re0[0][:4]
    assert isinstance(vid, str) and s <= e <= dur


def test_processor_on_real_records():
    recs = load_json(os.path.join(REF, "data/charades_gt/test.json"))[:200]
    proc = Processor()
    out = proc.process_data(recs, "test")
    assert len(out) == 200
    for r in out:
        assert r["words"], r
        assert all(w == w.lower() for w in r["words"])
    # a known sentence tokenizes Treebank-style
    one = [r for r in out if "person" in r["words"]]
    assert one, "expected 'person' queries in charades"


def test_anet_gt_counts():
    train = load_json(os.path.join(REF, "data/anet_gt/train.json"))
    test = load_json(os.path.join(REF, "data/anet_gt/test.json"))
    assert len(train) == 33721 and len(test) == 17031


def test_ablation_annotation_budget():
    """SURVEY.md §2.5: at re4 of the dichotomy ablation every sample carries
    exactly 4 annotation points."""
    path = os.path.join(REF, "data/ablation",
                        "charades_dichotomy_re4/train.json")
    if not os.path.exists(path):
        pytest.skip("ablation layout differs")
    recs = load_json(path)
    pts = {len(r[4]["pos_idx"]) + len(r[4]["neg_idx"]) for r in recs}
    assert pts == {4}


def test_update_labels_on_real_charades_subset(tmp_path):
    """One AL round over 64 real charades_re0 records with synthetic model
    predictions; oracle answers come from perturbed GT (GT train.json is
    stripped from the mount, so we use re0 itself as stand-in GT — the
    engine only needs consistent vids + spans)."""
    from hual_tpu.active.engine import update_labels

    re0 = load_json(os.path.join(REF, "data/charades_re0/train.json"))[:64]
    data_root = str(tmp_path / "data")
    results_root = str(tmp_path / "results")
    os.makedirs(os.path.join(data_root, "charades_re0"))
    os.makedirs(os.path.join(data_root, "charades_gt"))
    save_json(re0, os.path.join(data_root, "charades_re0/train.json"))
    save_json(re0[:10], os.path.join(data_root, "charades_re0/test.json"))
    # stand-in GT: re0 spans shifted by 10% of duration
    gt = [[v, d, [max(0.0, s - 0.1 * d), min(d, e - 0.05 * d)], t]
          for v, d, (s, e), t in (r[:4] for r in re0)]
    save_json(gt, os.path.join(data_root, "charades_gt/train.json"))
    save_json(re0[:10], os.path.join(data_root, "charades_gt/test.json"))

    rng = np.random.default_rng(0)
    T = 64
    preds = []
    for v, d, _, t in (r[:4] for r in re0):
        preds.append({
            "vid": v, "duration": d, "psuedo_idx": [1, 5], "sentence": t,
            "v_len": T, "prop_idx": [2, 6],
            "prop_logits": [rng.normal(size=T).astype(np.float32),
                            rng.normal(size=T).astype(np.float32)],
            "prop_logits1": [rng.normal(size=T).astype(np.float32),
                             rng.normal(size=T).astype(np.float32)],
            "prop_logits2": [rng.normal(size=T).astype(np.float32),
                             rng.normal(size=T).astype(np.float32)],
            "m_score": rng.uniform(size=(T, 4)).astype(np.float32),
        })
    save_pickle(preds, os.path.join(results_root, "charades", "re0.pkl"))

    stats = update_labels("charades", 1, data_root=data_root,
                          results_root=results_root)
    new = load_json(os.path.join(data_root, "charades_re1/train.json"))
    assert len(new) == 64
    assert stats["n_selected"] == 32
    annotated = [r for r in new if r[4]["pos_idx"] or r[4]["neg_idx"]]
    assert len(annotated) == 32
    for r in new:  # renewed spans stay inside the video
        assert 0.0 <= r[2][0] <= r[2][1] <= r[1] + 1e-6
