"""Serving bundle + Predictor: deployment inference must equal the trainer's
eval path on the same inputs, starting from raw (features, duration, query)
instead of dataset pickles."""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_synthetic_data import make_dataset  # noqa: E402

from hual_tpu.config import (Config, LossConfig, ModelConfig,  # noqa: E402
                             PathsConfig, TrainConfig)
from hual_tpu.data.datasets import gen_or_load_dataset  # noqa: E402
from hual_tpu.data.features import FeatureStore  # noqa: E402
from hual_tpu.runtime.trainer import Trainer  # noqa: E402
from hual_tpu.serve import Predictor, export_bundle  # noqa: E402
from hual_tpu.utils.io import load_json  # noqa: E402


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A tiny trained trainer + its exported bundle + a bundle Predictor."""
    root = str(tmp_path_factory.mktemp("serve"))
    # max_raw_len 40 > max_vlen 16: some videos exercise the mean-pool
    # downsampling path end-to-end through the predictor
    make_dataset(root, task="charades", n_train=24, n_test=10, vdim=16,
                 max_raw_len=40, seed=11)
    cfg = Config(
        task="charades", suffix="srv",
        paths=PathsConfig(
            ckpt_dir=os.path.join(root, "ckpt"),
            cache_dir=os.path.join(root, "data_pkl"),
            feature_path=os.path.join(root, "data/features/charades_i3d"),
            glove_path=os.path.join(root, "data/glove/glove.840B.300d.txt"),
            train_path=os.path.join(root, "data/charades_re0/train.json"),
            test_path=os.path.join(root, "data/charades_re0/test.json"),
        ),
        train=TrainConfig(epochs=1, batch_size=8, lr=1e-3, droprate=0.1,
                          clip_norm=1.0, seed=12345),
        model=ModelConfig(name="SeqPAN", max_vlen=16, max_tlen=10, vdim=16,
                          dim=16, num_heads=2, word_dim=300, char_dim=8,
                          attn_layer=1),
        loss=LossConfig(match_lambda=1.0, tau=0.3, no_gumbel=True),
    )
    dataset = gen_or_load_dataset(cfg)
    features = FeatureStore.from_dir(cfg.paths.feature_path, cfg.model.max_vlen)
    trainer = Trainer(cfg, dataset, features)
    trainer.init_state()
    trainer.train()
    bundle = export_bundle(trainer, os.path.join(root, "bundle"))
    predictor = Predictor.from_bundle(bundle, batch_size=4)
    test_json = load_json(cfg.paths.test_path)
    return {"root": root, "trainer": trainer, "bundle": bundle,
            "predictor": predictor, "test_json": test_json,
            "feat_dir": cfg.paths.feature_path}


def _raw_requests(served, n=None):
    reqs, recs = [], served["test_json"]
    for vid, duration, _gt, sentence in recs[: n or len(recs)]:
        feats = np.load(os.path.join(served["feat_dir"], f"{vid}.npy"))
        reqs.append((feats, duration, sentence))
    return reqs


def test_bundle_matches_trainer_eval_path(served):
    """from_bundle predictions on RAW inputs == the trainer's own jitted eval
    step on the packed test set: same indices for every sample (the encoding
    really mirrors the pipeline; the params really round-tripped)."""
    import jax

    from hual_tpu.runtime.steps import make_eval_step

    trainer, predictor = served["trainer"], served["predictor"]
    preds = predictor.predict_batch(_raw_requests(served))

    step = jax.jit(make_eval_step(trainer.model))
    packed = trainer.test_set
    sel = np.arange(len(packed))
    out = step(jax.device_get(trainer.state.params),
               packed.gather(sel, with_labels=False),
               np.asarray(trainer.dataset["word_vector"], np.float32))
    s_ref = np.asarray(out["start_index"])
    e_ref = np.asarray(out["end_index"])
    # packed order == test.json order for the synthetic corpus (all vids
    # have features); records align 1:1
    assert len(preds) == len(packed)
    for i, p in enumerate(preds):
        assert p["start_index"] == int(s_ref[i]), i
        assert p["end_index"] == int(e_ref[i]), i
        assert p["v_len"] == int(packed.v_len[i])
        # trainer time convention: s=i*dur/T, e=(i+1)*dur/T
        dur = float(packed.duration[i])
        np.testing.assert_allclose(
            p["start_time"], int(s_ref[i]) * dur / p["v_len"], rtol=1e-6)
        np.testing.assert_allclose(
            p["end_time"], (int(e_ref[i]) + 1) * dur / p["v_len"], rtol=1e-6)
        assert 0.0 < p["score"] <= 1.0
        assert p["start_index"] <= p["end_index"]


def test_query_encoding_matches_dataset_gen(served):
    """encode_query reproduces the packed word/char ids bit-for-bit, and OOV
    words take the UNK fallback exactly like dataset_gen."""
    trainer, predictor = served["trainer"], served["predictor"]
    packed = trainer.test_set
    for i, (_, _, _, sentence) in enumerate(served["test_json"]):
        wid, cid = predictor.encode_query(sentence)
        np.testing.assert_array_equal(wid, packed.word_ids[i], err_msg=sentence)
        np.testing.assert_array_equal(cid, packed.char_ids[i], err_msg=sentence)
    wid, _ = predictor.encode_query("zzzunseenword qqqq")
    unk = trainer.dataset["word_dict"]["<UNK>"]
    assert wid[0] == unk and wid[1] == unk


def test_predict_batch_equals_singles_and_chunks(served):
    """Chunked/padded batching must not change any prediction."""
    reqs = _raw_requests(served, n=5)  # 5 requests, batch_size 4: ragged chunk
    batched = served["predictor"].predict_batch(reqs)
    singles = [served["predictor"].predict(*r) for r in reqs]
    assert batched == singles
    assert served["predictor"].predict_batch([]) == []


def test_downsampling_in_predictor(served):
    """A video longer than max_vlen runs through visual_feature_sampling and
    predicts with v_len == max_vlen."""
    long_req = [r for r in _raw_requests(served)
                if r[0].shape[0] > served["predictor"].max_vlen]
    assert long_req, "fixture should contain a >max_vlen video"
    p = served["predictor"].predict(*long_req[0])
    assert p["v_len"] == served["predictor"].max_vlen


def test_bundle_rejects_corruption(served, tmp_path):
    """Wrong-shape / missing / unknown leaves fail loudly at load time."""
    import shutil

    bad = str(tmp_path / "bad_bundle")
    shutil.copytree(served["bundle"], bad)
    raw = dict(np.load(os.path.join(bad, "params.npz")))
    key = sorted(raw)[0]
    good = raw[key]
    raw[key] = np.zeros(tuple(np.array(good.shape) + 1), good.dtype)
    np.savez(os.path.join(bad, "params.npz"), **raw)
    with pytest.raises(ValueError, match="shape"):
        Predictor.from_bundle(bad, batch_size=2)

    del raw[key]
    raw[key + "_typo"] = good
    np.savez(os.path.join(bad, "params.npz"), **raw)
    with pytest.raises(ValueError):
        Predictor.from_bundle(bad, batch_size=2)


def test_meta_roundtrip(served):
    """The bundle carries the full config + packed bounds."""
    with open(os.path.join(served["bundle"], "meta.json")) as f:
        meta = json.load(f)
    assert meta["format_version"] == 1
    assert meta["config"]["model"]["max_vlen"] == 16
    assert meta["max_wlen"] == served["trainer"].train_set.max_wlen
    assert meta["max_clen"] == served["trainer"].train_set.max_clen
    p2 = Predictor.from_trainer(served["trainer"], batch_size=4)
    req = _raw_requests(served, n=1)[0]
    assert p2.predict(*req) == served["predictor"].predict(*req)
