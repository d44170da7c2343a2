"""True MC-dropout path (mc_droprate > 0): the paper-intended behavior.

The shipped reference never fed its drop_rate placeholder at eval, so its
"two stochastic passes" were deterministic and model uncertainty was
identically zero (docs/PARITY.md).  With `train.mc_droprate: 0.5` hual_tpu
runs real stochastic passes; this test pins, at loop level, that

  * per-frame model uncertainty is non-zero,
  * per-video uncertainty varies across samples,
  * the annotated-half selection ORDER differs from dataset order (the
    mc=0.0 degenerate behavior), and
  * the written round-1 train.json still satisfies the budget invariants.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_synthetic_data import make_dataset  # noqa: E402

from hual_tpu.active.coefficients import F_RENEW, get_coff  # noqa: E402
from hual_tpu.active.engine import rank_uncertainty, update_labels  # noqa: E402
from hual_tpu.config import (Config, LossConfig, ModelConfig,  # noqa: E402
                             PathsConfig, TrainConfig)
from hual_tpu.data.datasets import gen_or_load_dataset  # noqa: E402
from hual_tpu.data.features import FeatureStore  # noqa: E402
from hual_tpu.runtime.trainer import Trainer  # noqa: E402
from hual_tpu.utils.io import load_json, load_pickle  # noqa: E402


@pytest.fixture(scope="module")
def mc_round(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("truemc"))
    make_dataset(root, task="charades", n_train=48, n_test=16,
                 vdim=16, max_raw_len=16, seed=11)
    cfg = Config(
        task="charades", suffix="re0",
        paths=PathsConfig(
            ckpt_dir=os.path.join(root, "ckpt"),
            cache_dir=os.path.join(root, "data_pkl"),
            feature_path=os.path.join(root, "data/features/charades_i3d"),
            glove_path=os.path.join(root, "data/glove/glove.840B.300d.txt"),
            train_path=os.path.join(root, "data/charades_re0/train.json"),
            test_path=os.path.join(root, "data/charades_re0/test.json"),
        ),
        train=TrainConfig(epochs=1, batch_size=16, lr=2e-3, droprate=0.1,
                          clip_norm=1.0, seed=12345, mc_droprate=0.5),
        model=ModelConfig(name="SeqPAN", max_vlen=16, max_tlen=10, vdim=16,
                          dim=16, num_heads=2, word_dim=300, char_dim=8,
                          attn_layer=1),
        loss=LossConfig(),
    )
    dataset = gen_or_load_dataset(cfg)
    features = FeatureStore.from_dir(cfg.paths.feature_path, cfg.model.max_vlen)
    trainer = Trainer(cfg, dataset, features)
    trainer.init_state()
    trainer.train()
    trainer.infer_trainset(
        save_path=os.path.join(root, "results", "charades", "re0.pkl"))
    return root


def test_true_mc_uncertainty_nonzero_and_selection_differs(mc_round):
    root = mc_round
    data_old = load_json(os.path.join(root, "data/charades_re0/train.json"))
    data_gt = load_json(os.path.join(root, "data/charades_gt/train.json"))
    prop = load_pickle(os.path.join(root, "results/charades/re0.pkl"))

    # real stochastic passes: the two MC logit sets differ per sample
    r = prop[0]
    assert not np.allclose(r["prop_logits1"][0], r["prop_logits2"][0])

    for rec in data_old:
        if len(rec) == 4:
            rec.append({"pos_idx": [], "neg_idx": []})
    ranking = rank_uncertainty(data_old, data_gt, prop,
                               get_coff(F_RENEW, "charades", 1))
    uv = np.asarray([r["uncert_video"] for r in ranking])
    assert np.all(uv > 0.0)
    assert len(np.unique(np.round(uv, 6))) > len(uv) // 2
    # ascending order by real uncertainty != dataset order (mc=0.0 behavior)
    assert [r["idx"] for r in ranking] != list(range(len(data_old)))
    # per-frame acquisition scores are informative (non-constant)
    uf = ranking[0]["uncert_frame"]
    assert np.ptp(uf[: ranking[0]["vlen"]]) > 0


def test_true_mc_round_respects_budget(mc_round):
    root = mc_round
    stats = update_labels("charades", 1,
                          data_root=os.path.join(root, "data"),
                          results_root=os.path.join(root, "results"))
    new_train = load_json(os.path.join(root, "data/charades_re1/train.json"))
    assert stats["n_selected"] == 24
    n_annotated = sum(1 for r in new_train
                      if len(r[4]["pos_idx"]) + len(r[4]["neg_idx"]) > 0)
    assert n_annotated == 24
    # annotated set is NOT simply the first half of the dataset
    first_half_all = all(
        len(r[4]["pos_idx"]) + len(r[4]["neg_idx"]) > 0
        for r in new_train[:24])
    second_half_none = all(
        len(r[4]["pos_idx"]) + len(r[4]["neg_idx"]) == 0
        for r in new_train[24:])
    assert not (first_half_all and second_half_none), \
        "true-MC selection degenerated to dataset order"


def test_folded_mc_step_semantics():
    """The folded 3B-row MC infer step (steps.make_infer_step fold_mc):
    clean outputs match the deterministic pass; the two stochastic passes
    are real (differ from clean and from each other); the sequential
    (fold_mc=False) path remains available and agrees on the clean part."""
    import jax
    import jax.numpy as jnp

    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.runtime.steps import make_infer_step

    B, T, W, C, V = 8, 16, 6, 5, 16
    model = SeqPAN(dim=16, num_heads=2, attn_layer=1, max_vlen=T,
                   word_dim=20, char_dim=8, num_chars=30)
    rng_np = np.random.default_rng(5)
    batch = {
        "video_features": jnp.asarray(
            rng_np.normal(size=(B, T, V)).astype(np.float32)),
        "video_seq_len": jnp.asarray(
            np.r_[np.full(B - 2, T), [9, 12]].astype(np.int32)),
        "word_ids": jnp.asarray(rng_np.integers(1, 15, (B, W)).astype(np.int32)),
        "char_ids": jnp.asarray(rng_np.integers(0, 30, (B, W, C)).astype(np.int32)),
        "s_ind": jnp.asarray(rng_np.integers(0, T // 2, B).astype(np.int32)),
        "e_ind": jnp.asarray(rng_np.integers(T // 2, T, B).astype(np.int32)),
        "duration": jnp.asarray(rng_np.uniform(10, 30, B).astype(np.float32)),
    }
    wv = jnp.asarray(rng_np.normal(size=(13, 20)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, batch, wv, 0.0,
                        deterministic=True)
    rng = jax.random.key(99)

    folded = jax.jit(make_infer_step(model, 0.5, fold_mc=True))(
        params, batch, wv, rng)
    seq = jax.jit(make_infer_step(model, 0.5, fold_mc=False))(
        params, batch, wv, rng)

    # clean part: identical semantics either way (rate-0 rows are
    # deterministic); tolerance because XLA tiles 3B vs B differently
    for k in ("start_logits", "end_logits", "match_scores", "ious"):
        np.testing.assert_allclose(np.asarray(folded[k]), np.asarray(seq[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    np.testing.assert_array_equal(np.asarray(folded["start_index"]),
                                  np.asarray(seq["start_index"]))

    # stochastic passes are real and independent
    for out in (folded, seq):
        assert not np.allclose(np.asarray(out["start_logits1"]),
                               np.asarray(out["start_logits"]))
        assert not np.allclose(np.asarray(out["start_logits1"]),
                               np.asarray(out["start_logits2"]))


def test_mc_dtype_bf16_stochastic_passes():
    """train.mc_dtype=bfloat16: the infer step applies a bf16-compute clone
    for the STOCHASTIC passes only — clean outputs are bit-identical to the
    all-f32 step, stochastic logits are finite f32 and genuinely stochastic;
    a bf16 clean forward stays within bf16 accumulation error of f32."""
    import jax
    import jax.numpy as jnp

    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.runtime.steps import make_infer_step

    B, T, W, C, V = 8, 16, 6, 5, 16
    model = SeqPAN(dim=16, num_heads=2, attn_layer=1, max_vlen=T,
                   word_dim=20, char_dim=8, num_chars=30)
    rng_np = np.random.default_rng(6)
    batch = {
        "video_features": jnp.asarray(
            rng_np.normal(size=(B, T, V)).astype(np.float32)),
        "video_seq_len": jnp.asarray(
            np.r_[np.full(B - 2, T), [9, 12]].astype(np.int32)),
        "word_ids": jnp.asarray(rng_np.integers(1, 15, (B, W)).astype(np.int32)),
        "char_ids": jnp.asarray(rng_np.integers(0, 30, (B, W, C)).astype(np.int32)),
        "s_ind": jnp.asarray(rng_np.integers(0, T // 2, B).astype(np.int32)),
        "e_ind": jnp.asarray(rng_np.integers(T // 2, T, B).astype(np.int32)),
        "duration": jnp.asarray(rng_np.uniform(10, 30, B).astype(np.float32)),
    }
    wv = jnp.asarray(rng_np.normal(size=(13, 20)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, batch, wv, 0.0,
                        deterministic=True)
    rng = jax.random.key(7)

    mc_model = model.clone(compute_dtype="bfloat16")
    mixed = jax.jit(make_infer_step(model, 0.5, mc_model=mc_model))(
        params, batch, wv, rng)
    f32 = jax.jit(make_infer_step(model, 0.5))(params, batch, wv, rng)

    # clean pass identical (same model, same program shape)
    for k in ("start_logits", "end_logits", "match_scores"):
        np.testing.assert_array_equal(np.asarray(mixed[k]), np.asarray(f32[k]))
    np.testing.assert_array_equal(np.asarray(mixed["start_index"]),
                                  np.asarray(f32["start_index"]))
    # stochastic passes: f32 outputs, finite, stochastic
    for k in ("start_logits1", "start_logits2"):
        v = np.asarray(mixed[k])
        assert v.dtype == np.float32 and np.isfinite(v).all()
    assert not np.allclose(np.asarray(mixed["start_logits1"]),
                           np.asarray(mixed["start_logits2"]))

    # bf16 CLEAN forward (compute_dtype only) stays near f32
    o16 = mc_model.apply(params, batch, wv, 0.0, deterministic=True)
    o32 = model.apply(params, batch, wv, 0.0, deterministic=True)
    for k in ("start_logits", "end_logits"):
        a = np.asarray(o32[k])
        np.testing.assert_allclose(np.asarray(o16[k]), a, atol=0.05
                                   + 0.03 * float(np.abs(a).max()))
