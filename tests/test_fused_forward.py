"""Parity of the fused Pallas forward vs the flax SeqPAN model.

The kernel (ops/pallas/fused_forward.py) re-expresses the entire
post-projection forward as one VMEM-resident program with block-diagonal
attention; these tests pin, at the REAL feature width (D=128, 8 heads,
2 dual-attention layers) on the interpreter backend, that its logits /
match scores / decoded indices match the flax model's deterministic pass.
"""

from __future__ import annotations

import numpy as np
import pytest

B, T, W, C, V = 8, 16, 6, 5, 32
DIM, HEADS, LAYERS = 128, 8, 2


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    from hual_tpu.models.seqpan import SeqPAN

    model = SeqPAN(dim=DIM, num_heads=HEADS, attn_layer=LAYERS, max_vlen=T,
                   word_dim=24, char_dim=8, num_chars=30)
    rng = np.random.default_rng(11)
    batch = {
        "video_features": jnp.asarray(
            rng.normal(size=(B, T, V)).astype(np.float32)),
        "video_seq_len": jnp.asarray(
            np.r_[np.full(B - 3, T), [9, 12, 5]].astype(np.int32)),
        "word_ids": jnp.asarray(np.where(
            np.arange(W)[None, :] < rng.integers(2, W + 1, (B, 1)),
            rng.integers(1, 15, (B, W)), 0).astype(np.int32)),
        "char_ids": jnp.asarray(rng.integers(0, 30, (B, W, C)).astype(np.int32)),
    }
    wv = jnp.asarray(rng.normal(size=(13, 24)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, batch, wv, 0.0,
                        deterministic=True)
    ref = model.apply(params, batch, wv, 0.0, deterministic=True)
    return model, params, batch, wv, ref


def test_fused_forward_matches_flax(setup):
    from hual_tpu.ops.pallas.fused_forward import seqpan_forward_fused

    model, params, batch, wv, ref = setup
    out = seqpan_forward_fused(model, params, batch, wv, block_b=4,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out["start_logits"]),
                               np.asarray(ref["start_logits"]),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["end_logits"]),
                               np.asarray(ref["end_logits"]),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["match_scores"]),
                               np.asarray(ref["match_scores"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["start_index"]),
                                  np.asarray(ref["start_index"]))
    np.testing.assert_array_equal(np.asarray(out["end_index"]),
                                  np.asarray(ref["end_index"]))


def test_fused_forward_ragged_batch(setup):
    """B not divisible by block_b: padding samples must not leak."""
    import jax.numpy as jnp

    from hual_tpu.ops.pallas.fused_forward import seqpan_forward_fused

    model, params, batch, wv, ref = setup
    sub = {k: v[:5] for k, v in batch.items()}
    out = seqpan_forward_fused(model, params, sub, wv, block_b=4,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out["start_logits"]),
                               np.asarray(ref["start_logits"])[:5],
                               rtol=1e-4, atol=2e-4)
    assert out["match_scores"].shape == (5, T, 4)


def test_fused_sweeps_match_flax_sweeps():
    """Scanned fused eval/infer sweeps against the flax sweeps on a
    device-resident dataset (interpret-mode kernel)."""
    import jax
    import jax.numpy as jnp

    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.runtime.steps import (make_eval_sweep_indexed,
                                        make_fused_eval_sweep_indexed,
                                        make_fused_infer_sweep_indexed,
                                        make_infer_sweep_indexed)

    model = SeqPAN(dim=DIM, num_heads=HEADS, attn_layer=1, max_vlen=T,
                   word_dim=24, char_dim=8, num_chars=30)
    rng = np.random.default_rng(21)
    n = 12
    s = rng.integers(0, T // 2, n).astype(np.int32)
    data = {
        "features": jnp.asarray(rng.normal(size=(n, T, V)).astype(np.float32)),
        "feat_rows": jnp.arange(n, dtype=jnp.int32),
        "v_len": jnp.asarray(np.r_[np.full(n - 2, T), [9, 5]].astype(np.int32)),
        "word_ids": jnp.asarray(rng.integers(1, 15, (n, W)).astype(np.int32)),
        "char_ids": jnp.asarray(rng.integers(0, 30, (n, W, C)).astype(np.int32)),
        "duration": jnp.asarray(rng.uniform(10, 30, n).astype(np.float32)),
        "s_ind": jnp.asarray(s),
        "e_ind": jnp.asarray(np.minimum(s + 3, T - 1).astype(np.int32)),
    }
    wv = jnp.asarray(rng.normal(size=(13, 24)).astype(np.float32))
    from hual_tpu.runtime.steps import gather_batch
    batch0 = gather_batch(data, jnp.arange(4, dtype=jnp.int32), False)
    params = model.init({"params": jax.random.key(0)}, batch0, wv, 0.0,
                        deterministic=True)
    sels = jnp.arange(12, dtype=jnp.int32).reshape(3, 4)

    ref_ious = np.asarray(jax.jit(make_eval_sweep_indexed(model))(
        params, data, sels, wv))
    fused_ious = np.asarray(jax.jit(make_fused_eval_sweep_indexed(
        model, block_b=4))(params, data, sels, wv))
    np.testing.assert_allclose(fused_ious, ref_ious, rtol=1e-5, atol=1e-6)

    key = jax.random.key(3)
    ref_out = jax.jit(make_infer_sweep_indexed(model, 0.5))(
        params, data, sels, wv, key)
    fused_out = jax.jit(make_fused_infer_sweep_indexed(model, 0.5,
                                                       block_b=4))(
        params, data, sels, wv, key)
    for k in ("match_scores", "start_logits", "end_logits"):
        np.testing.assert_allclose(np.asarray(fused_out[k]),
                                   np.asarray(ref_out[k]),
                                   rtol=1e-4, atol=2e-4, err_msg=k)
    np.testing.assert_array_equal(np.asarray(fused_out["start_index"]),
                                  np.asarray(ref_out["start_index"]))
    # stochastic passes still real
    assert not np.allclose(np.asarray(fused_out["start_logits1"]),
                           np.asarray(fused_out["start_logits2"]))


def test_fused_infer_gumbel_passes_run_live_at_mc0():
    """With the gumbel matching head enabled the reference samples noise in
    EVERY sess.run, so even at mc_droprate 0 the two 'stochastic' passes
    must differ — in the fused backend exactly as in the flax one (the
    clean-logit reuse fast path must not fire)."""
    import jax
    import jax.numpy as jnp

    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.runtime.steps import (gather_batch,
                                        make_fused_infer_sweep_indexed,
                                        make_infer_step_indexed)

    model = SeqPAN(dim=DIM, num_heads=HEADS, attn_layer=1, max_vlen=T,
                   word_dim=24, char_dim=8, num_chars=30, use_gumbel=True,
                   tau=0.3)
    rng = np.random.default_rng(5)
    n = 8
    s = rng.integers(0, T // 2, n).astype(np.int32)
    data = {
        "features": jnp.asarray(rng.normal(size=(n, T, V)).astype(np.float32)),
        "feat_rows": jnp.arange(n, dtype=jnp.int32),
        "v_len": jnp.asarray(np.r_[np.full(n - 1, T), [7]].astype(np.int32)),
        "word_ids": jnp.asarray(rng.integers(1, 15, (n, W)).astype(np.int32)),
        "char_ids": jnp.asarray(rng.integers(0, 30, (n, W, C)).astype(np.int32)),
        "duration": jnp.asarray(rng.uniform(10, 30, n).astype(np.float32)),
        "s_ind": jnp.asarray(s),
        "e_ind": jnp.asarray(np.minimum(s + 3, T - 1).astype(np.int32)),
    }
    wv = jnp.asarray(rng.normal(size=(13, 24)).astype(np.float32))
    batch0 = gather_batch(data, jnp.arange(4, dtype=jnp.int32), False)
    params = model.init({"params": jax.random.key(0)}, batch0, wv, 0.0,
                        deterministic=True)
    key = jax.random.key(9)
    sels = jnp.arange(8, dtype=jnp.int32).reshape(2, 4)

    # flax reference semantics at mc 0: live gumbel => passes differ
    flax_out = jax.jit(make_infer_step_indexed(model, 0.0))(
        params, data, sels[0], wv, key)
    assert not np.allclose(np.asarray(flax_out["start_logits1"]),
                           np.asarray(flax_out["start_logits2"]))

    fused_out = jax.jit(make_fused_infer_sweep_indexed(model, 0.0,
                                                       block_b=4))(
        params, data, sels, wv, key)
    assert not np.allclose(np.asarray(fused_out["start_logits1"]),
                           np.asarray(fused_out["start_logits2"])), \
        "fused backend reused clean logits despite the gumbel head"


def test_trainer_sweep_backend_config_wiring(tmp_path):
    """train.sweep_backend="fused" routes the trainer's eval/infer sweeps
    through the fused kernel and reproduces the flax backend's metrics."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_synthetic_data import make_dataset

    from hual_tpu.config import (Config, LossConfig, ModelConfig,
                                 PathsConfig, TrainConfig)
    from hual_tpu.data.datasets import gen_or_load_dataset
    from hual_tpu.data.features import FeatureStore
    from hual_tpu.runtime.trainer import Trainer

    root = str(tmp_path)
    make_dataset(root, task="charades", n_train=24, n_test=12, vdim=16,
                 max_raw_len=12, seed=3)

    def cfg(backend):
        return Config(
            task="charades", suffix="re0",
            paths=PathsConfig(
                ckpt_dir=os.path.join(root, "ckpt"),
                cache_dir=os.path.join(root, "data_pkl"),
                feature_path=os.path.join(root,
                                          "data/features/charades_i3d"),
                glove_path=os.path.join(root,
                                        "data/glove/glove.840B.300d.txt"),
                train_path=os.path.join(root, "data/charades_re0/train.json"),
                test_path=os.path.join(root, "data/charades_re0/test.json"),
            ),
            train=TrainConfig(epochs=1, batch_size=6, seed=12345,
                              sweep_backend=backend, fused_block=3),
            model=ModelConfig(name="SeqPAN", max_vlen=8, max_tlen=8,
                              vdim=16, dim=16, num_heads=2, word_dim=300,
                              char_dim=4, attn_layer=1),
            loss=LossConfig(),
        )

    metrics = {}
    for backend in ("flax", "fused"):
        c = cfg(backend)
        dataset = gen_or_load_dataset(c)
        features = FeatureStore.from_dir(c.paths.feature_path,
                                         c.model.max_vlen)
        tr = Trainer(c, dataset, features)
        tr.init_state()
        metrics[backend] = tr.test()
    for k in ("r1i3", "r1i5", "r1i7", "miou"):
        assert abs(metrics["flax"][k] - metrics["fused"][k]) < 1e-6, \
            (k, metrics)
