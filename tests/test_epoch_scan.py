"""The scanned-epoch program must be step-for-step identical to the
sequential per-step path (same RNG stream, same order, same numerics)."""

import jax
import jax.numpy as jnp
import numpy as np

from hual_tpu.models.seqpan import SeqPAN
from hual_tpu.ops.optim import make_optimizer
from hual_tpu.runtime.steps import (gather_batch, make_train_epoch_indexed,
                                    make_train_step_indexed)


def _data(N=24, T=8, W=6, C=4, V=16, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, T // 2, N).astype(np.int32)
    vl = rng.integers(2, T + 1, N).astype(np.int32)
    s = np.minimum(s, vl - 1)
    return {
        "features": rng.normal(size=(N, T, V)).astype(np.float32),
        "feat_rows": np.arange(N, dtype=np.int32),
        "v_len": vl,
        "word_ids": rng.integers(1, 20, size=(N, W)).astype(np.int32),
        "char_ids": rng.integers(0, 10, size=(N, W, C)).astype(np.int32),
        "duration": rng.uniform(10, 30, size=N).astype(np.float32),
        "s_ind": s,
        "e_ind": np.minimum(s + rng.integers(0, 3, N), vl - 1).astype(np.int32),
    }


def test_epoch_scan_matches_per_step():
    data = _data()
    model = SeqPAN(dim=16, num_heads=2, attn_layer=1, max_vlen=8,
                   word_dim=32, char_dim=4, num_chars=10)
    tx = make_optimizer(1.0, 0.01)
    wv = np.random.default_rng(1).normal(size=(25, 32)).astype(np.float32)
    sel0 = np.arange(4, dtype=np.int32)
    batch0 = gather_batch({k: jnp.asarray(v) for k, v in data.items()},
                          jnp.asarray(sel0), with_labels=True)
    params = model.init({"params": jax.random.key(0)}, batch0, wv, 0.0,
                        batch0["match_labels"], deterministic=True)

    step = jax.jit(make_train_step_indexed(model, tx, 1.0, 0.1))
    epoch = jax.jit(make_train_epoch_indexed(model, tx, 1.0, 0.1))
    lr = jnp.float32(1e-3)
    base_rng = jax.random.key(7)
    sels = np.stack([np.arange(i * 4, (i + 1) * 4, dtype=np.int32)
                     for i in range(6)])

    # sequential
    p1, o1 = params, tx.init(params)
    seq_losses, seq_ious = [], []
    for i, sel in enumerate(sels):
        rng = jax.random.fold_in(base_rng, 10 + i)
        p1, o1, m = step(p1, o1, data, sel, wv, lr, rng)
        seq_losses.append(float(m["loss"]))
        seq_ious.append(np.asarray(m["ious"]))

    # scanned
    p2, o2, losses, ious = epoch(params, tx.init(params), data, sels, wv,
                                 lr, base_rng, jnp.int32(10))
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ious), np.stack(seq_ious),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)
