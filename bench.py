#!/usr/bin/env python
"""Throughput benchmark on the real TPU chip.

Measures the PRODUCTION data path — device-resident dataset, scanned-epoch
training — at the Charades parity shapes (B=16, T=64, vdim=1024, dim=128,
heads=8, 2 attn layers; reference configs/charades/SeqPAN.yaml):

* headline: sustained train pairs/s over a full scanned epoch (125 batches
  of 16 = a 2000-sample split in ONE dispatch);
* extras: the isolated per-step latency and the B=256 MC-dropout inference
  step (clean + 2 stochastic forwards) used by the AL train-set sweep.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); TF1 with this
model and per-batch feed-dicts typically sustains ~400 query-video pairs/s
on a datacenter GPU (25 steps/s x batch 16), which we use as the baseline
estimate for vs_baseline.  The driver's stated target is >=5x that.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_PAIRS_PER_SEC_ESTIMATE = 400.0


def build(n_samples=2000, T=64, W=14, C=12, V=1024, dim=128, heads=8,
          layers=2, vocab=8000, chars=100):
    import jax

    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.ops.optim import make_optimizer
    from hual_tpu.runtime.steps import gather_batch

    rng = np.random.default_rng(0)
    N = n_samples
    s = rng.integers(0, T // 2, N).astype(np.int32)
    data_np = {
        "features": rng.normal(size=(N, T, V)).astype(np.float32),
        "feat_rows": np.arange(N, dtype=np.int32),
        "v_len": np.full(N, T, np.int32),
        "word_ids": rng.integers(1, vocab, size=(N, W)).astype(np.int32),
        "char_ids": rng.integers(0, chars, size=(N, W, C)).astype(np.int32),
        "duration": rng.uniform(15, 40, size=N).astype(np.float32),
        "s_ind": s,
        "e_ind": np.minimum(s + rng.integers(1, T // 2, N), T - 1).astype(np.int32),
    }
    data = {k: jax.device_put(v) for k, v in data_np.items()}
    wv = jax.device_put(rng.normal(size=(vocab, 300)).astype(np.float32))

    model = SeqPAN(dim=dim, num_heads=heads, attn_layer=layers, max_vlen=T,
                   word_dim=300, char_dim=50, num_chars=chars)
    sel0 = np.arange(16, dtype=np.int32)
    batch0 = jax.jit(lambda d, s: gather_batch(d, s, True))(data, sel0)
    params = model.init({"params": jax.random.key(0)}, batch0, wv, 0.0,
                        batch0["match_labels"], deterministic=True)
    tx = make_optimizer(1.0, 0.01)
    return jax, model, tx, data, wv, params


def time_loop(jax, fn, n_warmup, n_iters):
    out = None
    for _ in range(n_warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iters


def main():
    import jax.numpy as jnp

    from hual_tpu.runtime.steps import (make_infer_step_indexed,
                                        make_train_epoch_indexed,
                                        make_train_step_indexed)

    jax, model, tx, data, wv, params = build()
    B, N = 16, 2000
    lr = jnp.float32(1e-4)
    rng = jax.random.key(0)

    # isolated per-step latency
    step = jax.jit(make_train_step_indexed(model, tx, 1.0, 0.2),
                   donate_argnums=(0, 1))
    import jax.numpy as _jnp

    sels = [jax.device_put(np.random.default_rng(i).integers(
        0, N, B).astype(np.int32)) for i in range(64)]
    # independent state copies up front: both paths donate their state
    p_step = jax.tree.map(_jnp.copy, params)
    p_epoch = jax.tree.map(_jnp.copy, params)
    o_step = tx.init(params)
    o_epoch = tx.init(params)
    st = {"p": p_step, "o": o_step, "i": 0}

    def step_once():
        st["i"] += 1
        st["p"], st["o"], m = step(st["p"], st["o"], data,
                                   sels[st["i"] % 64], wv, lr, rng)
        return m["loss"]

    step_dt = time_loop(jax, step_once, n_warmup=3, n_iters=50)

    # headline: full scanned epoch (N/B batches in one dispatch)
    epoch_fn = jax.jit(make_train_epoch_indexed(model, tx, 1.0, 0.2),
                       donate_argnums=(0, 1))
    perm = np.random.default_rng(7).permutation(N).astype(np.int32)
    epoch_sels = jax.device_put(perm.reshape(N // B, B))
    st2 = {"p": p_epoch, "o": o_epoch}

    def epoch_once():
        st2["p"], st2["o"], losses, ious = epoch_fn(
            st2["p"], st2["o"], data, epoch_sels, wv, lr, rng, jnp.int32(0))
        return losses

    epoch_dt = time_loop(jax, epoch_once, n_warmup=2, n_iters=10)
    train_pps = N / epoch_dt

    # AL sweep inference step at B=256
    infer_step = jax.jit(make_infer_step_indexed(model, 0.5))
    sel_big = jax.device_put(np.arange(256, dtype=np.int32))

    def infer_once():
        return infer_step(st2["p"], data, sel_big, wv, rng)["ious"]

    infer_dt = time_loop(jax, infer_once, n_warmup=3, n_iters=20)

    result = {
        "metric": "seqpan_charades_sustained_train_pairs_per_sec_per_chip",
        "value": round(train_pps, 1),
        "unit": "pairs/s",
        "vs_baseline": round(train_pps / REFERENCE_PAIRS_PER_SEC_ESTIMATE, 2),
        "extra": {
            "scanned_epoch_ms": round(epoch_dt * 1e3, 2),
            "isolated_step_ms": round(step_dt * 1e3, 3),
            "infer_b256_step_ms": round(infer_dt * 1e3, 3),
            "infer_b256_pairs_per_sec": round(256 / infer_dt, 1),
            "batch_size": B,
            "path": "device-resident scanned-epoch (production loop)",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
