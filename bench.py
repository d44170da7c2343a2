#!/usr/bin/env python
"""Throughput benchmark on the real TPU chip.

Measures the parity workload — SeqPAN train steps at the Charades config
shapes (B=16, T=64, vdim=1024, dim=128, heads=8, 2 attn layers; reference
configs/charades/SeqPAN.yaml) — plus the MC-dropout inference step (the
active-learning bottleneck: 3 forward passes per batch).

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


def build(batch_size=16, T=64, W=14, C=12, V=1024, dim=128, heads=8, layers=2,
          vocab=8000, chars=100):
    import jax

    from hual_tpu.data.labels import make_span_labels
    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.ops.optim import make_optimizer
    from hual_tpu.runtime.steps import make_infer_step, make_train_step

    rng = np.random.default_rng(0)
    B = batch_size
    batch = {
        "video_features": rng.normal(size=(B, T, V)).astype(np.float32),
        "video_seq_len": np.full(B, T, np.int32),
        "word_ids": rng.integers(1, vocab, size=(B, W)).astype(np.int32),
        "char_ids": rng.integers(0, chars, size=(B, W, C)).astype(np.int32),
        "duration": rng.uniform(15, 40, size=B).astype(np.float32),
    }
    s = rng.integers(0, T // 2, B).astype(np.int32)
    e = (s + rng.integers(1, T // 2, B)).astype(np.int32)
    batch["s_ind"], batch["e_ind"] = s, np.minimum(e, T - 1)
    y1, y2, match, inner = make_span_labels(batch["s_ind"], batch["e_ind"],
                                            batch["video_seq_len"], T)
    batch.update(y1=y1, y2=y2, match_labels=match,
                 inner_labels=inner.astype(np.float32))

    model = SeqPAN(dim=dim, num_heads=heads, attn_layer=layers, max_vlen=T,
                   word_dim=300, char_dim=50, num_chars=chars)
    wv = rng.normal(size=(vocab, 300)).astype(np.float32)
    params = model.init({"params": jax.random.key(0)}, batch, wv, 0.0,
                        batch["match_labels"], deterministic=True)
    tx = make_optimizer(1.0, 0.01)
    opt_state = tx.init(params)
    train_step = jax.jit(make_train_step(model, tx, 1.0, 0.2),
                         donate_argnums=(0, 1))
    infer_step = jax.jit(make_infer_step(model, 0.5))
    return (jax, model, params, opt_state, batch, wv, train_step, infer_step)


def time_loop(fn, n_warmup, n_iters):
    for _ in range(n_warmup):
        out = fn()
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iters


def main():
    import jax
    import jax.numpy as jnp

    B = 16
    (jax_mod, model, params, opt_state, batch, wv, train_step,
     infer_step) = build(batch_size=B)
    batch = jax.device_put(batch)
    wv = jax.device_put(wv)
    lr = jnp.float32(1e-4)
    rng = jax.random.key(0)

    state = {"params": params, "opt": opt_state}

    def train_once():
        state["params"], state["opt"], m = train_step(
            state["params"], state["opt"], batch, wv, lr, rng)
        return m["loss"]

    train_dt = time_loop(train_once, n_warmup=3, n_iters=50)
    train_pps = B / train_dt

    def infer_once():
        return infer_step(state["params"], batch, wv, rng)["ious"]

    infer_dt = time_loop(infer_once, n_warmup=3, n_iters=50)
    infer_pps = B / infer_dt

    # large-batch inference (the AL train-set sweep runs at B=256 by default)
    B_big = 256
    (_, _, params_b, _, batch_b, wv_b, _, infer_step_b) = build(batch_size=B_big)
    batch_b = jax.device_put(batch_b)
    wv_b = jax.device_put(wv_b)

    def infer_big():
        return infer_step_b(params_b, batch_b, wv_b, rng)["ious"]

    infer_big_dt = time_loop(infer_big, n_warmup=3, n_iters=20)
    infer_big_pps = B_big / infer_big_dt

    # headline metric: train-step pairs/sec/chip on the parity config
    result = {
        "metric": "seqpan_charades_train_pairs_per_sec_per_chip",
        "value": round(train_pps, 1),
        "unit": "pairs/s",
        "vs_baseline": round(train_pps / REFERENCE_PAIRS_PER_SEC_ESTIMATE, 2),
        "extra": {
            "train_step_ms": round(train_dt * 1e3, 3),
            "infer_step_ms": round(infer_dt * 1e3, 3),
            "infer_pairs_per_sec": round(infer_pps, 1),
            "infer_b256_step_ms": round(infer_big_dt * 1e3, 3),
            "infer_b256_pairs_per_sec": round(infer_big_pps, 1),
            "batch_size": B,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
