#!/usr/bin/env python
"""Decompose the B=16 train-step latency and test scheduling levers.

VERDICT.md round 1 set the target "close the gap toward the B=16 roofline
(~60 us/step compute)".  This tool measures, fetch-synchronized, on the real
chip:

  * stage costs: forward-only, forward+losses, +grad, full step (+AdamW +
    decode + IoU), on-device label synthesis alone;
  * the scanned-epoch step at lax.scan unroll 1/2/4/8;
  * the RNG lever: threefry (default) vs rbg partitionable PRNG.

Writes results/step_breakdown.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "step_breakdown.json")

N, B, T, W, C, V, DIM = 2000, 16, 64, 14, 12, 1024, 128


def build(jax):
    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.ops.optim import make_optimizer
    from hual_tpu.runtime.steps import gather_batch

    rng = np.random.default_rng(0)
    s = rng.integers(0, T // 2, N).astype(np.int32)
    data = {
        "features": rng.normal(size=(N, T, V)).astype(np.float32),
        "feat_rows": np.arange(N, dtype=np.int32),
        "v_len": np.full(N, T, np.int32),
        "word_ids": rng.integers(1, 8000, size=(N, W)).astype(np.int32),
        "char_ids": rng.integers(0, 100, size=(N, W, C)).astype(np.int32),
        "duration": rng.uniform(15, 40, size=N).astype(np.float32),
        "s_ind": s,
        "e_ind": np.minimum(s + rng.integers(1, T // 2, N), T - 1).astype(np.int32),
    }
    data = {k: jax.device_put(v) for k, v in data.items()}
    wv = jax.device_put(rng.normal(size=(8000, 300)).astype(np.float32))
    model = SeqPAN(dim=DIM, num_heads=8, attn_layer=2, max_vlen=T,
                   word_dim=300, char_dim=50, num_chars=100)
    batch0 = jax.jit(lambda d, sl: gather_batch(d, sl, True))(
        data, np.arange(B, dtype=np.int32))
    params = model.init({"params": jax.random.key(0)}, batch0, wv, 0.0,
                        batch0["match_labels"], deterministic=True)
    tx = make_optimizer(1.0, 0.01)
    return model, tx, data, wv, params, batch0


def time_chained(jax, fn, n_warmup=3, n_iters=50):
    import jax.numpy as jnp
    x = jnp.int32(0)
    out = None
    for _ in range(n_warmup):
        x, out = fn(x)
    np.asarray(jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        x, out = fn(x)
    np.asarray(jax.device_get(out))
    return (time.perf_counter() - t0) / n_iters


def scan_step_time(jax, model, tx, data, wv, params, unroll, n_scan=125):
    """Seconds per step inside a scanned pseudo-epoch at a given unroll."""
    import jax.numpy as jnp
    import optax

    from hual_tpu.runtime.steps import make_train_step_indexed

    step = make_train_step_indexed(model, tx, 1.0, 0.2)
    sels = jax.device_put(np.random.default_rng(7).permutation(N)[
        : n_scan * B].astype(np.int32).reshape(n_scan, B))
    base_rng = jax.random.key(0)
    lr = jnp.float32(1e-4)

    def epoch(p, o, d, w, x):
        # d/w are ARGUMENTS, not closures — closing over device arrays
        # embeds them as HLO constants (a 524 MB payload the tunnel's
        # remote-compile endpoint rejects)
        def body(carry, inp):
            p, o = carry
            sel, i = inp
            p, o, m = step(p, o, d, sel, w, lr,
                           jax.random.fold_in(base_rng, i + x))
            return (p, o), m["loss"]

        idx = jnp.arange(n_scan, dtype=jnp.int32)
        (p, o), losses = jax.lax.scan(body, (p, o), (sels, idx),
                                      unroll=unroll)
        return p, o, losses

    epoch_j = jax.jit(epoch, donate_argnums=(0, 1))
    st = {"p": jax.tree.map(jnp.copy, params), "o": tx.init(params)}

    def fn(x):
        st["p"], st["o"], losses = epoch_j(st["p"], st["o"], data, wv, x)
        return (jnp.sum(losses) * 0).astype(jnp.int32), losses

    dt = time_chained(jax, fn, n_warmup=2, n_iters=8)
    return dt / n_scan


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/hual_tpu_xla"))
    from hual_tpu.data.labels_jax import make_span_labels_jax
    from hual_tpu.models.seqpan import seqpan_loss
    from hual_tpu.runtime.steps import gather_batch

    model, tx, data, wv, params, batch0 = build(jax)
    rng_key = jax.random.key(1)
    res = {"device": str(jax.devices()[0]), "B": B, "T": T}

    sel0 = jax.device_put(np.arange(B, dtype=np.int32))

    # stage: on-device gather + label synthesis only
    gb = jax.jit(lambda d, sl: gather_batch(d, sl, True))

    def fn_gather(x):
        b = gb(data, sel0 + x * 0)
        return (jnp.sum(b["y1"]) * 0).astype(jnp.int32), b["y1"]

    res["gather_labels_ms"] = round(time_chained(jax, fn_gather) * 1e3, 3)

    # stage: forward only (deterministic)
    fwd = jax.jit(lambda p, b: model.apply(p, b, wv, 0.0,
                                           deterministic=True)["start_logits"])

    def fn_fwd(x):
        out = fwd(params, {**batch0, "duration": batch0["duration"] + x * 0.0})
        return (jnp.sum(out) * 0).astype(jnp.int32), out

    res["forward_ms"] = round(time_chained(jax, fn_fwd) * 1e3, 3)

    # stage: forward + losses + grad (no optimizer)
    def loss_fn(p, b, r):
        out = model.apply(p, b, wv, 0.2, b["match_labels"],
                          deterministic=False, rngs={"dropout": r})
        total, _ = seqpan_loss(out, b, 1.0)
        return total

    grad = jax.jit(jax.grad(loss_fn))

    def fn_grad(x):
        g = grad(params, batch0, jax.random.fold_in(rng_key, x))
        leaf = jax.tree_util.tree_leaves(g)[0]
        return (jnp.sum(leaf) * 0).astype(jnp.int32), leaf

    res["fwd_bwd_ms"] = round(time_chained(jax, fn_grad) * 1e3, 3)

    def _save():
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(res, f, indent=2)

    _save()
    # full scanned step at several unrolls (the tunnel's remote-compile
    # endpoint rejects oversized HLO payloads — record the failure instead
    # of crashing)
    for unroll in (1, 2, 4):
        try:
            dt = scan_step_time(jax, model, tx, data, wv, params, unroll)
            res[f"scan_step_unroll{unroll}_ms"] = round(dt * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            res[f"scan_step_unroll{unroll}_ms"] = f"failed: {type(e).__name__}"
        _save()

    # RNG lever: rbg PRNG (partitionable, much cheaper than threefry on TPU)
    try:
        jax.config.update("jax_default_prng_impl", "rbg")
        model2, tx2, data2, wv2, params2, _ = build(jax)
        dt = scan_step_time(jax, model2, tx2, data2, wv2, params2, unroll=1)
        res["scan_step_rbg_ms"] = round(dt * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        res["scan_step_rbg_ms"] = f"failed: {type(e).__name__}"
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")

    _save()
    print(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
