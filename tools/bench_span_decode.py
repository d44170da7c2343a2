#!/usr/bin/env python
"""Measure XLA vs Pallas span decode on the real chip (VERDICT.md weak #6).

Times the two implementations of the answer decoder (reference ans_predictor,
models/layers.py:194-203) standalone at the AL-sweep shapes, and the full
MC-dropout inference step with each wired in (model.span_decode config).

Timing protocol matches bench.py: iterations are chained through a data
dependency and the clock stops after a device_get of the final output.

Writes results/span_decode_bench.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "span_decode_bench.json")


def time_chained(jax, fn, x0, n_warmup=3, n_iters=50):
    """fn(x) -> (x_next, out); timing ends at a value fetch of the last out."""
    x = x0
    out = None
    for _ in range(n_warmup):
        x, out = fn(x)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        x, out = fn(x)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / n_iters


def bench_kernel(jax, B, T, variant):
    import jax.numpy as jnp

    from hual_tpu.ops.decode import span_decode
    from hual_tpu.ops.pallas.span_decode import span_decode_pallas

    rng = np.random.default_rng(0)
    s = jax.device_put(rng.normal(size=(B, T)).astype(np.float32))
    e = jax.device_put(rng.normal(size=(B, T)).astype(np.float32))
    vlen = rng.integers(2, T + 1, B).astype(np.int32)
    mask = jax.device_put(
        (np.arange(T)[None, :] < vlen[:, None]).astype(np.int32))

    if variant == "pallas":
        fn = jax.jit(lambda a, b, m: span_decode_pallas(a, b, m))
    else:
        fn = jax.jit(lambda a, b, m: span_decode(a, b, m))

    def step(x):
        sidx, eidx = fn(x, e, mask)
        # chain: next input depends on this output (honest timing)
        return x + (sidx.sum() * 0).astype(x.dtype), (sidx, eidx)

    return time_chained(jax, step, s)


def bench_infer_step(jax, decode, B=256, T=100, V=1024):
    import jax.numpy as jnp

    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.runtime.steps import gather_batch, make_infer_step_indexed

    rng = np.random.default_rng(0)
    N = max(B, 512)
    s = rng.integers(0, T // 2, N).astype(np.int32)
    data = {
        "features": rng.normal(size=(N, T, V)).astype(np.float32),
        "feat_rows": np.arange(N, dtype=np.int32),
        "v_len": np.full(N, T, np.int32),
        "word_ids": rng.integers(1, 2000, size=(N, 14)).astype(np.int32),
        "char_ids": rng.integers(0, 60, size=(N, 14, 12)).astype(np.int32),
        "duration": rng.uniform(15, 40, size=N).astype(np.float32),
        "s_ind": s,
        "e_ind": np.minimum(s + rng.integers(1, T // 2, N), T - 1).astype(np.int32),
    }
    data = {k: jax.device_put(v) for k, v in data.items()}
    wv = jax.device_put(rng.normal(size=(2000, 300)).astype(np.float32))
    model = SeqPAN(dim=128, num_heads=8, attn_layer=2, max_vlen=T,
                   word_dim=300, char_dim=50, num_chars=60,
                   span_decode=decode)
    batch0 = jax.jit(lambda d, sl: gather_batch(d, sl, True))(
        data, np.arange(16, dtype=np.int32))
    params = model.init({"params": jax.random.key(0)}, batch0, wv, 0.0,
                        batch0["match_labels"], deterministic=True)
    step = jax.jit(make_infer_step_indexed(model, 0.5))
    sel = jax.device_put(np.arange(B, dtype=np.int32))
    key = jax.random.key(0)

    def fn(x):
        out = step(params, data, sel, wv, jax.random.fold_in(key, x))
        return (out["ious"].sum() * 0).astype(np.int32), out["ious"]

    import jax.numpy as _j
    return time_chained(jax, fn, _j.int32(0), n_warmup=3, n_iters=20)


def main() -> int:
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/hual_tpu_xla"))
    res = {"device": str(jax.devices()[0])}
    for B, T in ((256, 100), (256, 64), (16, 64)):
        res[f"kernel_xla_b{B}_t{T}_us"] = round(
            bench_kernel(jax, B, T, "xla") * 1e6, 1)
        res[f"kernel_pallas_b{B}_t{T}_us"] = round(
            bench_kernel(jax, B, T, "pallas") * 1e6, 1)
    res["infer_step_xla_b256_t100_ms"] = round(
        bench_infer_step(jax, "xla") * 1e3, 3)
    res["infer_step_pallas_b256_t100_ms"] = round(
        bench_infer_step(jax, "pallas") * 1e3, 3)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
