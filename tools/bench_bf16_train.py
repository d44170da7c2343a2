#!/usr/bin/env python
"""Real-chip measurement: scanned-epoch TRAIN throughput at
model.compute_dtype float32 (parity default) vs bfloat16.

Round 3 measured the bf16 activation path only for the AL sweep's
stochastic MC passes (train.mc_dtype); this closes the gap for the train
step itself.  Protocol = bench.py's: donated-state chained epochs, timing
ends at a device_get value fetch, FLOPs from XLA cost_analysis (scan body
counted once -> x n_batches), MFU guard.

Writes results/bf16_train_bench.json.

    python tools/bench_bf16_train.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "bf16_train_bench.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import bench

    import jax
    import jax.numpy as jnp

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/hual_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.ops.optim import make_optimizer
    from hual_tpu.runtime.steps import (gather_batch,
                                        make_train_epoch_indexed,
                                        make_train_step_indexed)

    _, _, tx, data, wv, _ = bench.build()
    B, N = args.batch, int(data["feat_rows"].shape[0])
    lr = jnp.float32(1e-4)
    rng = jax.random.key(0, impl="rbg")
    peak = bench.device_peak_flops(jax)
    perm = np.random.default_rng(7).permutation(N).astype(np.int32)
    epoch_sels = jax.device_put(perm.reshape(N // B, B))
    sel0 = jax.device_put(np.arange(B, dtype=np.int32))

    rows = []
    for dtype in ("float32", "bfloat16"):
        model = SeqPAN(compute_dtype=dtype)
        batch0 = jax.jit(lambda d, s: gather_batch(d, s, True))(data, sel0)
        params = model.init({"params": jax.random.key(0)}, batch0, wv, 0.0,
                            batch0["match_labels"], deterministic=True)
        opt = tx.init(params)
        step = jax.jit(make_train_step_indexed(model, tx, 1.0, 0.2),
                       donate_argnums=(0, 1))
        step_flops = bench.compiled_flops(jax, step, params, opt, data, sel0,
                                          wv, lr, rng)
        epoch_fn = jax.jit(make_train_epoch_indexed(model, tx, 1.0, 0.2),
                           donate_argnums=(0, 1))
        st = {"p": params, "o": opt}

        def epoch_once():
            st["p"], st["o"], losses, ious = epoch_fn(
                st["p"], st["o"], data, epoch_sels, wv, lr, rng,
                jnp.int32(0))
            return losses

        dt = bench.time_loop(jax, epoch_once, n_warmup=2, n_iters=args.iters)
        pps = N / dt
        mfu = (step_flops * (N // B) / dt) / peak \
            if np.isfinite(step_flops) else float("nan")
        bench.check_mfu(f"train_{dtype}", mfu)
        rows.append({
            "compute_dtype": dtype,
            "pairs_per_sec": round(pps, 1),
            "scanned_epoch_ms": round(dt * 1e3, 2),
            "step_ms": round(dt * 1e3 / (N // B), 3),
            "step_flops_g": round(step_flops / 1e9, 2)
            if np.isfinite(step_flops) else None,
            "mfu": round(mfu, 4) if np.isfinite(mfu) else None,
        })
        print(json.dumps(rows[-1]), flush=True)

    f32, bf16 = rows[0], rows[1]
    out = {
        "workload": "scanned-epoch train, charades parity shapes "
                    f"B={B} T=64 vdim=1024 dim=128, rbg PRNG",
        "device": str(jax.devices()[0]),
        "peak_flops_assumed": peak,
        "protocol": "donated-state chained epochs; timing ends at a "
                    "device_get value fetch (PROFILING.md §1)",
        "rows": rows,
        "bf16_speedup": round(bf16["pairs_per_sec"] / f32["pairs_per_sec"],
                              3),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"bf16_speedup": out["bf16_speedup"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
