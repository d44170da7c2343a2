#!/usr/bin/env python
"""Real-chip ablation of TRAINING batch size (throughput mode).

The headline bench trains at B=16 because that is the reference schedule
(/root/reference/configs/charades/SeqPAN.yaml batch_size: 16) and quality
parity is pinned to it.  But PROFILING.md §3's diagnosis — the chip is
latency-bound at these op shapes, not FLOP- or bandwidth-bound — predicts
train throughput should keep rising with batch until the per-step dispatch
cost stops dominating.  This measures that curve: full scanned epochs of
the production train step (fwd + bwd + AdamW + on-device IoU, rbg PRNG)
at candidate batch sizes, under bench.py's protocol (donated-state chained
epochs, timing ends at a device_get value fetch).

The result is a THROUGHPUT knob, not a drop-in speedup: changing the batch
changes optimization dynamics vs the reference schedule (LR, steps/epoch),
so `train.batch_size` stays 16 by default and this curve documents what a
user who retunes gets.

Writes results/train_batch_bench.json.

    python tools/bench_train_batch.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "train_batch_bench.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[16, 32, 64, 128, 256])
    args = ap.parse_args()

    import bench
    import jax
    import jax.numpy as jnp

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/hual_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from hual_tpu.runtime.steps import (make_train_epoch_indexed,
                                        make_train_step_indexed)

    jax, model, tx, data, wv, params = bench.build()
    N = int(data["feat_rows"].shape[0])
    lr = jnp.float32(1e-4)
    rng = jax.random.key(0, impl="rbg")
    peak = bench.device_peak_flops(jax)
    perm = np.random.default_rng(7).permutation(N).astype(np.int32)

    rows = []
    for B in args.batches:
        S = N // B
        sels = jax.device_put(perm[: S * B].reshape(S, B))
        p = jax.tree.map(jnp.copy, params)
        o = tx.init(params)

        # per-step FLOPs at this batch (cost_analysis counts a scan body
        # once, so take the isolated step's flops and multiply by S)
        step = jax.jit(make_train_step_indexed(model, tx, 1.0, 0.2))
        step_flops = bench.compiled_flops(jax, step, p, o, data, sels[0],
                                          wv, lr, rng)

        epoch_fn = jax.jit(make_train_epoch_indexed(model, tx, 1.0, 0.2),
                           donate_argnums=(0, 1))
        st = {"p": p, "o": o}

        def once():
            st["p"], st["o"], losses, _ = epoch_fn(
                st["p"], st["o"], data, sels, wv, lr, rng, jnp.int32(0))
            return losses

        dt = bench.time_loop(jax, once, n_warmup=2, n_iters=args.iters)
        pps = S * B / dt
        mfu = (step_flops * S / dt) / peak if np.isfinite(step_flops) \
            else float("nan")
        if np.isfinite(mfu):
            bench.check_mfu(f"train_B{B}", mfu)
        row = {"batch_size": B, "steps_per_epoch": S,
               "pairs_per_sec": round(pps, 1),
               "epoch_ms": round(dt * 1e3, 2),
               "step_ms": round(dt * 1e3 / S, 3),
               "step_flops_g": round(step_flops / 1e9, 2),
               "mfu": round(mfu, 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: r["pairs_per_sec"])
    b16 = next((r for r in rows if r["batch_size"] == 16), None)
    out = {
        "workload": ("scanned-epoch train (fwd+bwd+AdamW+IoU), charades "
                     f"parity shapes T=64 vdim=1024 dim=128, N={N}, rbg "
                     "PRNG, drop 0.2"),
        "device": getattr(jax.devices()[0], "device_kind", "unknown"),
        "protocol": ("donated-state chained epochs; timing ends at a "
                     "device_get value fetch (PROFILING.md §1); one "
                     "compile per batch shape"),
        "caveat": ("throughput knob only — batch != 16 departs from the "
                   "reference optimization schedule (quality parity is "
                   "pinned at B=16)"),
        "rows": rows,
        "best": best,
    }
    if b16 is not None:
        out["speedup_vs_b16"] = round(
            best["pairs_per_sec"] / b16["pairs_per_sec"], 2)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    vs = (f" ({out['speedup_vs_b16']}x vs B=16)"
          if "speedup_vs_b16" in out else "")
    print(f"wrote {OUT}: best B={best['batch_size']} "
          f"{best['pairs_per_sec']} pairs/s{vs}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
