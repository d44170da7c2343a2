#!/usr/bin/env python
"""A/B the AL MC-dropout inference sweep on the REAL chip (VERDICT r2 weak #1).

Grid: {folded 3B-row forward vs sequential 3 passes} x infer_batch_size in
{256, 512, 1024}.  Workload matches the production sweep: scanned
multi-batch MC inference (mc_droprate 0.5) over a device-resident dataset at
charades parity shapes (reference eval_test_save,
utils/runner_utils.py:69-110 — 33.7k samples x 3 passes on anet).

Timing protocol is bench.py's: iterations chained through a data dependency,
clock stopped only after a jax.device_get value fetch (PROFILING.md §1).

Writes results/sweep_ablation.json.  Usage:
    python tools/sweep_ablation.py [--iters 10] [--pairs 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "sweep_ablation.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pairs", type=int, default=4096,
                    help="pairs per scanned dispatch")
    ap.add_argument("--mc", type=float, default=0.5)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[256, 512, 1024])
    ap.add_argument("--folds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--mc-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute dtype of the stochastic passes "
                         "(train.mc_dtype)")
    ap.add_argument("--out-suffix", default="")
    args = ap.parse_args()

    import bench
    from hual_tpu.runtime.steps import (make_infer_step_indexed,
                                        make_infer_sweep_indexed)

    jax, model, tx, data, wv, params = bench.build()
    import jax.numpy as jnp
    peak = bench.device_peak_flops(jax)
    N = data["feat_rows"].shape[0]
    rng = jax.random.key(0, impl="rbg")

    mc_model = (model.clone(compute_dtype="bfloat16")
                if args.mc_dtype == "bfloat16" else None)
    rows = []
    for fold in [bool(f) for f in args.folds]:
        for B in args.batches:
            n_batches = max(args.pairs // B, 2)
            sels = jax.device_put(
                (np.arange(n_batches * B, dtype=np.int32) % N)
                .reshape(n_batches, B))
            sweep = jax.jit(make_infer_sweep_indexed(model, args.mc, fold,
                                                     mc_model))
            step = jax.jit(make_infer_step_indexed(model, args.mc, fold,
                                                   mc_model))
            step_flops = bench.compiled_flops(jax, step, params, data,
                                              sels[0], wv, rng)
            carry = {"x": jnp.zeros((), jnp.int32)}

            def once():
                out = sweep(params, data, sels,
                            wv, jax.random.fold_in(rng, carry["x"]))
                carry["x"] = (jnp.sum(out["ious"]) * 0).astype(jnp.int32)
                return out["ious"]

            dt = bench.time_loop(jax, once, n_warmup=2, n_iters=args.iters)
            pps = n_batches * B / dt
            mfu = (step_flops * n_batches / dt) / peak \
                if np.isfinite(step_flops) else float("nan")
            bench.check_mfu(f"sweep fold={fold} B={B}", mfu)
            row = {"fold_mc": fold, "mc_dtype": args.mc_dtype,
                   "batch_size": B,
                   "n_batches": n_batches,
                   "pairs_per_sec": round(pps, 1), "mfu": round(mfu, 4),
                   "dispatch_ms": round(dt * 1e3, 2),
                   "step_flops_g": round(step_flops / 1e9, 2)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: r["pairs_per_sec"])
    result = {"workload": "scanned MC-dropout sweep, mc=%.2f, charades "
                          "parity shapes T=64 vdim=1024 dim=128" % args.mc,
              "device": jax.devices()[0].device_kind,
              "peak_flops_assumed": peak,
              "protocol": "chained scanned dispatches; timing ends at a "
                          "device_get value fetch (PROFILING.md §1)",
              "grid": rows, "best": best}
    out_path = OUT.replace(".json", args.out_suffix + ".json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print("best:", json.dumps(best))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
