#!/usr/bin/env python
"""Real-chip ablation of the per-epoch EVAL sweep's batch size.

Round 3 measured the AL infer sweep's optimum at B=96 and shipped it
(train.infer_batch_size); the per-epoch eval sweep — run every one of the
loop's 50/100 epochs over the full test split — still defaults to the train
batch (16).  This measures the scanned eval sweep at candidate batches on
both dataset shapes (charades T=64, anet T=100) under bench.py's protocol.

Writes results/eval_batch_bench.json.

    python tools/bench_eval_batch.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "eval_batch_bench.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[16, 48, 96, 192])
    ap.add_argument("--pairs", type=int, default=2016,
                    help="samples per timed sweep (divisible by batches)")
    args = ap.parse_args()

    import bench

    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/hual_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from hual_tpu.runtime.steps import make_eval_sweep_indexed

    peak = bench.device_peak_flops(jax)
    out_rows = []
    for T in (64, 100):
        jx, model, tx, data, wv, params = bench.build(T=T)
        sweep = jax.jit(make_eval_sweep_indexed(model))
        N = int(data["feat_rows"].shape[0])
        for B in args.batches:
            S = args.pairs // B
            sels = jax.device_put(
                (np.arange(S * B, dtype=np.int32) % N).reshape(S, B))

            state = {"acc": None}

            def once():
                # chain iterations through a data dependency on the output
                prev = 0.0 if state["acc"] is None else state["acc"][0, 0] * 0
                ious = sweep(params, data, sels, wv) + prev
                state["acc"] = ious
                return ious

            dt = bench.time_loop(jax, once, n_warmup=2, n_iters=args.iters)
            pps = S * B / dt
            row = {"T": T, "batch_size": B, "n_batches": S,
                   "pairs_per_sec": round(pps, 1),
                   "dispatch_ms": round(dt * 1e3, 2)}
            out_rows.append(row)
            print(json.dumps(row), flush=True)

    best = {}
    for T in (64, 100):
        rows_t = [r for r in out_rows if r["T"] == T]
        best[f"T{T}"] = max(rows_t, key=lambda r: r["pairs_per_sec"])
    result = {
        "workload": "scanned eval sweep (1 deterministic forward/sample), "
                    "charades parity model at T=64 and anet shapes T=100",
        "device": str(jax.devices()[0]),
        "peak_flops_assumed": peak,
        "protocol": "chained scanned dispatches; timing ends at a "
                    "device_get value fetch (PROFILING.md §1)",
        "grid": out_rows,
        "best": best,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"best": best}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
