#!/usr/bin/env python
"""Real-chip comparison: flax/XLA sweeps vs the fused-Pallas forward.

Measures, at the shipped sweep shapes (B=96, charades parity model), the
scanned eval sweep (1 deterministic forward/sample) and the AL MC-dropout
infer sweep (clean + 2 stochastic) with the clean pass on the fused kernel.
Timing protocol = bench.py's (chained dispatches, device_get-terminated).

Writes results/fused_forward_bench.json.

    python tools/bench_fused.py [--iters 10] [--blocks 8 16 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "fused_forward_bench.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--steps", type=int, default=21)
    # bb=32's block-diagonal attention matrices exceed even the raised
    # 100 MB VMEM cap; 8 and 16 fit (fused_forward.py compiler_params)
    ap.add_argument("--blocks", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--mxu-bf16", action="store_true",
                    help="bf16 multiplies (f32 accumulate) inside the "
                         "fused kernel — the flax path's default-precision "
                         "numerics class")
    ap.add_argument("--skip-flax", action="store_true")
    args = ap.parse_args()

    import bench
    from hual_tpu.runtime.steps import (make_eval_sweep_indexed,
                                        make_fused_eval_sweep_indexed,
                                        make_fused_infer_sweep_indexed,
                                        make_infer_sweep_indexed)

    jax, model, tx, data, wv, params = bench.build()
    import jax.numpy as jnp
    N = data["feat_rows"].shape[0]
    B, S = args.batch, args.steps
    pairs = B * S
    sels = jax.device_put((np.arange(pairs, dtype=np.int32) % N)
                          .reshape(S, B))
    rng = jax.random.key(0, impl="rbg")
    rows = []

    def timed(name, fn, is_infer):
        carry = {"x": jnp.zeros((), jnp.int32)}

        def once():
            if is_infer:
                out = fn(params, data, sels, wv,
                         jax.random.fold_in(rng, carry["x"]))
                ious = out["ious"]
            else:
                ious = fn(params, data, sels, wv)
            carry["x"] = (jnp.sum(ious) * 0).astype(jnp.int32)
            return ious

        dt = bench.time_loop(jax, once, n_warmup=2, n_iters=args.iters)
        row = {"name": name, "pairs_per_sec": round(pairs / dt, 1),
               "dispatch_ms": round(dt * 1e3, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    mx = args.mxu_bf16
    tag = "_bf16mxu" if mx else ""
    if not args.skip_flax:
        timed("eval_flax", jax.jit(make_eval_sweep_indexed(model)), False)
    for bb in args.blocks:
        timed(f"eval_fused_bb{bb}{tag}",
              jax.jit(make_fused_eval_sweep_indexed(model, block_b=bb,
                                                    mxu_bf16=mx)),
              False)
    if not args.skip_flax:
        timed("infer_flax_mc0.5",
              jax.jit(make_infer_sweep_indexed(model, 0.5)), True)
    bb = args.blocks[0]
    # fused row: NOT behind --skip-flax (that flag skips flax baselines only)
    timed(f"infer_fusedclean_mc0.5_bb{bb}{tag}",
          jax.jit(make_fused_infer_sweep_indexed(model, 0.5, block_b=bb,
                                                 mxu_bf16=mx)), True)
    mc16 = model.clone(compute_dtype="bfloat16")
    if not args.skip_flax:
        timed("infer_flax_mc0.5_bf16stoch",
              jax.jit(make_infer_sweep_indexed(model, 0.5, mc_model=mc16)),
              True)
    timed(f"infer_fusedclean_bf16stoch_bb{bb}{tag}",
          jax.jit(make_fused_infer_sweep_indexed(model, 0.5, mc_model=mc16,
                                                 block_b=bb,
                                                 mxu_bf16=mx)), True)

    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f).get("rows", [])
        have = {r["name"] for r in rows}
        rows = [r for r in prev if r["name"] not in have] + rows
    result = {"workload": f"scanned sweeps, B={B} x {S} steps, charades "
                          f"parity shapes", "device": jax.devices()[0].device_kind,
              "protocol": "chained dispatches; device_get-terminated "
                          "(PROFILING.md §1)", "rows": rows}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
