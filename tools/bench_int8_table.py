#!/usr/bin/env python
"""Real-chip measurement of the int8 feature-table path.

Two claims to pin with numbers (docs/PROFILING.md §5b):
  1. the one-time host->device table upload through the ~12 MiB/s tunnel
     shrinks ~4x vs float32 (bytes-proportional), and
  2. dequantize-on-gather (runtime/steps.gather_batch) costs nothing
     measurable in the scanned train epoch / AL infer sweep.

Protocol = bench.py's: donated-state chained iterations, timing ends at a
`jax.device_get` value fetch, FLOPs from XLA cost_analysis, MFU guard.

Writes results/int8_table_bench.json.

    python tools/bench_int8_table.py [--rows 1024] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "int8_table_bench.json")


def _timed_put(jax, arrs, trials: int = 2) -> float:
    """Upload one or more host arrays; clock stops only after a VALUE FETCH
    that depends on every uploaded array (device_put is async and
    block_until_ready is not trusted on the axon platform).  min over
    `trials` — the tunnel's first transfer of a process absorbs connection
    warmup and its bandwidth jitters run-to-run."""
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        on_dev = [jax.device_put(a) for a in arrs]
        probe = sum(float(jax.device_get(a.reshape(-1)[-1])) for a in on_dev)
        dt = time.perf_counter() - t0
        assert np.isfinite(probe)
        for a in on_dev:
            a.delete()
        best = min(best, dt)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1024,
                    help="table rows for the upload probe (T=64, D=1024: "
                         "1024 rows = 256 MiB f32)")
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

    from hual_tpu.data.features import quantize_features
    from hual_tpu.runtime.steps import (gather_batch,
                                        make_infer_sweep_indexed,
                                        make_train_epoch_indexed)

    # --- 1. upload probe: same logical table, three storage dtypes --------
    T, D = 64, 1024
    rng_np = np.random.default_rng(0)
    table = rng_np.normal(size=(args.rows, T, D)).astype(np.float32)
    t_q = time.perf_counter()
    q, scales = quantize_features(table)
    quantize_s = time.perf_counter() - t_q

    # warmup: absorb the tunnel's first-transfer connection cost before
    # any timed probe (measured: an untimed first put can run ~7x slower)
    _timed_put(jax, [np.zeros((2, 1024, 1024), np.float32)], trials=1)

    uploads = {}
    uploads["float32"] = _timed_put(jax, [table])
    uploads["bfloat16"] = _timed_put(jax, [table.astype(jnp.bfloat16)])
    uploads["int8"] = _timed_put(jax, [q, scales])
    mib = table.nbytes / 2**20

    # --- 2. gather-path cost: train epoch + AL sweep, f32 vs int8 table ---
    jax2, model, tx, data, wv, params = bench.build()
    B, N = args.batch, int(data["feat_rows"].shape[0])
    lr = jnp.float32(1e-4)
    rng = jax.random.key(0, impl="rbg")
    peak = bench.device_peak_flops(jax)
    perm = rng_np.permutation(N).astype(np.int32)
    epoch_sels = jax.device_put(perm.reshape(N // B, B))
    sweep_b = 96
    sweep_sels = jax.device_put(
        np.arange(N - N % sweep_b, dtype=np.int32).reshape(-1, sweep_b))

    feats_f32 = np.asarray(jax.device_get(data["features"]))
    q2, scales2 = quantize_features(feats_f32)
    data_int8 = dict(data)
    data_int8["features"] = jax.device_put(q2)
    data_int8["feature_scales"] = jax.device_put(scales2)

    epoch_fn = jax.jit(make_train_epoch_indexed(model, tx, 1.0, 0.2),
                       donate_argnums=(0, 1))
    sweep_fn = jax.jit(make_infer_sweep_indexed(model, 0.5))

    rows = []
    for name, d in (("float32", data), ("int8", data_int8)):
        # epoch_fn donates params/opt — give each dtype its own copies
        p0 = jax.tree.map(jnp.copy, params)
        st = {"p": p0, "o": tx.init(p0)}

        def epoch_once():
            st["p"], st["o"], losses, ious = epoch_fn(
                st["p"], st["o"], d, epoch_sels, wv, lr, rng, jnp.int32(0))
            return losses

        dt_train = bench.time_loop(jax, epoch_once, n_warmup=2,
                                   n_iters=args.iters)

        carry = {"x": jnp.zeros((), jnp.int32)}

        def sweep_once():
            # chain iterations through the rng so call i+1 depends on call i
            out = sweep_fn(st["p"], d, sweep_sels, wv,
                           jax.random.fold_in(rng, carry["x"]))
            carry["x"] = (jnp.sum(out["ious"]) * 0).astype(jnp.int32)
            return out["ious"]

        dt_sweep = bench.time_loop(jax, sweep_once, n_warmup=2,
                                   n_iters=args.iters)
        n_swept = int(sweep_sels.size)
        rows.append({
            "table_dtype": name,
            "train_pairs_per_sec": round(N / dt_train, 1),
            "train_epoch_ms": round(dt_train * 1e3, 2),
            "sweep_pairs_per_sec": round(n_swept / dt_sweep, 1),
            "sweep_ms": round(dt_sweep * 1e3, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    f32_row, i8_row = rows
    out = {
        "device": str(jax.devices()[0]),
        "upload_probe": {
            "shape": [args.rows, T, D],
            "f32_mib": round(mib, 1),
            "quantize_host_s": round(quantize_s, 2),
            "upload_s": {k: round(v, 2) for k, v in uploads.items()},
            "int8_speedup_vs_f32": round(uploads["float32"]
                                         / uploads["int8"], 2),
        },
        "gather_path": {
            "rows": rows,
            "train_ratio_int8_vs_f32": round(
                i8_row["train_pairs_per_sec"]
                / f32_row["train_pairs_per_sec"], 3),
            "sweep_ratio_int8_vs_f32": round(
                i8_row["sweep_pairs_per_sec"]
                / f32_row["sweep_pairs_per_sec"], 3),
        },
        "protocol": "donated-state chained iterations; timing ends at a "
                    "device_get value fetch (PROFILING.md §1); uploads "
                    "sync'd by fetching the last element of each array",
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"int8_upload_speedup":
                      out["upload_probe"]["int8_speedup_vs_f32"],
                      "train_ratio": out["gather_path"]
                      ["train_ratio_int8_vs_f32"],
                      "sweep_ratio": out["gather_path"]
                      ["sweep_ratio_int8_vs_f32"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
