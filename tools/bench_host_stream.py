#!/usr/bin/env python
"""Real-chip measurement of HOST-STREAMING per-step upload: f32 vs int8.

The >HBM fallback ships every batch over the host->device link — through
this environment's tunnel that link moves ~12 MiB/s (warm; jitters
session-to-session, PROFILING.md §5b), so the per-step upload IS the
host-streaming floor.  With model.feature_dtype='int8' the trainer now
streams (int8 features, f32 per-clip scales) and dequantizes on device
(VERDICT r4 #5; runtime/trainer._hs_stream + steps.dequantize_batch).
This measures both wire formats on the production train step at the
ActivityNet shapes the fallback exists for (T=100, vdim=1024, B=16):

* per-step wall time of the jitted train step fed HOST numpy batches
  (re-uploaded every call — exactly the streaming regime), timing ended at
  a device_get value fetch (bench.py protocol, PROFILING.md §1),
* the isolated payload upload (device_put + fetch-sync of one batch),
* the f32/int8 ratios — the portable result; absolute MiB/s is
  session-dependent, ratios within one warmed session are stable.

Writes results/host_stream_bench.json.

    python tools/bench_host_stream.py [--iters 20]
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
OUT = os.path.join(REPO, "results", "host_stream_bench.json")

B, T, VDIM, W, C = 16, 100, 1024, 20, 12
DIM, HEADS, LAYERS, CHAR_DIM = 128, 8, 2, 100  # anet config


def _batch(rng: np.random.Generator) -> dict:
    from hual_tpu.data.labels import make_span_labels

    v_len = rng.integers(8, T + 1, size=B).astype(np.int32)
    feats = rng.normal(size=(B, T, VDIM)).astype(np.float32)
    word_ids = rng.integers(1, 100, size=(B, W)).astype(np.int32)
    char_ids = rng.integers(0, 40, size=(B, W, C)).astype(np.int32)
    s = (rng.uniform(0, 0.5, B) * v_len).astype(np.int32)
    e = np.minimum(s + rng.integers(1, 8, B), v_len - 1).astype(np.int32)
    e = np.maximum(e, s)
    y1, y2, match, inner = make_span_labels(s, e, v_len, T)
    return {"video_features": feats, "video_seq_len": v_len,
            "word_ids": word_ids, "char_ids": char_ids, "s_ind": s,
            "e_ind": e, "duration": rng.uniform(20, 120, B).astype(np.float32),
            "y1": y1, "y2": y2, "match_labels": match,
            "inner_labels": inner.astype(np.float32)}


def _quantized(batch: dict) -> dict:
    from hual_tpu.data.features import quantize_features

    q, s = quantize_features(batch["video_features"])
    return dict(batch, video_features=q, feature_scales=s)


def _payload_bytes(batch: dict) -> int:
    return int(sum(np.asarray(v).nbytes for v in batch.values()))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.ops.optim import make_optimizer
    from hual_tpu.runtime.steps import make_train_step

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/hual_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    rng = np.random.default_rng(0)
    model = SeqPAN(dim=DIM, num_heads=HEADS, attn_layer=LAYERS, max_vlen=T,
                   word_dim=300, char_dim=CHAR_DIM, num_chars=60, tau=0.3,
                   use_gumbel=False)
    tx = make_optimizer(1.0, 0.01)
    wv = jax.device_put(rng.normal(size=(98, 300)).astype(np.float32))
    base = _batch(rng)
    params = model.init({"params": jax.random.key(0)}, base, wv, 0.0,
                        base["match_labels"], deterministic=True)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, tx, 1.0, 0.2))
    key = jax.random.key(7, impl="rbg")
    lr = jnp.float32(1e-4)

    # pre-build distinct host batches so batch assembly is outside the timer
    batches = [_batch(rng) for _ in range(a.iters)]
    variants = {"float32": batches,
                "int8": [_quantized(b) for b in batches]}

    rows = {}
    for name, bs in variants.items():
        # warm (compile + tunnel warm-up)
        p, o = params, opt_state
        for b in bs[:2]:
            p, o, m = step(p, o, b, wv, lr, key)
        float(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        for b in bs:
            p, o, m = step(p, o, b, wv, lr, key)
        float(jax.device_get(m["loss"]))  # trusted sync (PROFILING.md §1)
        dt = (time.perf_counter() - t0) / len(bs)

        # isolated payload upload (device_put is async; fetch-sync an
        # element of the LAST uploaded array to bound completion)
        t0 = time.perf_counter()
        for b in bs:
            dev = jax.device_put(b["video_features"])
        np.asarray(jax.device_get(dev[0, 0, :1]))
        up = (time.perf_counter() - t0) / len(bs)

        nbytes = _payload_bytes(bs[0])
        rows[name] = {"step_ms": round(dt * 1e3, 2),
                      "upload_ms": round(up * 1e3, 2),
                      "payload_mib": round(nbytes / 2**20, 3),
                      "upload_mib_s": round(
                          bs[0]["video_features"].nbytes / 2**20 / up, 2)}
        print(json.dumps({name: rows[name]}), flush=True)

    out = {
        "workload": (f"host-streamed train step, anet shapes B={B} T={T} "
                     f"vdim={VDIM} dim={DIM} (fwd+bwd+AdamW+IoU)"),
        "device": getattr(jax.devices()[0], "device_kind", "unknown"),
        "protocol": ("distinct host batches per call (the streaming "
                     "regime); timing ends at a device_get value fetch"),
        "rows": rows,
        "step_speedup_int8": round(
            rows["float32"]["step_ms"] / rows["int8"]["step_ms"], 2),
        "upload_ratio_f32_over_int8": round(
            rows["float32"]["upload_ms"] / rows["int8"]["upload_ms"], 2),
        "caveat": ("tunnel bandwidth jitters session-to-session; trust the "
                   "ratios, not the absolute MiB/s (PROFILING.md §5b)"),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}: step {rows['float32']['step_ms']} -> "
          f"{rows['int8']['step_ms']} ms "
          f"({out['step_speedup_int8']}x), upload ratio "
          f"{out['upload_ratio_f32_over_int8']}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
