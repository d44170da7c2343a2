#!/usr/bin/env python
"""Minimal real-chip compile + correctness smoke of the fused Pallas forward.

Compiles ONLY the fused kernel (plus the tiny XLA front) at the shipped
charades parity shapes and checks it against the flax forward on-device.
Exists because the Mosaic TPU compiler runs server-side here (remote
compile tunnel): lowering errors like "unsupported shape cast" only
surface on a real compile, and the full bench takes ~10 min to reach it.

    python tools/fused_smoke.py [--block 8] [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.ops.pallas.fused_forward import seqpan_forward_fused

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/hual_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # compare at f32-exact matmul precision: the flax path's DEFAULT
    # precision does bf16 multiplies on TPU, which alone moves logits ~1e-1
    jax.config.update("jax_default_matmul_precision", "highest")
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    B, T, W, C = args.batch, 64, 30, 12
    model = SeqPAN(dim=128, num_heads=8, attn_layer=2, max_vlen=T,
                   word_dim=300, char_dim=50, num_chars=40)
    rng = np.random.default_rng(7)
    batch = {
        "video_features": jnp.asarray(
            rng.normal(size=(B, T, 1024)).astype(np.float32)),
        "video_seq_len": jnp.asarray(
            rng.integers(5, T + 1, (B,)).astype(np.int32)),
        "word_ids": jnp.asarray(np.where(
            np.arange(W)[None, :] < rng.integers(2, W + 1, (B, 1)),
            rng.integers(1, 200, (B, W)), 0).astype(np.int32)),
        "char_ids": jnp.asarray(
            rng.integers(0, 40, (B, W, C)).astype(np.int32)),
    }
    wv = jnp.asarray(rng.normal(size=(300, 300)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, batch, wv, 0.0,
                        deterministic=True)

    t0 = time.time()
    out = seqpan_forward_fused(model, params, batch, wv, block_b=args.block)
    s = np.asarray(jax.device_get(out["start_logits"]))
    print(f"fused compile+run: {time.time() - t0:.1f}s", flush=True)

    ref = model.apply(params, batch, wv, 0.0, deterministic=True)
    rs = np.asarray(jax.device_get(ref["start_logits"]))
    re = np.asarray(jax.device_get(ref["end_logits"]))
    e = np.asarray(jax.device_get(out["end_logits"]))
    ms = np.asarray(jax.device_get(out["match_scores"]))
    rms = np.asarray(jax.device_get(ref["match_scores"]))
    for name, a, b, tol in (("start", s, rs, 2e-3), ("end", e, re, 2e-3),
                            ("match", ms, rms, 1e-3)):
        d = float(np.max(np.abs(a - b)))
        print(f"max|fused-flax| {name}: {d:.2e}", flush=True)
        if not np.isfinite(d) or d > tol:
            print("FAIL", name)
            return 1
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
