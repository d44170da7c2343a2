#!/usr/bin/env python
"""Measure the reference HUAL trainer's throughput in THIS container.

Round 1 divided a TPU measurement by a guessed "400 pairs/s on a datacenter
GPU" (VERDICT.md missing #2).  This tool replaces the guess with a
measurement: it imports the mounted reference (read-only,
/root/reference/models + /root/reference/utils), builds its TF1 SeqPAN graph
at the Charades parity shapes, and times its OWN production train loop —
``utils/runner_utils.py:139-159 train_epoch`` with per-batch feed-dicts and
host-side label synthesis/IoU bookkeeping — on this host's CPU (no GPU
exists here; the TPU is not reachable from TF).

For an apples-to-apples same-hardware ratio it then times OUR production
path (device-resident scanned epoch) on the same CPU via JAX's CPU backend.

Writes results/reference_baseline.json, which bench.py consumes for
``vs_baseline``.

Usage:  python tools/bench_reference.py [--n 256] [--epochs 3] [--skip-ours]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT_PATH = os.path.join(REPO, "results", "reference_baseline.json")

# parity shapes: reference configs/charades/SeqPAN.yaml:11-25
T, V, DIM, HEADS, LAYERS, B = 64, 1024, 128, 8, 2, 16
W, C, VOCAB, CHARS = 14, 12, 1000, 60


def _ns(**kw):
    return types.SimpleNamespace(**kw)


def make_configs():
    """The attribute tree the reference SeqPAN/__init__ + loaders read."""
    return _ns(
        num_chars=CHARS,
        model=_ns(vdim=V, dim=DIM, num_heads=HEADS, attn_layer=LAYERS,
                  max_vlen=T, word_dim=300, char_dim=50),
        train=_ns(batch_size=B, clip_norm=1.0, droprate=0.2, lr=1e-4),
        loss=_ns(no_gumbel=True, tau=0.3, match_lambda=1.0),
    )


def make_records(n: int, seed: int = 0):
    """Synthetic records in the reference dataset_gen schema
    (utils/data_gen.py:98-118) + a visual-features dict."""
    rng = np.random.default_rng(seed)
    records, feats = [], {}
    for i in range(n):
        vid = f"v{i:05d}"
        feats[vid] = rng.normal(size=(T, V)).astype(np.float32)
        s = int(rng.integers(0, T // 2))
        e = int(min(s + rng.integers(1, T // 2), T - 1))
        wl = int(rng.integers(4, W + 1))
        records.append({
            "sample_id": i, "vid": vid, "duration": float(rng.uniform(15, 40)),
            "words": ["w%d" % j for j in range(wl)],
            "s_ind": s, "e_ind": e, "v_len": T,
            "w_ids": rng.integers(2, VOCAB, size=wl).tolist(),
            "c_ids": [rng.integers(1, CHARS, size=int(rng.integers(1, C + 1))
                                   ).tolist() for _ in range(wl)],
        })
    return records, feats


def bench_reference(n: int, epochs: int) -> dict:
    sys.path.insert(0, REFERENCE)
    import tensorflow as tf
    tf.compat.v1.disable_eager_execution()
    tf.compat.v1.set_random_seed(12345)

    from models.model import SeqPAN as RefSeqPAN          # noqa: E402
    from utils.data_loader import TrainLoader as RefTrainLoader  # noqa: E402
    from utils.runner_utils import get_feed_dict, train_epoch    # noqa: E402

    configs = make_configs()
    records, feats = make_records(n)
    loader = RefTrainLoader(records, feats, configs)
    word_vectors = np.random.default_rng(1).normal(
        size=(VOCAB - 2, 300)).astype(np.float32)

    graph = tf.Graph()
    model = RefSeqPAN(configs, graph, word_vectors=word_vectors)
    with graph.as_default():
        init = tf.compat.v1.global_variables_initializer()
    sess = tf.compat.v1.Session(graph=graph)
    sess.run(init)

    # warmup epoch (TF graph finalization/first-run costs)
    train_epoch(sess, loader, model, 1e-4, configs, get_feed_dict)

    t0 = time.perf_counter()
    for _ in range(epochs):
        r1i3, r1i5, r1i7, mi, _ = train_epoch(sess, loader, model, 1e-4,
                                              configs, get_feed_dict)
    dt = (time.perf_counter() - t0) / epochs
    pairs_per_sec = n / dt

    # isolated sess.run step (no host label synthesis / IoU bookkeeping)
    batch = next(iter(loader.batch_iter()))
    _, feed = get_feed_dict(batch, model, lr=1e-4, drop_rate=0.2, mode="train")
    for _ in range(3):
        sess.run([model.train_op, model.loss], feed_dict=feed)
    t0 = time.perf_counter()
    for _ in range(20):
        sess.run([model.train_op, model.loss], feed_dict=feed)
    step_ms = (time.perf_counter() - t0) / 20 * 1e3
    sess.close()
    return {"ref_train_pairs_per_sec": round(pairs_per_sec, 2),
            "ref_epoch_s": round(dt, 3),
            "ref_sess_run_step_ms": round(step_ms, 2),
            "ref_r1i7_smoke": r1i7}


def bench_ours_cpu(n: int, epochs: int) -> dict:
    """Our production scanned-epoch path at the same shapes, same host CPU."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    sys.path.insert(0, REPO)
    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.ops.optim import make_optimizer
    from hual_tpu.runtime.steps import (gather_batch,
                                        make_train_epoch_indexed)

    rng = np.random.default_rng(0)
    s = rng.integers(0, T // 2, n).astype(np.int32)
    data = {
        "features": rng.normal(size=(n, T, V)).astype(np.float32),
        "feat_rows": np.arange(n, dtype=np.int32),
        "v_len": np.full(n, T, np.int32),
        "word_ids": rng.integers(1, VOCAB, size=(n, W)).astype(np.int32),
        "char_ids": rng.integers(0, CHARS, size=(n, W, C)).astype(np.int32),
        "duration": rng.uniform(15, 40, size=n).astype(np.float32),
        "s_ind": s,
        "e_ind": np.minimum(s + rng.integers(1, T // 2, n), T - 1).astype(np.int32),
    }
    data = {k: jax.device_put(v) for k, v in data.items()}
    wv = jax.device_put(rng.normal(size=(VOCAB, 300)).astype(np.float32))
    model = SeqPAN(dim=DIM, num_heads=HEADS, attn_layer=LAYERS, max_vlen=T,
                   word_dim=300, char_dim=50, num_chars=CHARS)
    batch0 = jax.jit(lambda d, sl: gather_batch(d, sl, True))(
        data, np.arange(B, dtype=np.int32))
    params = model.init({"params": jax.random.key(0)}, batch0, wv, 0.0,
                        batch0["match_labels"], deterministic=True)
    tx = make_optimizer(1.0, 0.01)
    opt_state = tx.init(params)
    epoch_fn = jax.jit(make_train_epoch_indexed(model, tx, 1.0, 0.2),
                       donate_argnums=(0, 1))
    sels = jax.device_put(np.random.default_rng(7).permutation(
        n - n % B).astype(np.int32).reshape(-1, B))
    key = jax.random.key(0)
    lr = jnp.float32(1e-4)

    params, opt_state, losses, _ = epoch_fn(params, opt_state, data, sels,
                                            wv, lr, key, jnp.int32(0))
    np.asarray(losses)  # sync warmup
    t0 = time.perf_counter()
    for _ in range(epochs):
        params, opt_state, losses, _ = epoch_fn(params, opt_state, data,
                                                sels, wv, lr, key, jnp.int32(0))
    val = np.asarray(losses)  # value fetch = sync
    dt = (time.perf_counter() - t0) / epochs
    assert np.isfinite(val).all()
    n_eff = sels.shape[0] * B
    return {"ours_cpu_pairs_per_sec": round(n_eff / dt, 2),
            "ours_cpu_epoch_s": round(dt, 3)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--skip-ours", action="store_true")
    args = ap.parse_args()

    result = {
        "protocol": (
            f"reference TF1 trainer (mounted at /root/reference) measured in "
            f"this container on host CPU: train_epoch "
            f"(utils/runner_utils.py:139-159) incl. feed-dict assembly, host "
            f"label synthesis and IoU bookkeeping; synthetic data at charades "
            f"parity shapes B={B}, T={T}, vdim={V}, dim={DIM}; N={args.n}, "
            f"mean of {args.epochs} epochs after 1 warmup. No GPU exists in "
            f"this container and the TPU is not reachable from TF, so the "
            f"anchor hardware is CPU; the same-host ours-CPU number is "
            f"included for an equal-hardware ratio."),
        "measured": True,
        "shapes": {"B": B, "T": T, "vdim": V, "dim": DIM, "n": args.n},
    }
    print("benchmarking reference TF1 trainer (CPU)...", flush=True)
    result.update(bench_reference(args.n, args.epochs))
    print(json.dumps({k: v for k, v in result.items() if k != "protocol"}))
    if not args.skip_ours:
        print("benchmarking our scanned-epoch path on the same CPU...",
              flush=True)
        result.update(bench_ours_cpu(args.n, args.epochs))
        result["cpu_same_host_speedup"] = round(
            result["ours_cpu_pairs_per_sec"]
            / result["ref_train_pairs_per_sec"], 2)
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    print(f"wrote {OUT_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
