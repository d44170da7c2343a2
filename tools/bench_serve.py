#!/usr/bin/env python
"""Serving latency/throughput on the real chip (hual_tpu/serve.py).

Protocol (docs/PROFILING.md §1): every predict call already ends on a
jax.device_get value fetch — the per-call wall time IS the honest serving
latency through this environment's tunnel (dispatch jitter 4-20 ms is part
of the deployment reality here; on a directly-attached TPU host it shrinks
to microseconds).  Reports, at charades parity shapes (T=64, vdim=1024,
dim=128):

* single-request latency: p50/p90 over N calls at batch_size=1,
* batched throughput: requests/s for batch sizes 8/32/96 (pipeline includes
  host-side tokenize + downsample + pad, i.e. the full request path),
* the device-only portion (forward dispatch + fetch, pre-encoded batch) for
  comparison.

Writes results/serve_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_synthetic_data import make_dataset  # noqa: E402

from hual_tpu.config import (Config, LossConfig, ModelConfig,  # noqa: E402
                             PathsConfig, TrainConfig)
from hual_tpu.data.datasets import gen_or_load_dataset  # noqa: E402
from hual_tpu.data.features import FeatureStore  # noqa: E402
from hual_tpu.runtime.trainer import Trainer  # noqa: E402
from hual_tpu.serve import Predictor, export_bundle  # noqa: E402
from hual_tpu.utils.io import load_json  # noqa: E402


def build_trainer(root: str) -> Trainer:
    make_dataset(root, task="charades", n_train=128, n_test=64, vdim=1024,
                 max_raw_len=120, min_raw_len=24, seed=5)
    cfg = Config(
        task="charades", suffix="serve",
        paths=PathsConfig(
            ckpt_dir=os.path.join(root, "ckpt"),
            cache_dir=os.path.join(root, "data_pkl"),
            feature_path=os.path.join(root, "data/features/charades_i3d"),
            glove_path=os.path.join(root, "data/glove/glove.840B.300d.txt"),
            train_path=os.path.join(root, "data/charades_re0/train.json"),
            test_path=os.path.join(root, "data/charades_re0/test.json"),
        ),
        train=TrainConfig(epochs=1, batch_size=16, lr=1e-4, droprate=0.2,
                          clip_norm=1.0, seed=12345),
        # charades parity shapes (configs/charades/SeqPAN.yaml:16-25)
        model=ModelConfig(name="SeqPAN", max_vlen=64, max_tlen=30, vdim=1024,
                          dim=128, num_heads=8, word_dim=300, char_dim=50,
                          attn_layer=2),
        loss=LossConfig(match_lambda=1.0, tau=0.3, no_gumbel=True),
    )
    dataset = gen_or_load_dataset(cfg)
    features = FeatureStore.from_dir(cfg.paths.feature_path, cfg.model.max_vlen)
    t = Trainer(cfg, dataset, features)
    t.init_state()
    return t


def requests_from(trainer, n: int) -> list:
    recs = load_json(trainer.config.paths.test_path)
    feat_dir = trainer.config.paths.feature_path
    reqs = []
    while len(reqs) < n:
        for vid, duration, _gt, sentence in recs:
            feats = np.load(os.path.join(feat_dir, f"{vid}.npy"))
            reqs.append((feats, duration, sentence))
            if len(reqs) == n:
                break
    return reqs


def main() -> None:
    import jax

    root = "/tmp/hual_serve_bench"
    os.makedirs(root, exist_ok=True)
    print("building trainer...", flush=True)
    trainer = build_trainer(root)
    print("exporting bundle...", flush=True)
    bundle = export_bundle(trainer, os.path.join(root, "bundle"))
    out = {"backend": jax.default_backend(),
           "shapes": "charades parity (T=64, vdim=1024, dim=128)",
           "protocol": "each sample ends on jax.device_get (PROFILING.md §1)"}

    # --- single-request latency -----------------------------------------
    print("compiling b=1...", flush=True)
    p1 = Predictor.from_bundle(bundle, batch_size=1)
    t0 = time.perf_counter()
    p1.warmup()
    out["compile_s_b1"] = round(time.perf_counter() - t0, 2)
    reqs = requests_from(trainer, 64)
    for r in reqs[:3]:
        p1.predict(*r)  # prime host caches
    lat = []
    for r in reqs:
        t0 = time.perf_counter()
        p1.predict(*r)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.array(lat)
    out["single_latency_ms"] = {"p50": round(float(np.percentile(lat, 50)), 2),
                                "p90": round(float(np.percentile(lat, 90)), 2),
                                "mean": round(float(lat.mean()), 2),
                                "n": len(lat)}

    # --- batched throughput (full request path incl. host encode) --------
    out["batched"] = {}
    for bs in (8, 32, 96):
        print(f"compiling b={bs}...", flush=True)
        p = Predictor.from_bundle(bundle, batch_size=bs)
        p.warmup()
        reqs = requests_from(trainer, bs * 10)
        p.predict_batch(reqs[:bs])  # prime
        t0 = time.perf_counter()
        p.predict_batch(reqs)
        dt = time.perf_counter() - t0
        # device-only portion: pre-encoded fixed batch, dispatch + fetch
        batch = p._dummy_batch()
        jax.device_get(p._forward(p._params, batch, p._word_vectors))
        t1 = time.perf_counter()
        for _ in range(10):
            jax.device_get(p._forward(p._params, batch, p._word_vectors))
        dev = (time.perf_counter() - t1) / 10
        out["batched"][f"b{bs}"] = {
            "requests_per_s": round(len(reqs) / dt, 1),
            "ms_per_batch_end_to_end": round(dt / 10 * 1e3, 2),
            "ms_per_batch_device_only": round(dev * 1e3, 2),
        }

    os.makedirs("results", exist_ok=True)
    path = os.path.join("results", "serve_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
