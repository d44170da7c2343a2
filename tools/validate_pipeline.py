#!/usr/bin/env python
"""Timed end-to-end pipeline validation at (scaled) reference shapes on the
real TPU: synthetic charades-shaped data -> train N epochs -> test ->
MC-dropout train-set inference -> one AL round.  Reports per-stage wall
times and an extrapolation to the full charades 3-round HUAL loop.

    python tools/validate_pipeline.py --n-train 2000 --n-test 500 --epochs 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from make_synthetic_data import make_dataset  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None)
    p.add_argument("--n-train", type=int, default=2000)
    p.add_argument("--n-test", type=int, default=500)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--vdim", type=int, default=1024)
    p.add_argument("--max-vlen", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=16)
    a = p.parse_args()

    root = a.root or tempfile.mkdtemp(prefix="hual_validate_")
    times = {}

    t0 = time.time()
    make_dataset(root, task="charades", n_train=a.n_train, n_test=a.n_test,
                 vdim=a.vdim, max_raw_len=128, seed=7)
    times["datagen_s"] = round(time.time() - t0, 2)

    from hual_tpu.config import (Config, LossConfig, ModelConfig, PathsConfig,
                                 TrainConfig)
    from hual_tpu.data.datasets import gen_or_load_dataset
    from hual_tpu.data.features import FeatureStore
    from hual_tpu.runtime.trainer import Trainer

    cfg = Config(
        task="charades", suffix="re0",
        paths=PathsConfig(
            ckpt_dir=os.path.join(root, "ckpt"),
            cache_dir=os.path.join(root, "data_pkl"),
            feature_path=os.path.join(root, "data/features/charades_i3d"),
            glove_path=os.path.join(root, "data/glove/glove.840B.300d.txt"),
            train_path=os.path.join(root, "data/charades_re0/train.json"),
            test_path=os.path.join(root, "data/charades_re0/test.json"),
        ),
        train=TrainConfig(epochs=a.epochs, batch_size=a.batch_size, lr=1e-4,
                          droprate=0.2, clip_norm=1.0),
        model=ModelConfig(max_vlen=a.max_vlen, vdim=a.vdim, dim=128,
                          num_heads=8, char_dim=50, attn_layer=2),
        loss=LossConfig(),
    )

    t0 = time.time()
    dataset = gen_or_load_dataset(cfg)
    times["dataset_gen_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    features = FeatureStore.from_dir(cfg.paths.feature_path, cfg.model.max_vlen)
    times["feature_load_s"] = round(time.time() - t0, 2)

    trainer = Trainer(cfg, dataset, features)
    trainer.init_state()

    t0 = time.time()
    best = trainer.train()
    times["train_total_s"] = round(time.time() - t0, 2)
    times["train_epoch_s"] = round(times["train_total_s"] / a.epochs, 2)
    times["train_pairs_per_sec"] = round(best.get("pairs_per_sec", 0.0), 1)
    # steady-state epoch cost (last epoch; excludes one-time compiles)
    steady = getattr(trainer, "last_epoch_wall",
                     {"train_s": times["train_epoch_s"], "eval_s": 0.0})
    times["steady_train_epoch_s"] = round(steady["train_s"], 2)
    times["steady_eval_s"] = round(steady["eval_s"], 2)

    trainer.restore()
    t0 = time.time()
    m = trainer.infer_trainset(
        save_path=os.path.join(root, "results/charades/re0.pkl"))
    times["infer_trainset_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    trainer.infer_trainset(
        save_path=os.path.join(root, "results/charades/re0.pkl"))
    times["infer_trainset_steady_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    from hual_tpu.active.engine import update_labels
    stats = update_labels("charades", 1,
                          data_root=os.path.join(root, "data"),
                          results_root=os.path.join(root, "results"))
    times["label_update_s"] = round(time.time() - t0, 2)

    # extrapolate from steady-state: full charades = 12403 train / 3720 test,
    # 50 epochs/round, 3 rounds; one-time compiles counted once per round
    scale_train = 12403 / a.n_train
    scale_test = 3720 / a.n_test
    compile_overhead = max(0.0, times["train_total_s"]
                           - a.epochs * (times["steady_train_epoch_s"]
                                         + times["steady_eval_s"]))
    per_round = (compile_overhead
                 + (times["steady_train_epoch_s"] * scale_train
                    + times["steady_eval_s"] * scale_test) * 50
                 + times["infer_trainset_steady_s"] * scale_train
                 + times["label_update_s"] * scale_train)
    times["compile_overhead_s"] = round(compile_overhead, 1)
    times["extrapolated_full_round_s"] = round(per_round, 1)
    times["extrapolated_3round_loop_min"] = round(per_round * 3 / 60, 1)
    times["best_r1i7"] = best["r1i7"]
    times["pseudo_miou_new"] = stats["new_miou"]

    print(json.dumps(times, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
