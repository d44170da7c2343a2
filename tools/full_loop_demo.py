#!/usr/bin/env python
"""The full HUAL loop at exact Charades scale on synthetic data.

Reproduces the reference's complete workflow end-to-end (reference
run_charades.py: re0 train + infer, then rounds re1-re3 of
update-labels -> train -> infer) at the real dataset scale
(12,403 train / 3,720 test, 50 epochs, batch 16) with synthetic features,
and reports per-stage wall times — the direct measurement of the
"full Charades loop < 1 h" target.

    python tools/full_loop_demo.py --root /tmp/fullscale
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from make_synthetic_data import make_dataset  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/hual_fullscale")
    p.add_argument("--n-train", type=int, default=12403)
    p.add_argument("--n-test", type=int, default=3720)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--rounds", type=int, default=3)
    a = p.parse_args()

    times = {}
    t_all = time.time()

    t0 = time.time()
    if not os.path.exists(os.path.join(a.root, "data", "charades_re0")):
        make_dataset(a.root, task="charades", n_train=a.n_train,
                     n_test=a.n_test, vdim=1024, max_raw_len=128, seed=7)
    times["datagen_s"] = round(time.time() - t0, 1)

    os.chdir(a.root)
    from hual_tpu.config import (Config, LossConfig, ModelConfig, PathsConfig,
                                 TrainConfig)

    base = Config(
        task="charades",
        paths=PathsConfig(
            ckpt_dir="./ckpt", cache_dir="./data_pkl/",
            feature_path="./data/features/charades_i3d",
            glove_path="./data/glove/glove.840B.300d.txt",
            train_path="./data/charades_gt/train.json",
            test_path="./data/charades_gt/test.json",
        ),
        train=TrainConfig(epochs=a.epochs, batch_size=16, lr=1e-4,
                          droprate=0.2, clip_norm=1.0),
        model=ModelConfig(max_vlen=64, max_tlen=30, vdim=1024, dim=128,
                          num_heads=8, word_dim=300, char_dim=50, attn_layer=2),
        loss=LossConfig(),
    )
    os.makedirs("configs/charades", exist_ok=True)
    base_path = "configs/charades/SeqPAN.yaml"
    base.save(base_path)

    from hual_tpu.cli import build_trainer
    from hual_tpu.orchestrate import run_rounds

    # --- round 0: train on the initial pseudo labels + infer the train set
    t0 = time.time()
    cfg0 = base.derive_round(0)
    trainer = build_trainer(cfg0)
    trainer.init_state()
    best0 = trainer.train()
    times["re0_train_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    trainer.restore()
    infer0 = trainer.infer_trainset(save_path="./results/charades/re0.pkl")
    times["re0_infer_s"] = round(time.time() - t0, 1)
    del trainer

    # --- rounds 1..N
    t0 = time.time()
    history = run_rounds("charades", rounds=a.rounds,
                         base_config_path=base_path)
    times["rounds_1_to_N_s"] = round(time.time() - t0, 1)
    times["total_loop_s"] = round(time.time() - t_all, 1)
    times["total_loop_min"] = round(times["total_loop_s"] / 60, 1)

    summary = {
        "times": times,
        "re0_best": {k: v for k, v in best0.items() if not k.endswith("_line")},
        "re0_infer": infer0,
        "rounds": [
            {"round": h["round"],
             "pseudo_miou": h["label_stats"]["new_miou"],
             "best_r1i7": h["best"].get("r1i7"),
             "test": h["best"].get("test_metrics")}
            for h in history
        ],
    }
    print(json.dumps(summary, indent=2, default=float))
    with open("full_loop_summary.json", "w") as f:
        json.dump(summary, f, indent=2, default=float)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
