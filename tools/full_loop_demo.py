#!/usr/bin/env python
"""The full HUAL loop at exact reference scale on synthetic data.

Reproduces the reference's complete workflow end-to-end (reference
run_charades.py / run_anet.py: re0 train + infer, then rounds of
update-labels -> train -> infer) at the real dataset scale with synthetic
features, and reports per-stage wall times — the direct measurement of the
"full Charades loop < 1 h" target.

    python tools/full_loop_demo.py --root /tmp/fullscale            # charades
    python tools/full_loop_demo.py --task anet --root /tmp/anetscale
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

# reference scales: dataset sizes counted from data/*_gt (SURVEY.md §6),
# train budgets from configs/{charades,anet}/SeqPAN.yaml:11-18, round counts
# from run_charades.py:9 / run_anet.py:9.  ActivityNet Captions averages
# several moments per video, hence queries_per_video=3.
TASK_DEFAULTS = {
    "charades": dict(n_train=12403, n_test=3720, epochs=50, rounds=3,
                     max_vlen=64, queries_per_video=1),
    "anet": dict(n_train=33721, n_test=17031, epochs=100, rounds=4,
                 max_vlen=100, queries_per_video=3),
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/hual_fullscale")
    p.add_argument("--task", default="charades", choices=list(TASK_DEFAULTS))
    p.add_argument("--n-train", type=int, default=None)
    p.add_argument("--n-test", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--rounds", type=int, default=None)
    p.add_argument("--mc-droprate", type=float, default=0.0,
                   help="MC-dropout rate of the inference passes (0.0 = "
                        "reference-shipped behavior; 0.5 = the paper's "
                        "intended true-MC uncertainty)")
    p.add_argument("--feature-dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="storage dtype of the device-resident feature table")
    p.add_argument("--point-strategy", default="uncertainty",
                   choices=["uncertainty", "random", "dichotomy"],
                   help="observation-point strategy (the paper's ablation)")
    p.add_argument("--selection", default="half", choices=["half", "all"],
                   help="per-round annotation budget")
    a = p.parse_args()
    d = TASK_DEFAULTS[a.task]
    n_train = a.n_train if a.n_train is not None else d["n_train"]
    n_test = a.n_test if a.n_test is not None else d["n_test"]
    epochs = a.epochs if a.epochs is not None else d["epochs"]
    rounds = a.rounds if a.rounds is not None else d["rounds"]

    times = {}

    t0 = time.time()
    if not os.path.exists(os.path.join(a.root, "data", f"{a.task}_re0")):
        make_dataset(a.root, task=a.task, n_train=n_train, n_test=n_test,
                     vdim=1024, max_raw_len=2 * d["max_vlen"], seed=7,
                     queries_per_video=d["queries_per_video"])
    times["datagen_s"] = round(time.time() - t0, 1)

    return run_loop(a.root, a.task, epochs=epochs, rounds=rounds,
                    max_vlen=d["max_vlen"], mc_droprate=a.mc_droprate,
                    feature_dtype=a.feature_dtype, times=times,
                    point_strategy=a.point_strategy, selection=a.selection)


def run_loop(root: str, task: str, epochs: int, rounds: int, max_vlen: int,
             mc_droprate: float = 0.0, feature_dtype: str = "float32",
             times: dict | None = None,
             summary_name: str = "full_loop_summary.json",
             extra: dict | None = None,
             model_kwargs: dict | None = None,
             train_kwargs: dict | None = None,
             point_strategy: str = "uncertainty",
             selection: str = "half",
             strategy_seed: int = 12345) -> int:
    """Run the complete HUAL loop (re0 train+infer, then `rounds` rounds of
    update -> train -> infer) over the dataset laid out under <root>/data.
    Reused by full-scale synthetic (main), real-records
    (tools/real_records_loop.py), real-assets parity
    (tools/real_assets_parity.py) and strategy-ablation
    (tools/strategy_ablation_loop.py) runs.  ``model_kwargs``/
    ``train_kwargs`` override individual ModelConfig/TrainConfig fields (the
    parity kit's dry-run shrinks the model with them);
    ``point_strategy``/``selection`` are the paper's ablation axes
    (orchestrate.run_rounds)."""
    times = {} if times is None else times
    t_all = time.time()
    os.chdir(root)
    from hual_tpu.config import (Config, LossConfig, ModelConfig, PathsConfig,
                                 TrainConfig)

    train_cfg = dict(epochs=epochs, batch_size=16, lr=1e-4, droprate=0.2,
                     clip_norm=1.0, mc_droprate=mc_droprate)
    train_cfg.update(train_kwargs or {})
    model_cfg = dict(max_vlen=max_vlen, max_tlen=30, vdim=1024, dim=128,
                     num_heads=8, word_dim=300, char_dim=50, attn_layer=2,
                     feature_dtype=feature_dtype)
    model_cfg.update(model_kwargs or {})
    base = Config(
        task=task,
        paths=PathsConfig(
            ckpt_dir="./ckpt", cache_dir="./data_pkl/",
            feature_path=f"./data/features/{task}_i3d",
            glove_path="./data/glove/glove.840B.300d.txt",
            train_path=f"./data/{task}_gt/train.json",
            test_path=f"./data/{task}_gt/test.json",
        ),
        train=TrainConfig(**train_cfg),
        model=ModelConfig(**model_cfg),
        loss=LossConfig(),
    )
    os.makedirs(f"configs/{task}", exist_ok=True)
    base_path = f"configs/{task}/SeqPAN.yaml"
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
    infer0 = trainer.infer_trainset(
        save_path=f"./results/{task}/re0.pkl")
    times["re0_infer_s"] = round(time.time() - t0, 1)
    warm = {"features": trainer.features,
            "device_features": trainer.export_device_features(),
            "dataset": trainer.dataset}
    del trainer

    # --- rounds 1..N (reuse round 0's feature table + tokenized corpus)
    t0 = time.time()
    history = run_rounds(task, rounds=rounds, base_config_path=base_path,
                         warm_start=warm, point_strategy=point_strategy,
                         selection=selection, strategy_seed=strategy_seed)
    times["rounds_1_to_N_s"] = round(time.time() - t0, 1)
    times["total_loop_s"] = round(time.time() - t_all, 1)
    times["total_loop_min"] = round(times["total_loop_s"] / 60, 1)

    summary = {
        "task": task,
        "point_strategy": point_strategy,
        "selection": selection,
        "times": times,
        "re0_best": {k: v for k, v in best0.items() if not k.endswith("_line")},
        "re0_infer": infer0,
        "rounds": [
            {"round": h["round"],
             "pseudo_miou": h["label_stats"]["new_miou"],
             "best_r1i7": h["best"].get("r1i7"),
             "test": h["best"].get("test_metrics"),
             # AL-selection diagnostics (engine.renew_dataset/update_labels):
             # annotated-vs-untouched mIoU split, renewal before/after,
             # pos/neg answers, overlap with the previous round's selection
             "diagnostics": {k: h["label_stats"][k]
                             for k in ("n_selected", "n_pos", "n_neg",
                                       "new_miou_annotated",
                                       "new_miou_untouched",
                                       "miou_selected_before",
                                       "miou_selected_after",
                                       "miou_pos_idx", "miou_neg_idx",
                                       "miou_pos_idx_before",
                                       "miou_neg_idx_before",
                                       "n_improved", "n_worsened",
                                       "selection_overlap_prev")
                             if k in h["label_stats"]}}
            for h in history
        ],
    }
    if extra:
        summary.update(extra)
    print(json.dumps(summary, indent=2, default=float))
    with open(summary_name, "w") as f:
        json.dump(summary, f, indent=2, default=float)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
