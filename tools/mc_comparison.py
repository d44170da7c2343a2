#!/usr/bin/env python
"""Demonstrate the true-MC path at loop scale (VERDICT.md next-round #5).

Runs the SAME synthetic Charades loop twice — `mc_droprate 0.0` (the
reference's shipped degenerate behavior: model uncertainty ≡ 0, annotated
half = first ⌈N/2⌉ in dataset order) and `mc_droprate 0.5` (the paper's
intended MC-dropout) — then reports:

  * per-video uncertainty statistics of each run's round-0 pickle,
  * the overlap and order agreement of the annotated halves,
  * pseudo-label mIoU and test R1@0.7 trajectories side by side.

Writes results/mc_comparison.json (relative to the repo root).

    python tools/mc_comparison.py --root /tmp/mccmp --n-train 2000 \
        --n-test 500 --epochs 15 --rounds 3
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "mc_comparison.json")


def run_loop(root: str, mc: float, args) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "tools", "full_loop_demo.py"),
           "--root", root, "--task", "charades",
           "--n-train", str(args.n_train), "--n-test", str(args.n_test),
           "--epochs", str(args.epochs), "--rounds", str(args.rounds),
           "--mc-droprate", str(mc)]
    subprocess.run(cmd, check=True)
    with open(os.path.join(root, "full_loop_summary.json")) as f:
        return json.load(f)


def selection_order(root: str) -> tuple[list[int], np.ndarray]:
    """Annotated-half indices (in selection order) + per-video uncertainty
    from the round-0 pickle, reproducing the engine's ranking."""
    sys.path.insert(0, REPO)
    from hual_tpu.active.coefficients import F_RENEW, get_coff
    from hual_tpu.active.engine import rank_uncertainty
    from hual_tpu.utils.io import load_json, load_pickle

    data_old = load_json(os.path.join(root, "data/charades_re0/train.json"))
    data_gt = load_json(os.path.join(root, "data/charades_gt/train.json"))
    prop = load_pickle(os.path.join(root, "results/charades/re0.pkl"))
    for rec in data_old:
        if len(rec) == 4:
            rec.append({"pos_idx": [], "neg_idx": []})
    ranking = rank_uncertainty(data_old, data_gt, prop,
                               get_coff(F_RENEW, "charades", 1))
    n_sel = int(np.ceil(len(ranking) / 2))
    order = [r["idx"] for r in ranking[:n_sel]]
    uv = np.asarray([r["uncert_video"] for r in ranking])
    return order, uv


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/mccmp")
    ap.add_argument("--n-train", type=int, default=2000)
    ap.add_argument("--n-test", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    summaries, orders, uncerts = {}, {}, {}
    for mc in (0.0, 0.5):
        root = os.path.join(args.root, f"mc{str(mc).replace('.', '')}")
        summaries[mc] = run_loop(root, mc, args)
        orders[mc], uncerts[mc] = selection_order(root)

    o0, o5 = orders[0.0], orders[0.5]
    overlap = len(set(o0) & set(o5)) / len(o0)
    res = {
        "config": vars(args),
        "uncert_video_mc0": {"max": float(uncerts[0.0].max()),
                             "nonzero_frac": float((uncerts[0.0] > 0).mean())},
        "uncert_video_mc5": {
            "min": float(uncerts[0.5].min()),
            "max": float(uncerts[0.5].max()),
            "mean": float(uncerts[0.5].mean()),
            "nonzero_frac": float((uncerts[0.5] > 0).mean()),
            "n_distinct": int(len(np.unique(np.round(uncerts[0.5], 6)))),
        },
        "selection": {
            "mc0_is_dataset_order": o0 == sorted(o0),
            "mc5_is_dataset_order": o5 == sorted(o5),
            "set_overlap_frac": overlap,
            "order_identical": o0 == o5,
        },
        "trajectories": {
            str(mc): {
                "re0_best_r1i7": summaries[mc]["re0_best"].get("r1i7"),
                "pseudo_miou": [r["pseudo_miou"]
                                for r in summaries[mc]["rounds"]],
                "r1i7": [r["best_r1i7"] for r in summaries[mc]["rounds"]],
                "total_loop_min": summaries[mc]["times"]["total_loop_min"],
            } for mc in (0.0, 0.5)
        },
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
