#!/usr/bin/env python
"""Seed-variance attribution of the charades round-2 test-R1@0.7 dip.

The committed real-records charades trajectory dips at round 2
(39.03 -> 37.63 -> 41.75 test R1@0.7,
results/real_records_charades_summary.json) while every pseudo-label
diagnostic IMPROVES that round (annotated 0.621->0.667, n_improved 2333 vs
533 worsened, pseudo-mIoU 0.648).  The anet dip got an instrumented
attribution (negative-renewal under a weak model, docs/PARITY.md); this
tool gives the charades dip the same rigor by the direct experiment: rerun
the IDENTICAL loop (same records, same oracle synthesis seed, same AL
strategy seed) at K extra training seeds and compare the per-round spread
against the 1.4-pt move.  If the across-seed spread at fixed labels is of
the same order, the dip is training variance (each round retrains from
scratch; test R@1@0.7 on 3,720 samples has ~0.8-pt binomial sd alone),
not label damage.

    python tools/dip_variance.py [--seeds 777 20260820] [--n-train N]

Writes results/charades_dip_variance.json.  Each loop is ~21 min on the
v5e (full 12,403-record charades schedule).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "charades_dip_variance.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[777, 20260820],
                    help="extra train seeds (the committed trajectory is "
                         "seed 12345)")
    ap.add_argument("--n-train", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=3)
    a = ap.parse_args()

    from full_loop_demo import run_loop
    from real_records_loop import TASKS, build_charades, build_features, \
        build_glove

    cwd0 = os.getcwd()
    runs = []
    for seed in a.seeds:
        root = os.path.abspath(f"/tmp/dipvar_charades_{seed}")
        rng = np.random.default_rng(20260817)  # SAME datagen as the
        # committed run: only the train seed varies
        if not os.path.exists(os.path.join(root, "data", "charades_re0")):
            gt_train, re0_train, test = build_charades(root, rng, a.n_train)
            build_features(root, "charades", gt_train, test,
                           TASKS["charades"]["max_vlen"], rng)
            build_glove(root, gt_train + test, rng)
        t0 = time.time()
        os.chdir(cwd0)
        run_loop(root, "charades", epochs=a.epochs, rounds=a.rounds,
                 max_vlen=64, mc_droprate=0.5, feature_dtype="bfloat16",
                 train_kwargs={"seed": seed},
                 summary_name="dipvar_summary.json",
                 extra={"train_seed": seed})
        os.chdir(cwd0)
        with open(os.path.join(root, "dipvar_summary.json")) as f:
            s = json.load(f)
        runs.append({
            "train_seed": seed,
            "wall_min": round((time.time() - t0) / 60, 1),
            "re0_best_r1i7": s["re0_best"].get("r1i7"),
            "test_r1i7": [r["best_r1i7"] for r in s["rounds"]],
            "pseudo_miou": [r["pseudo_miou"] for r in s["rounds"]],
        })
        print(json.dumps(runs[-1]), flush=True)

    # fold in the committed seed-12345 trajectory for the spread analysis
    committed_path = os.path.join(REPO, "results",
                                  "real_records_charades_summary.json")
    with open(committed_path) as f:
        c = json.load(f)
    runs.insert(0, {
        "train_seed": 12345, "committed": True,
        "re0_best_r1i7": c["re0_best"].get("r1i7"),
        "test_r1i7": [r["best_r1i7"] for r in c["rounds"]],
        "pseudo_miou": [r["pseudo_miou"] for r in c["rounds"]],
    })

    per_round = list(zip(*[r["test_r1i7"] for r in runs]))
    spread = [round(max(v) - min(v), 2) for v in per_round]
    dipped = [[r["test_r1i7"][i + 1] < r["test_r1i7"][i]
               for i in range(len(r["test_r1i7"]) - 1)] for r in runs]
    out = {
        "workload": ("real-records charades loop (identical records/oracle/"
                     "strategy seeds; train seed varies), epochs="
                     f"{a.epochs} rounds={a.rounds} mc=0.5"),
        "runs": runs,
        "per_round_seed_spread_r1i7": spread,
        "round2_dip_per_seed": dipped,
        "note": ("committed dip = 1.40 pts (39.03->37.63); binomial sd of "
                 "R@1@0.7 at p~0.38 on 3,720 test samples is ~0.80 pts "
                 "per measurement"),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(f"wrote {OUT}: spread per round {spread}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
