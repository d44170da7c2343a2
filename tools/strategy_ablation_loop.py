#!/usr/bin/env python
"""Measured end-to-end ablation of the paper's annotation axes.

The reference ships the OUTPUT of its strategy ablation
(/root/reference/data/ablation/charades_{random,dichotomy}_re1..4/) but not
the code or the quality numbers.  Our re-implementation is golden-replayed
against that shipped data record-for-record (tests/test_ablation_replay.py);
this tool closes the remaining gap: it RUNS the full HUAL loop once per
(point_strategy, selection) variant on one shared synthetic dataset and
records the quality trajectories side by side, demonstrating the ablation
axes end-to-end on the real chip (orchestrate.run_rounds wiring, not just
library calls).

    python tools/strategy_ablation_loop.py --root /tmp/hual_strategy_abl

Variants (axes from reference update_label.py:185,197 + the shipped
ablation data's all-samples budget):
  * uncertainty/half  — the HUAL method (production default)
  * random/half       — ablation: random frame, same budget
  * dichotomy/half    — ablation: midpoint of largest unannotated segment
  * uncertainty/all   — the shipped ablation data's budget (every record
                        annotated every round)

Each variant gets its own workspace seeded with an IDENTICAL dataset
(same generator seed), so trajectories differ only by strategy.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from full_loop_demo import run_loop  # noqa: E402
from make_synthetic_data import make_dataset  # noqa: E402

VARIANTS = [
    ("uncertainty", "half"),
    ("random", "half"),
    ("dichotomy", "half"),
    ("uncertainty", "all"),
]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/hual_strategy_abl")
    p.add_argument("--n-train", type=int, default=2000)
    p.add_argument("--n-test", type=int, default=600)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--vdim", type=int, default=256,
                   help="synthetic feature dim (smaller than parity's 1024: "
                        "this ablation compares AL dynamics, not kernels)")
    p.add_argument("--mc-droprate", type=float, default=0.0,
                   help="MC-dropout rate of the inference passes.  At the "
                        "shipped default 0.0 the model-uncertainty term is "
                        "identically zero and uncertainty placement "
                        "degenerates to the dichotomy midpoint "
                        "(docs/PARITY.md); a nonzero rate runs the true-MC "
                        "path where the strategies separate")
    p.add_argument("--hard", action="store_true",
                   help="hard-signal dataset (distractor moments, per-video "
                        "noise, weaker amplitudes — make_synthetic_data "
                        "--hard): gives the acquisition term real per-sample "
                        "difficulty variation to exploit (VERDICT r4 #2)")
    p.add_argument("--seed", type=int, default=7,
                   help="dataset generator seed (non-default seeds get a "
                        "_s<seed> artifact suffix — for replicating a "
                        "finding on an independent dataset draw)")
    p.add_argument("--out", default=None,
                   help="combined summary path (default: "
                        "<repo>/results/strategy_ablation_loops.json)")
    a = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    default_name = ("strategy_ablation_loops.json" if a.mc_droprate == 0.0
                    else f"strategy_ablation_loops_mc"
                         f"{str(a.mc_droprate).replace('.', '')}.json")
    if a.hard:
        default_name = default_name.replace(".json", "_hard.json")
    if a.seed != 7:
        default_name = default_name.replace(".json", f"_s{a.seed}.json")
    out_path = a.out or os.path.join(repo, "results", default_name)
    cwd0 = os.getcwd()

    combined = {
        "workload": (f"charades-style synthetic loop, n_train={a.n_train} "
                     f"n_test={a.n_test} epochs={a.epochs} rounds={a.rounds} "
                     f"vdim={a.vdim} max_vlen=64, "
                     f"mc_droprate={a.mc_droprate}, hard={a.hard}, "
                     f"identical dataset per variant (seed {a.seed})"),
        "variants": [],
    }
    t_all = time.time()
    for strategy, selection in VARIANTS:
        name = f"{strategy}_{selection}"
        root = os.path.abspath(os.path.join(a.root, name))
        if os.path.exists(root):
            shutil.rmtree(root)
        make_dataset(root, task="charades", n_train=a.n_train,
                     n_test=a.n_test, vdim=a.vdim, max_raw_len=128,
                     seed=a.seed, hard=a.hard)
        t0 = time.time()
        os.chdir(cwd0)
        summary_path = os.path.join(root, "full_loop_summary.json")
        rc = run_loop(root, "charades", epochs=a.epochs, rounds=a.rounds,
                      max_vlen=64, mc_droprate=a.mc_droprate,
                      model_kwargs={"vdim": a.vdim},
                      point_strategy=strategy, selection=selection,
                      summary_name=summary_path)
        if rc != 0:
            raise RuntimeError(f"variant {name} failed (rc={rc})")
        with open(summary_path) as f:
            s = json.load(f)
        combined["variants"].append({
            "point_strategy": strategy,
            "selection": selection,
            "wall_s": round(time.time() - t0, 1),
            "re0_best_r1i7": s["re0_best"].get("r1i7"),
            "pseudo_miou": [r["pseudo_miou"] for r in s["rounds"]],
            "test_r1i7": [r["best_r1i7"] for r in s["rounds"]],
            "n_pos": [r["diagnostics"].get("n_pos") for r in s["rounds"]],
            "n_neg": [r["diagnostics"].get("n_neg") for r in s["rounds"]],
            "n_selected": [r["diagnostics"].get("n_selected")
                           for r in s["rounds"]],
        })
        os.chdir(cwd0)
        print(f"[{name}] done in {combined['variants'][-1]['wall_s']}s: "
              f"pseudo_miou={combined['variants'][-1]['pseudo_miou']}")
    combined["total_wall_min"] = round((time.time() - t_all) / 60, 1)

    os.chdir(cwd0)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(combined, f, indent=2, default=float)
    print(json.dumps(combined, indent=2, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
