#!/usr/bin/env python
"""Per-round performance summary (reference scripts/summary_performance.py,
which greps TF checkpoint pointers + eval logs of a stale layout).

Here rounds write structured history (results/<task>/rounds_summary.json via
hual_tpu.orchestrate, plus metrics .jsonl logs); this prints the table:
pseudo-label mIoU and test R@1@{0.3,0.5,0.7} / mIoU per round.

    python scripts/summary_performance.py charades
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("task", nargs="?", default="charades")
    ap.add_argument("--results-root", default="results",
                    help="results directory (default ./results)")
    a = ap.parse_args()
    task = a.task
    path = os.path.join(a.results_root, task, "rounds_summary.json")
    if not os.path.exists(path):
        print(f"no summary at {path}; run the orchestrator first", file=sys.stderr)
        return 1
    with open(path) as f:
        history = json.load(f)
    print(f"{'round':>6} {'pseudo_mIoU':>12} {'R1@0.3':>8} {'R1@0.5':>8} "
          f"{'R1@0.7':>8} {'mIoU':>8}")
    for h in history:
        stats, best = h["label_stats"], h.get("best", {})
        test = best.get("test_metrics", {})
        print(f"re{h['round']:<4} {stats['new_miou']:>12.4f} "
              f"{test.get('r1i3', float('nan')):>8.2f} "
              f"{test.get('r1i5', float('nan')):>8.2f} "
              f"{test.get('r1i7', float('nan')):>8.2f} "
              f"{test.get('miou', float('nan')):>8.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
