"""Debug visualization (reference plot_se_label, utils/runner_utils.py:40-50).

Gated on matplotlib availability; saves one plot per sample showing the soft
start/end label curves and the 4-class match labels.
"""

from __future__ import annotations

import os

import numpy as np


def plot_se_label(s_labels: np.ndarray, e_labels: np.ndarray,
                  match_labels: np.ndarray, out_dir: str = "./imgs/debug"
                  ) -> list[str]:
    try:
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
    except ImportError:
        return []
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(s_labels.shape[0]):
        plt.plot(s_labels[i], label="start")
        plt.plot(e_labels[i], label="end")
        plt.scatter(np.arange(match_labels.shape[1]), match_labels[i],
                    s=8, c="k", label="match")
        plt.legend()
        path = os.path.join(out_dir, f"{i}.jpg")
        plt.savefig(path)
        plt.cla()
        paths.append(path)
    return paths
