"""Tests for the small standalone utilities: the glance-extension script
(reference scripts/viga_extend_label.py) and the debug label plotter
(reference utils/runner_utils.py:40-50)."""

import json
import os
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))


def _glance_data():
    return {
        "vidA": {
            "duration": 20.0,
            "timestamps": [[2.0, 6.0], [10.0, 18.0]],
            "sentences": ["first moment", "second moment"],
            "glance": [4.0, 14.0],
        },
        "vidB": {
            "duration": 10.0,
            "timestamps": [[0.0, 3.0]],
            "sentences": ["edge moment"],
            "glance": [0.5],
        },
    }


def test_extend_glances_math():
    from viga_extend_label import extend_glances

    recs, miou = extend_glances(_glance_data(), factor=0.4)
    assert len(recs) == 3
    # vidA glance 4.0, width 20*0.4=8 -> [0, 8]
    vid, dur, (s, e), sent = recs[0]
    assert (vid, dur, sent) == ("vidA", 20.0, "first moment")
    assert (s, e) == (0.0, 8.0)
    # vidB glance 0.5 clips at 0 -> [0, 2.5]
    _, _, (s2, e2), _ = recs[2]
    assert (s2, e2) == (0.0, 2.5)
    # mIoU matches hand math: IoU([0,8],[2,6])=0.5,
    # IoU([10,18]±4 -> [10,18])=1.0, IoU([0,2.5],[0,3])=2.5/3
    assert np.isclose(miou, np.mean([0.5, 1.0, 2.5 / 3]))


def test_extend_glances_cli(tmp_path):
    src = tmp_path / "train_old.json"
    dst = tmp_path / "train.json"
    src.write_text(json.dumps(_glance_data()))
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "viga_extend_label.py"),
         str(src), str(dst), "--factor", "0.4"],
        capture_output=True, text=True, cwd=_REPO,
    )
    assert out.returncode == 0, out.stderr
    recs = json.loads(dst.read_text())
    assert len(recs) == 3 and recs[0][0] == "vidA"


def test_plot_se_label(tmp_path):
    from hual_tpu.runtime.debug import plot_se_label

    T = 16
    s = np.exp(-0.5 * ((np.arange(T) - 4) / 2.0) ** 2)[None]
    e = np.exp(-0.5 * ((np.arange(T) - 9) / 2.0) ** 2)[None]
    match = np.zeros((1, T), np.int32)
    match[0, 4:10] = 2
    paths = plot_se_label(s, e, match, out_dir=str(tmp_path / "imgs"))
    if paths:  # matplotlib present
        assert all(os.path.exists(p) and os.path.getsize(p) > 0
                   for p in paths)
