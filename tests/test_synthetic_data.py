"""Pins the synthetic datagen recipe (tools/make_synthetic_data.py).

Every committed loop artifact (results/strategy_ablation_loops*.json,
charades10_*_summary.json, ...) cites trajectories on datasets produced by
this generator with a fixed seed; the artifacts stay reproducible only while
the recipe's RNG draw order is frozen.  These crc32 pins freeze it for both
the default and the ``hard`` mode (the hard knob gates every NEW draw, so
default-mode datasets are bit-identical to before the knob existed —
make_dataset docstring).  numpy-only: no JAX, runs in milliseconds.
"""

import json
import os
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from make_synthetic_data import make_dataset  # noqa: E402

ARGS = dict(task="charades", n_train=16, n_test=8, vdim=32,
            max_raw_len=24, seed=7)
# crc32 of v00000.npy's bytes and of json.dumps(train records), measured
# 2026-08-21; a change here means committed artifacts no longer reproduce.
PINS = {False: (1574815108, 1268072814), True: (453631491, 1906672572)}


def _gen(tmp_path, hard):
    root = str(tmp_path / f"synth_{hard}")
    make_dataset(root, hard=hard, **ARGS)
    return root


def _crcs(root):
    feat = np.load(os.path.join(root, "data/features/charades_i3d/v00000.npy"))
    train = json.load(open(os.path.join(root, "data/charades_gt/train.json")))
    return (zlib.crc32(feat.tobytes()),
            zlib.crc32(json.dumps(train).encode()))


@pytest.mark.parametrize("hard", [False, True])
def test_recipe_pinned(tmp_path, hard):
    assert _crcs(_gen(tmp_path, hard)) == PINS[hard]


def test_hard_differs_and_varies(tmp_path):
    """hard mode changes the data AND spreads per-video difficulty: the
    per-video feature std range must be wider than the default's (sigma is
    drawn from U[0.7, 2.0] instead of fixed at 1.0)."""
    roots = {h: _gen(tmp_path, h) for h in (False, True)}
    assert _crcs(roots[False]) != _crcs(roots[True])
    spreads = {}
    for h, root in roots.items():
        d = os.path.join(root, "data/features/charades_i3d")
        stds = [float(np.load(os.path.join(d, f)).std())
                for f in sorted(os.listdir(d)) if f.endswith(".npy")]
        spreads[h] = max(stds) - min(stds)
    assert spreads[True] > 1.5 * spreads[False]


def test_records_well_formed(tmp_path):
    """gt/re0 spans stay inside [0, duration] in hard mode too (the reference
    record schema: [vid, duration, [s, e], sentence])."""
    root = _gen(tmp_path, True)
    for sub in ("charades_gt/train.json", "charades_re0/train.json"):
        for vid, dur, (s, e), sent in json.load(
                open(os.path.join(root, "data", sub))):
            assert 0.0 <= s < e <= dur + 1e-6, (sub, vid, s, e, dur)
            assert sent.strip()
