#!/usr/bin/env python
"""The full HUAL loop over the REAL reference record lists (VERDICT r2 #4).

Round 2's full-scale loops used fully synthetic records; this driver uses the
real JSONs shipped in the reference mount — real durations, real sentences
(hence real tokenization/vocab/length statistics), real span distributions —
with synthetic features (the I3D/C3D feature archives and GloVe are external
downloads absent here, reference README.md:11-16).

What is real vs synthesized per task (.MISSING_LARGE_BLOBS strips one file
from each task):

  charades: REAL re0 train (12,403 pseudo spans, data/charades_re0/train.json)
            REAL test (3,720, data/charades_{re0,gt}/test.json)
            SYNTH oracle GT train: charades_gt/train.json is stripped from
            the mount; the oracle's GT span is synthesized by EXACTLY
            inverting the glance premise — re0 center = the glance, GT
            placed so the glance sits at a uniform relative position
            within it (build_charades) — so the oracle can contradict
            the initial label's center.
  anet:     REAL GT train (33,721, data/anet_gt/train.json) + test (17,031)
            SYNTH re0 pseudo spans: anet_re0/train.json is stripped; round-0
            spans are built with the reference's own glance recipe
            (scripts/viga_extend_label.py:1-26): glance t ~ U[gt_s, gt_e],
            span = [t - 0.2*dur, t + 0.2*dur] clipped.

Features carry a learnable signal tied to the REAL sentence (pattern index =
hash of the sentence) planted in the GT span, so pseudo-label mIoU and R@1
trajectories are meaningful, while all record-level statistics that drive
the data pipeline and AL geometry are the reference's own.

    python tools/real_records_loop.py --task charades --root /tmp/rr_charades
    python tools/real_records_loop.py --task anet --root /tmp/rr_anet
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TASKS = {
    "charades": dict(epochs=50, rounds=3, max_vlen=64),
    "anet": dict(epochs=100, rounds=4, max_vlen=100),
}
N_PATTERNS = 16


def _load(path):
    with open(path) as f:
        return json.load(f)


def _dump(data, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f)


def _four(records):
    """Processor reads record[:4] (reference utils/data_gen.py:22)."""
    return [r[:4] for r in records]


def _subsample(records: list, n: int | None, rng: np.random.Generator) -> list:
    """Seeded order-preserving subsample (diagnosis runs on a subset)."""
    if n is None or n >= len(records):
        return records
    keep = np.sort(rng.choice(len(records), size=n, replace=False))
    return [records[i] for i in keep]


def build_charades(root: str, rng: np.random.Generator,
                   n_train: int | None = None):
    re0_train = _subsample(
        _four(_load(f"{REFERENCE}/data/charades_re0/train.json")), n_train, rng)
    test = _four(_load(f"{REFERENCE}/data/charades_re0/test.json"))
    gt_test = _four(_load(f"{REFERENCE}/data/charades_gt/test.json"))
    # Synthetic oracle GT — the EXACT inverse of the glance-supervision
    # premise (the viga recipe samples the glance uniformly WITHIN GT,
    # scripts/viga_extend_label.py + anet_viga glances): treat the re0
    # center c as the glance and place GT = [c - u*w, c + (1-u)*w] with
    # u ~ U(0,1), w ~ U(0.2,0.6)*dur (same width range as the old recipe's
    # U(0.1,0.3)-per-side), clipped.  The glance stays inside GT, but GT's
    # center sits at a UNIFORM relative offset from c — so the simulated
    # expert CAN contradict the initial pseudo label's center (round-3
    # VERDICT weak #1: the old recipe pinned GT around c, making
    # "pseudo-mIoU improves every round" partly measure the construction).
    gt_train = []
    for vid, dur, (s, e), sent in re0_train:
        c = 0.5 * (s + e)
        w = rng.uniform(0.2, 0.6) * dur
        u = rng.uniform(0.0, 1.0)
        lo = float(np.clip(c - u * w, 0, dur))
        hi = float(np.clip(c + (1.0 - u) * w, 0, dur))
        if hi <= lo:
            lo, hi = max(0.0, hi - 0.05 * dur), min(dur, lo + 0.05 * dur)
        gt_train.append([vid, dur, [round(lo, 2), round(hi, 2)], sent])
    _dump(re0_train, f"{root}/data/charades_re0/train.json")
    _dump(test, f"{root}/data/charades_re0/test.json")
    _dump(gt_train, f"{root}/data/charades_gt/train.json")
    _dump(gt_test, f"{root}/data/charades_gt/test.json")
    return gt_train, re0_train, test


def build_anet(root: str, rng: np.random.Generator,
               n_train: int | None = None):
    gt_train = _subsample(
        _four(_load(f"{REFERENCE}/data/anet_gt/train.json")), n_train, rng)
    gt_test = _four(_load(f"{REFERENCE}/data/anet_gt/test.json"))
    # synthetic re0 via the reference's own glance->window recipe
    # (scripts/viga_extend_label.py): t ~ U[s,e], window +-0.2*duration
    re0_train = []
    for vid, dur, (s, e), sent in gt_train:
        t = rng.uniform(min(s, e), max(s, e)) if e > s else s
        lo = float(np.clip(t - 0.2 * dur, 0, dur))
        hi = float(np.clip(t + 0.2 * dur, 0, dur))
        re0_train.append([vid, dur, [round(lo, 2), round(hi, 2)], sent])
    _dump(re0_train, f"{root}/data/anet_re0/train.json")
    _dump(gt_test, f"{root}/data/anet_re0/test.json")
    _dump(gt_train, f"{root}/data/anet_gt/train.json")
    _dump(gt_test, f"{root}/data/anet_gt/test.json")
    return gt_train, re0_train, gt_test


def build_features(root: str, task: str, gt_train, test, max_vlen: int,
                   rng: np.random.Generator, vdim: int = 1024):
    """Synthetic .npy per unique video: noise + a sentence-keyed action
    pattern planted inside the GT span.  Raw length scales with the real
    duration (capped at 2*max_vlen so the mean-pool downsampler is
    exercised without writing tens of GB)."""
    feat_dir = os.path.join(root, "data", "features", f"{task}_i3d")
    os.makedirs(feat_dir, exist_ok=True)
    patterns = rng.normal(0.0, 1.0, size=(N_PATTERNS, vdim)).astype(np.float32)

    by_vid: dict[str, list] = {}
    for vid, dur, span, sent in gt_train + test:
        by_vid.setdefault(vid, []).append((float(dur), span, sent))

    shapes = {}
    for vid, items in by_vid.items():
        dur = items[0][0]
        raw_len = int(np.clip(round(dur * 1.5), 8, 2 * max_vlen))
        feat = rng.normal(0.0, 1.0, size=(raw_len, vdim)).astype(np.float32)
        for _, (s, e), sent in items:
            # zlib.crc32, NOT hash(): Python's str hash is salted per
            # process, which would make the planted signal — and therefore
            # every trajectory artifact — irreproducible across runs
            k = zlib.crc32(sent.strip().lower().encode()) % N_PATTERNS
            lo = int(np.clip(s / max(dur, 1e-6) * raw_len, 0, raw_len - 1))
            hi = max(lo + 1, int(np.ceil(e / max(dur, 1e-6) * raw_len)))
            feat[lo:min(hi, raw_len)] += 2.0 * patterns[k]
        np.save(os.path.join(feat_dir, f"{vid}.npy"), feat)
        shapes[vid] = raw_len
    with open(os.path.join(feat_dir, "feature_shapes.json"), "w") as f:
        json.dump(shapes, f)
    return len(by_vid)


def build_glove(root: str, records, rng: np.random.Generator):
    """Mini GloVe covering the REAL corpus vocabulary (tokenized exactly as
    the pipeline will tokenize it)."""
    from hual_tpu.data.tokenize import tokenize

    vocab = set()
    for _, _, _, sent in records:
        vocab.update(tokenize(sent.strip().lower()))
    glove_dir = os.path.join(root, "data", "glove")
    os.makedirs(glove_dir, exist_ok=True)
    path = os.path.join(glove_dir, "glove.840B.300d.txt")
    with open(path, "w", encoding="utf-8") as f:
        for w in sorted(vocab):
            vec = rng.normal(0, 0.5, size=300)
            f.write(w + " " + " ".join(f"{x:.4f}" for x in vec) + "\n")
    return len(vocab)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="charades", choices=list(TASKS))
    ap.add_argument("--root", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument("--mc-droprate", type=float, default=0.5,
                    help="true-MC uncertainty by default — the real-records "
                         "loop is quality evidence, not a parity replay")
    ap.add_argument("--n-train", type=int, default=None,
                    help="seeded subsample of the train records "
                         "(diagnosis runs, e.g. the anet 10k subset)")
    ap.add_argument("--feature-dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"])
    a = ap.parse_args()
    d = TASKS[a.task]
    # the default root encodes the subset size so an --n-train run can never
    # silently reuse a full-size dataset staged by an earlier run (the
    # summary artifact would be mislabeled)
    sub = f"_{a.n_train}" if a.n_train else ""
    root = a.root or f"/tmp/real_records_{a.task}{sub}"
    epochs = a.epochs or d["epochs"]
    rounds = a.rounds or d["rounds"]

    times = {}
    t0 = time.time()
    rng = np.random.default_rng(20260817)
    meta_path = os.path.join(root, "data", "datagen_meta.json")
    if not os.path.exists(os.path.join(root, "data", f"{a.task}_re0")):
        if a.task == "charades":
            gt_train, re0_train, test = build_charades(root, rng, a.n_train)
        else:
            gt_train, re0_train, test = build_anet(root, rng, a.n_train)
        n_videos = build_features(root, a.task, gt_train, test,
                                  d["max_vlen"], rng)
        n_vocab = build_glove(root, gt_train + test, rng)
        _dump({"task": a.task, "n_train": a.n_train}, meta_path)
        print(json.dumps({"task": a.task, "n_train": len(gt_train),
                          "n_test": len(test), "n_videos": n_videos,
                          "n_vocab": n_vocab}), flush=True)
    else:
        meta = _load(meta_path) if os.path.exists(meta_path) else {}
        if meta.get("task") != a.task or meta.get("n_train") != a.n_train:
            raise SystemExit(
                f"--root {root} holds a dataset built with "
                f"{meta or 'an unknown configuration'}, not "
                f"task={a.task!r}/n_train={a.n_train!r}; pass a fresh --root")
    times["datagen_s"] = round(time.time() - t0, 1)

    from full_loop_demo import run_loop

    extra = {
        "records": "REAL reference JSONs (durations, sentences, spans)",
        "synthesized": ("charades_gt/train.json (oracle GT via the exact "
                        "glance-inverse: re0 center at a uniform relative "
                        "position within GT; stripped from mount)"
                        if a.task == "charades"
                        else "anet_re0/train.json (glance->window recipe, "
                             "scripts/viga_extend_label.py; stripped from "
                             "mount)"),
        "features": "synthetic, sentence-keyed signal planted in GT spans",
    }
    if a.n_train:
        extra["n_train_subset"] = a.n_train
    rc = run_loop(root, a.task, epochs=epochs, rounds=rounds,
                  max_vlen=d["max_vlen"], mc_droprate=a.mc_droprate,
                  feature_dtype=a.feature_dtype, times=times,
                  summary_name="real_records_summary.json", extra=extra)
    # copy the summary into the repo's results/
    src = os.path.join(root, "real_records_summary.json")
    if os.path.exists(src):
        dst = os.path.join(REPO, "results",
                           f"real_records_{a.task}{sub}_summary.json")
        with open(src) as f, open(dst, "w") as g:
            g.write(f.read())
        print(f"copied summary -> {dst}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
