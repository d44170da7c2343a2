"""Video feature store (reference utils/data_utils.py:56-85).

Loads pre-extracted per-clip visual features (.npy per video) into RAM and
mean-pools videos longer than ``max_vlen`` down to exactly ``max_vlen`` clips
using the reference's bucket boundaries.  The pooling here is vectorized with
np.add.reduceat instead of a per-bucket Python loop.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def visual_feature_sampling(feature: np.ndarray, max_num_clips: int) -> np.ndarray:
    """Mean-pool (num_clips, D) down to (max_num_clips, D) when too long.

    Bucket boundaries match reference utils/data_utils.py:70-85:
    idxs = round(arange(0..max+1)/max*num_clips), clipped to num_clips-1;
    bucket i = mean(feature[idxs[i]:idxs[i+1]]) or feature[idxs[i]] if empty.
    """
    num_clips = feature.shape[0]
    if num_clips <= max_num_clips:
        return feature
    idxs = np.arange(0, max_num_clips + 1, 1.0) / max_num_clips * num_clips
    idxs = np.round(idxs).astype(np.int32)
    idxs[idxs > num_clips - 1] = num_clips - 1
    starts, ends = idxs[:-1], idxs[1:]
    # exact bucket means via prefix sums; note the boundary clip above makes
    # the last bucket end at num_clips-1 (final row excluded), as in reference
    counts = (ends - starts).astype(np.float64)
    csum = np.concatenate([np.zeros((1, feature.shape[1]), dtype=np.float64),
                           np.cumsum(feature, axis=0, dtype=np.float64)], axis=0)
    sums = csum[ends] - csum[starts]
    out = sums / np.maximum(counts, 1.0)[:, None]
    empty = counts < 1.0
    if np.any(empty):
        out[empty] = feature[starts[empty]]
    return out.astype(feature.dtype)


def load_video_features(root: str, max_position_length: int | None
                        ) -> dict[str, np.ndarray]:
    """Load all <root>/*.npy into a dict vid -> (T<=max, D) float array."""
    video_features: dict[str, np.ndarray] = {}
    for filename in sorted(glob.glob(os.path.join(root, "*.npy"))):
        video_id = os.path.basename(filename).rsplit(".", 1)[0]
        feature = np.load(filename)
        if max_position_length is not None:
            feature = visual_feature_sampling(feature, max_num_clips=max_position_length)
        video_features[video_id] = np.asarray(feature, dtype=np.float32)
    return video_features


def quantize_features(packed: np.ndarray,
                      chunk_rows: int = 4096) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-clip int8 quantization of a packed (N, T, D) table.

    ``scale[n, t] = amax(|packed[n, t, :]|) / 127`` (1.0 for all-zero clips
    so padding rows dequantize to exact zeros); dequantize on gather as
    ``q.astype(f32) * scale[..., None]`` (runtime/steps.gather_batch).
    Per-element error is bounded by scale/2, i.e. ~0.4% of the clip's
    amax.  Purpose: quarter both the per-chip HBM footprint and the
    host->device upload bytes of the device-resident table vs float32 —
    the upload is the measured warm-loop floor through this environment's
    ~12 MiB/s tunnel (docs/PROFILING.md §5b), and HBM is what forces
    host-streaming for >16 GB tables.  Chunked over rows to bound the f32
    temporaries on multi-GB tables.
    """
    n = packed.shape[0]
    q = np.empty(packed.shape, dtype=np.int8)
    scales = np.empty(packed.shape[:2], dtype=np.float32)
    for lo in range(0, n, chunk_rows):
        x = packed[lo:lo + chunk_rows].astype(np.float32, copy=False)
        amax = np.abs(x).max(axis=-1)
        s = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q[lo:lo + chunk_rows] = np.clip(np.rint(x / s[..., None]),
                                        -127, 127).astype(np.int8)
        scales[lo:lo + chunk_rows] = s
    return q, scales


class FeatureStore:
    """RAM-resident feature dict plus a packed matrix view for fast batching.

    ``pack()`` builds one contiguous (num_videos, max_vlen, D) zero-padded
    array + vid->row index so batch assembly is a single fancy-index gather
    (the reference re-pads python lists per batch, utils/data_utils.py:152-172).
    """

    def __init__(self, features: dict[str, np.ndarray], max_vlen: int):
        self.max_vlen = max_vlen
        self.vid_index: dict[str, int] = {}
        vids = list(features)
        dim = features[vids[0]].shape[1] if vids else 0
        self.packed = np.zeros((len(vids), max_vlen, dim), dtype=np.float32)
        self.lengths = np.zeros((len(vids),), dtype=np.int32)
        for i, vid in enumerate(vids):
            feat = features[vid]
            n = min(feat.shape[0], max_vlen)
            self.packed[i, :n] = feat[:n]
            self.lengths[i] = n
            self.vid_index[vid] = i

    @classmethod
    def from_dir(cls, root: str, max_vlen: int,
                 use_native: bool = True) -> "FeatureStore":
        """Build the packed store straight from a feature directory.

        Fast path: the multithreaded C++ loader (hual_tpu/native) parses,
        downsamples and packs all .npy files directly into the (N, max_vlen,
        D) block; any file it can't handle (and everything, if the toolchain
        is missing) falls back to the NumPy path.
        """
        filenames = sorted(glob.glob(os.path.join(root, "*.npy")))
        if use_native and filenames:
            try:
                from hual_tpu import native
                first = np.load(filenames[0], mmap_mode="r")
                vdim = int(first.shape[1])
                del first
                res = native.load_npy_batch(filenames, max_vlen, vdim)
            except Exception:
                res = None
            if res is not None:
                packed, lengths, statuses = res
                store = cls.__new__(cls)
                store.max_vlen = max_vlen
                store.packed = packed
                store.lengths = lengths.astype(np.int32)
                store.vid_index = {}
                for i, fn in enumerate(filenames):
                    vid = os.path.basename(fn).rsplit(".", 1)[0]
                    store.vid_index[vid] = i
                    if statuses[i] != 0:  # numpy fallback for odd formats
                        feat = visual_feature_sampling(np.load(fn), max_vlen)
                        n = min(feat.shape[0], max_vlen)
                        store.packed[i, :n] = feat[:n]
                        store.packed[i, n:] = 0
                        store.lengths[i] = n
                return store
        return cls(load_video_features(root, max_vlen), max_vlen)

    def rows(self, vids: list[str]) -> np.ndarray:
        return np.asarray([self.vid_index[v] for v in vids], dtype=np.int32)

    def gather(self, rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return self.packed[rows], self.lengths[rows]
