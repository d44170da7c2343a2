"""Device mesh and sharding layout.

The reference is strictly single-GPU (SURVEY.md §2/§5); the TPU-native
scaling story is SPMD data parallelism over ICI: batches sharded on a
``data`` mesh axis, parameters/optimizer state replicated, XLA inserting the
gradient all-reduce.  This fits the workload: the AL bottleneck is full
train-set MC-dropout inference (33k samples x 3 passes on ActivityNet),
which is embarrassingly batch-parallel.

The mesh also carries a ``model`` axis (size 1 by default) reserved for
tensor-parallel sharding of the attention heads / FFN dims at larger model
scales; `make_mesh(model_parallel=k)` lays devices out (data, model).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis; trailing axes replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def scan_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(n_batches, B, ...) stacks for scanned epochs/sweeps: the scan axis
    stays whole, each per-step batch axis is split over `data`."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def feature_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard a (num_videos, T, D) feature table across EVERY mesh device
    (both axes).  The big per-chip HBM win: ActivityNet's table is ~13.8 GB
    f32 — replicated it caps the design at one chip's memory, sharded it
    scales with the mesh.  Row count must be padded to a multiple of
    mesh.size (pad_rows)."""
    return NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))


def vocab_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard the frozen GloVe matrix over the `model` axis."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def pad_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Zero-pad axis 0 to a multiple of `multiple` (sharding divisibility).
    Padding rows are never indexed (feat_rows/word ids point below the
    original row count)."""
    pad = (-arr.shape[0]) % multiple
    if pad == 0:
        return arr
    return np.concatenate(
        [arr, np.zeros((pad,) + arr.shape[1:], dtype=arr.dtype)], axis=0)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put every array in the batch with its leading axis on `data`."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
