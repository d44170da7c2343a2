"""Trainer: jitted, mesh-sharded train / eval / MC-dropout inference.

Covers the reference runner (main.py:50-113, utils/runner_utils.py:139-176,
69-110): per-epoch linear LR decay, best-R1@0.7 checkpointing (Orbax), test
evaluation, and the full-train-set MC-dropout inference that feeds the
active-learning engine (same pickle schema as the reference).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from hual_tpu.config import Config
from hual_tpu.data.features import FeatureStore
from hual_tpu.data.loader import EvalLoader, PackedDataset, TrainLoader
from hual_tpu.models.registry import get_model_class
from hual_tpu.ops.optim import make_optimizer
from hual_tpu.data.loader import prefetch
from hual_tpu.parallel.mesh import (batch_sharding, feature_sharding,
                                    make_mesh, pad_rows, replicated,
                                    scan_batch_sharding, vocab_sharding)
from hual_tpu.runtime.logger import get_logger
from hual_tpu.runtime.observability import MetricsWriter, StepTimer, trace
from hual_tpu.runtime.steps import (make_eval_step, make_eval_sweep_indexed,
                                    make_infer_step,
                                    make_infer_sweep_indexed,
                                    make_train_epoch_indexed, make_train_step,
                                    make_train_step_indexed)
from hual_tpu.utils.io import save_pickle
from hual_tpu.utils.metrics import rank1_metrics


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0
    best_r1i7: float = -1.0
    # epochs COMPLETED so far (== the next epoch index train() will run).
    # Persisted by save_state so a preempted run resumes mid-round at epoch
    # granularity instead of retraining the round from scratch.
    epoch: int = 0


def _enable_persistent_compile_cache() -> None:
    """XLA executables cached on disk: later rounds / processes with the
    same shapes skip recompilation (compiles through the tunneled TPU cost
    minutes and dominate short runs)."""
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/hual_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


class Trainer:
    def __init__(self, config: Config, dataset: dict,
                 feature_store: FeatureStore, mesh=None, logger=None,
                 device_features=None):
        _enable_persistent_compile_cache()
        if config.model.matmul_precision != "default":
            jax.config.update("jax_default_matmul_precision",
                              config.model.matmul_precision)
        # Per-stream PRNG backends (keys carry their impl; both default to
        # the TPU hardware RNG "rbg"): measured on the real chip, rbg cuts
        # the B=16 train step 35% and the scanned B=256 inference sweep 22%
        # vs threefry, whose mask generation is a large share of these
        # steps' FLOPs — results/step_breakdown.json, docs/PROFILING.md §3.
        _impls = {"threefry": "threefry2x32", "threefry2x32": "threefry2x32",
                  "rbg": "rbg", "unsafe_rbg": "unsafe_rbg"}
        self._train_rng_impl = _impls[config.train.rng_impl]
        self._infer_rng_impl = _impls[config.train.infer_rng_impl]
        self.config = config
        self.dataset = dataset
        self.features = feature_store
        self.mesh = mesh if mesh is not None else make_mesh()
        self.logger = logger or get_logger(f"./logs/{config.task}",
                                           config.suffix or "run")

        max_wlen, max_clen = dataset["max_wlen"], dataset["max_clen"]
        self.train_set = PackedDataset(dataset["train_set"], feature_store,
                                       max_wlen, max_clen)
        self.test_set = PackedDataset(dataset["test_set"], feature_store,
                                      max_wlen, max_clen)
        self.val_set = (PackedDataset(dataset["val_set"], feature_store,
                                      max_wlen, max_clen)
                        if dataset.get("val_set") else None)

        config.model.num_chars = dataset["n_chars"]
        config.model.num_words = dataset["n_words"]
        self.model = get_model_class(config.model.name).from_config(config)
        self.tx = make_optimizer(config.train.clip_norm,
                                 config.train.weight_decay)

        self._repl = replicated(self.mesh)
        self._batch_sh = batch_sharding(self.mesh)
        self._mc_dtype = config.train.mc_dtype
        self._scan_sh = scan_batch_sharding(self.mesh)
        self.word_vectors = self._put_word_vectors(dataset["word_vector"])

        # --- data residency -------------------------------------------------
        # Default: device-resident dataset — the whole split lives in HBM
        # (feature table SHARDED over every mesh device, optionally bf16);
        # per step the host sends only the batch index vector.  Fallback:
        # host streaming for tables that exceed the per-chip HBM budget even
        # sharded/compressed (prefetch thread + per-batch upload).
        self._feat_dtype = self._feature_dtype()
        table_rows = feature_store.packed.shape[0]
        if self.mesh.size > 1:
            table_rows += (-table_rows) % self.mesh.size
        self._table_spec = ((table_rows,) + feature_store.packed.shape[1:],
                            np.dtype(self._feat_dtype))
        per_chip_gb = (np.prod(self._table_spec[0], dtype=np.int64)
                       * self._table_spec[1].itemsize / 1e9 / self.mesh.size)
        hs = config.train.host_streaming
        self.host_streaming = (per_chip_gb > config.train.hbm_budget_gb
                               if hs is None else bool(hs))

        if self.host_streaming:
            self.logger.info(
                f"host-streaming mode: feature table would be "
                f"{per_chip_gb:.1f} GB/chip (budget "
                f"{config.train.hbm_budget_gb} GB); batches are gathered on "
                f"host and prefetched")
            if self._table_spec[1] == np.int8:
                self.logger.info(
                    "host-streaming with model.feature_dtype='int8': "
                    "batches are quantized per-clip on the prefetch thread "
                    "and shipped as (int8, f32 scales) — a quarter of the "
                    "f32 upload bytes through the tunnel (PROFILING.md §5b)")
            self._device_features = None
            self._device_feature_scales = None
            self._train_data = self._test_data = self._val_data = None
            self._train_step_host = jax.jit(
                make_train_step(self.model, self.tx,
                                config.loss.match_lambda,
                                config.train.droprate),
                donate_argnums=(0, 1))
            self._eval_step_host = jax.jit(make_eval_step(self.model))
            self._infer_step_host = jax.jit(make_infer_step(
                self.model, config.train.mc_droprate,
                config.train.fold_mc, self._mc_model()))
        else:
            if device_features is not None:
                # reuse a previous round's device-resident table (features
                # are round-invariant; re-uploading GBs per round is waste).
                # int8 tables travel as a (table, scales) pair.
                tbl, scales = (device_features
                               if isinstance(device_features, tuple)
                               else (device_features, None))
                assert tbl.shape == self._table_spec[0], (
                    tbl.shape, self._table_spec[0])
                assert tbl.dtype == self._table_spec[1], (
                    tbl.dtype, self._table_spec[1])
                assert (scales is not None) == (self._table_spec[1]
                                                == np.int8), (
                    "int8 feature table requires its scales column")
                self._device_features = tbl
                self._device_feature_scales = scales
            else:
                self._device_features, self._device_feature_scales = (
                    self._put_feature_table(feature_store.packed))
            self._train_data = self._device_data(self.train_set)
            self._test_data = self._device_data(self.test_set)
            self._val_data = (self._device_data(self.val_set)
                              if self.val_set is not None else None)

        self._train_step = jax.jit(
            make_train_step_indexed(self.model, self.tx,
                                    config.loss.match_lambda,
                                    config.train.droprate),
            donate_argnums=(0, 1))
        self._train_epoch = jax.jit(
            make_train_epoch_indexed(self.model, self.tx,
                                     config.loss.match_lambda,
                                     config.train.droprate),
            donate_argnums=(0, 1))
        if config.train.sweep_backend == "fused" and self.host_streaming:
            # the fused sweeps gather from the device-resident table, which
            # host-streaming mode deliberately does not build — fall back
            # loudly rather than silently measuring flax twice in an A/B
            self.logger.warning(
                "train.sweep_backend='fused' requires a device-resident "
                "dataset; host-streaming mode is active, using the flax "
                "sweep backend instead")
        if config.train.sweep_backend == "fused" and not self.host_streaming:
            from hual_tpu.runtime.steps import (make_fused_eval_sweep_indexed,
                                                make_fused_infer_sweep_indexed)
            bb = config.train.fused_block
            mx = config.train.fused_mxu_bf16
            self._eval_sweep = jax.jit(
                make_fused_eval_sweep_indexed(self.model, block_b=bb,
                                              mxu_bf16=mx))
            self._infer_sweep = jax.jit(make_fused_infer_sweep_indexed(
                self.model, config.train.mc_droprate, self._mc_model(),
                block_b=bb, mxu_bf16=mx))
        else:
            self._eval_sweep = jax.jit(make_eval_sweep_indexed(self.model))
            self._infer_sweep = jax.jit(make_infer_sweep_indexed(
                self.model, config.train.mc_droprate, config.train.fold_mc,
                self._mc_model()))
        # eval/infer index matrices are a pure function of the (fixed) split
        # and batch size; build + upload once, not once per epoch
        self._sweep_cache: dict[str, tuple[Any, list, jax.Array]] = {}

        self.state: Optional[TrainState] = None
        self.metrics = MetricsWriter(
            os.path.join("logs", config.task,
                         f"metrics_{config.suffix or 'run'}.jsonl"))

    # ------------------------------------------------------------------
    def close(self) -> None:
        """Release the metrics JSONL handle (a multi-round loop builds one
        trainer per round; without this the handles accumulate for the life
        of the process)."""
        self.metrics.close()

    # ------------------------------------------------------------------
    def init_state(self, seed: Optional[int] = None) -> TrainState:
        seed = self.config.train.seed if seed is None else seed
        sample_sel = np.arange(min(2, len(self.train_set)))
        batch = self.train_set.gather(sample_sel, with_labels=True)
        init_rng = jax.random.key(seed)
        params = self.model.init(
            {"params": init_rng, "dropout": jax.random.fold_in(init_rng, 1)},
            batch, np.asarray(self.dataset["word_vector"], np.float32), 0.0,
            batch["match_labels"], deterministic=True)
        params = jax.device_put(params, self._repl)
        opt_state = jax.device_put(self.tx.init(params), self._repl)
        self.state = TrainState(params=params, opt_state=opt_state)
        from hual_tpu.ops.optim import count_params
        self.logger.info(f"initialized {self.config.model.name}: "
                         f"{count_params(params)} params")
        return self.state

    def _feature_dtype(self):
        name = self.config.model.feature_dtype
        if name in ("float32", "f32", ""):
            return np.float32
        if name in ("bfloat16", "bf16"):
            import ml_dtypes
            return ml_dtypes.bfloat16
        if name in ("int8", "i8"):
            return np.int8
        raise ValueError(f"unsupported feature_dtype '{name}'")

    def export_device_features(self):
        """The cross-round reusable device table in the shape `__init__`'s
        ``device_features`` accepts: the bare array, or the (table, scales)
        pair for int8 tables; None in host-streaming mode."""
        if self._device_features is None:
            return None
        if self._device_feature_scales is not None:
            return (self._device_features, self._device_feature_scales)
        return self._device_features

    def _mc_model(self):
        """Model variant for the STOCHASTIC MC passes (train.mc_dtype): a
        compute-dtype clone sharing the same param tree, or None to reuse
        the main model.  The clean pass always runs the main model."""
        if self._mc_dtype == self.config.model.compute_dtype:
            return None
        return self.model.clone(compute_dtype=self._mc_dtype)

    def _put_feature_table(self, packed: np.ndarray
                           ) -> tuple[jax.Array, Optional[jax.Array]]:
        """Upload the (num_videos, T, D) table: cast to the configured
        storage dtype, pad rows to the mesh size, and shard rows across
        EVERY device (feature_sharding) so per-chip HBM scales down with the
        mesh.  Padding rows are never referenced by feat_rows.  Returns
        (table, scales): int8 tables carry a per-clip f32 scale column
        (data/features.py::quantize_features, dequantized inside
        gather_batch); other dtypes return scales=None."""
        sh = (feature_sharding(self.mesh) if self.mesh.size > 1
              else self._repl)
        if self._table_spec[1] == np.int8:
            from hual_tpu.data.features import quantize_features
            q, scales = quantize_features(packed)
            if self.mesh.size > 1:
                q = pad_rows(q, self.mesh.size)
                scales = pad_rows(scales, self.mesh.size)
            return jax.device_put(q, sh), jax.device_put(scales, sh)
        if packed.dtype != self._table_spec[1]:
            packed = packed.astype(self._table_spec[1])
        if self.mesh.size > 1:
            packed = pad_rows(packed, self.mesh.size)
        return jax.device_put(packed, sh), None

    def _put_word_vectors(self, wv: np.ndarray) -> jax.Array:
        """GloVe matrix: row-sharded over the `model` axis when it exists
        (ids index [zero, unk, table]; padding rows are never looked up)."""
        wv = np.asarray(wv, np.float32)
        model_size = int(self.mesh.shape.get("model", 1))
        if model_size > 1:
            wv = pad_rows(wv, model_size)
            return jax.device_put(wv, vocab_sharding(self.mesh))
        return jax.device_put(jnp.asarray(wv), self._repl)

    def _hs_stream(self, it):
        """Host-streaming batch transform: with an int8 feature dtype,
        quantize each gathered f32 batch per-clip (the SAME scheme as the
        device-resident table, features.quantize_features) so the upload
        ships (int8, scales) instead of 4x the bytes; the jitted steps
        dequantize on device (steps.dequantize_batch).  Runs on the
        prefetch thread, overlapping device compute.  Identity for
        f32/bf16 streaming."""
        if self._table_spec[1] != np.int8:
            yield from it
            return
        from hual_tpu.data.features import quantize_features
        for item in it:
            item = list(item)
            for i, x in enumerate(item):
                if isinstance(x, dict) and "video_features" in x:
                    q, s = quantize_features(x["video_features"])
                    item[i] = dict(x, video_features=q, feature_scales=s)
            yield tuple(item)

    def _device_data(self, packed: PackedDataset) -> dict:
        cols = {"feat_rows": packed.feat_rows, "word_ids": packed.word_ids,
                "char_ids": packed.char_ids, "s_ind": packed.s_ind,
                "e_ind": packed.e_ind, "v_len": packed.v_len,
                "duration": packed.duration}
        data = {k: jax.device_put(v, self._repl) for k, v in cols.items()}
        data["features"] = self._device_features
        if self._device_feature_scales is not None:
            data["feature_scales"] = self._device_feature_scales
        return data

    def _data_axis_size(self) -> int:
        return int(self.mesh.shape.get("data", 1))

    def _put_sel(self, sel: np.ndarray) -> jax.Array:
        # a ragged remainder batch may not divide the data axis; replicate it
        # (one un-sharded step) instead of crashing the multi-device path
        sh = (self._batch_sh if len(sel) % self._data_axis_size() == 0
              else self._repl)
        return jax.device_put(np.ascontiguousarray(sel), sh)

    def _put_sels(self, sels: np.ndarray) -> jax.Array:
        """(n_batches, B) scan matrix: shard B over the data axis when it
        divides, else replicate (same semantics, no divisibility crash)."""
        sh = (self._scan_sh if sels.shape[1] % self._data_axis_size() == 0
              else self._repl)
        return jax.device_put(sels, sh)

    def _sweep_sels(self, key: str, dataset, batch_size: int
                    ) -> tuple[list, jax.Array]:
        cached = self._sweep_cache.get(key)
        if cached is None or cached[0] is not dataset or cached[3] != batch_size:
            loader = EvalLoader(dataset, batch_size, pad_to_batch=True)
            pairs = list(loader.index_iter())
            sels = self._put_sels(np.stack([s for s, _ in pairs]))
            cached = (dataset, pairs, sels, batch_size)
            self._sweep_cache[key] = cached
        return cached[1], cached[2]

    # ------------------------------------------------------------------
    def train(self, epoch_callback=None) -> dict[str, Any]:
        """Run the configured epochs; returns the best-epoch record.

        ``epoch_callback(epoch, test_metrics)``, when given, fires after each
        epoch's bookkeeping (best-checkpoint update + periodic state save) —
        for external reporting/early-stop, and the preemption hook the
        resume tests use (an exception from it aborts mid-round exactly
        where a real kill would)."""
        cfg = self.config
        if self.state is None:
            self.init_state()
        state = self.state
        loader = TrainLoader(self.train_set, cfg.train.batch_size,
                             seed=cfg.train.seed)
        base_rng = jax.random.key(cfg.train.seed + 17,
                                  impl=self._train_rng_impl)
        # resume-safe: state.best_r1i7 (persisted by save_state) seeds the
        # threshold so a continuation can't overwrite a better checkpoint.
        # epoch/*_metrics start as well-formed defaults so the "best" record
        # stays summary-readable even when a resumed run never beats the
        # persisted threshold (improved=False flags that case).
        best = {"r1i7": state.best_r1i7, "train_line": "", "test_line": "",
                "epoch": -1, "test_metrics": {}, "train_metrics": {},
                "improved": False}
        ckptr = ocp.StandardCheckpointer()
        model_dir = os.path.abspath(self.config.model_dir())
        os.makedirs(model_dir, exist_ok=True)

        global_step = state.step
        timer = StepTimer(warmup_steps=1)  # per-epoch timing; epoch 0 compiles
        # resume mid-round: state.epoch > 0 after load_state of a periodic
        # save — the loop continues where the preempted run stopped.  The
        # per-epoch shuffle (loader.index_iter(epoch)) and the per-step RNG
        # stream (fold_in(base_rng, global_step)) are both functions of the
        # restored counters, so a resumed run replays the exact trajectory
        # of an uninterrupted one (tests/test_train_e2e.py).
        start_epoch = int(state.epoch)
        if start_epoch:
            self.logger.info(f"resuming at epoch {start_epoch} "
                             f"(step {global_step})")
        state_path = os.path.join(model_dir, "state")
        every = int(getattr(cfg.train, "save_state_every", 0) or 0)
        for epoch in range(start_epoch, cfg.train.epochs):
            # linear LR decay (reference main.py:61)
            cur_lr = cfg.train.lr * (1.0 - epoch / cfg.train.epochs)
            t0 = time.time()
            lr_arr = jnp.float32(cur_lr)
            with trace(f"train_epoch_{epoch}"):
                timer.start()
                ious_parts, losses_parts = [], []
                if self.host_streaming:
                    # >HBM fallback: per-batch host gather + label synthesis
                    # on a prefetch thread, per-batch upload; same batch
                    # order and per-step RNG stream as the device path
                    for sel, batch in prefetch(
                            self._hs_stream(loader.batch_iter(epoch))):
                        rng = jax.random.fold_in(base_rng, global_step)
                        (state.params, state.opt_state,
                         metrics) = self._train_step_host(
                            state.params, state.opt_state, batch,
                            self.word_vectors, lr_arr, rng)
                        ious_parts.append(metrics["ious"])
                        losses_parts.append(metrics["loss"][None])
                        global_step += 1
                else:
                    # device-resident path: all full-size batches are ONE
                    # scanned dispatch; the ragged remainder (if any) is one
                    # extra step call
                    all_sels = list(loader.index_iter(epoch))
                    full = [s for s in all_sels
                            if len(s) == loader.batch_size]
                    rest = [s for s in all_sels
                            if len(s) != loader.batch_size]
                    if full:
                        sels_dev = self._put_sels(np.stack(full))
                        (state.params, state.opt_state, losses,
                         ious) = self._train_epoch(
                            state.params, state.opt_state, self._train_data,
                            sels_dev, self.word_vectors, lr_arr, base_rng,
                            jnp.int32(global_step))
                        global_step += len(full)
                        ious_parts.append(ious.reshape(-1))
                        losses_parts.append(losses)
                    for sel in rest:
                        rng = jax.random.fold_in(base_rng, global_step)
                        (state.params, state.opt_state,
                         metrics) = self._train_step(
                            state.params, state.opt_state, self._train_data,
                            self._put_sel(sel), self.word_vectors, lr_arr,
                            rng)
                        ious_parts.append(metrics["ious"])
                        losses_parts.append(metrics["loss"][None])
                        global_step += 1
            state.step = global_step
            # one device-side concat -> one host fetch per epoch.  The fetch
            # is the only trusted synchronization point (see PROFILING.md §1)
            # so the step timer stops AFTER it — dispatch-to-fetch wall time,
            # never an async artifact.
            train_m = rank1_metrics(np.asarray(jnp.concatenate(ious_parts)))
            train_m["loss"] = float(np.mean(np.asarray(
                jnp.concatenate(losses_parts))))
            timer.stop(loader.num_samples())
            dt = time.time() - t0
            sps = loader.num_samples() / max(dt, 1e-9)
            train_line = ("TRAIN:\t{r1i3:.2f}\t{r1i5:.2f}\t{r1i7:.2f}\t{miou:.2f}\t"
                          .format(**train_m))
            self.logger.info(f"Epoch {epoch}|{cfg.train.epochs}: "
                             f"loss {train_m['loss']:.4f} "
                             f"({sps:.0f} pairs/s)")
            self.logger.info(train_line)

            train_wall = time.time() - t0
            t1 = time.time()
            test_m = self.test()
            test_line = ("TEST:\t{r1i3:.2f}\t{r1i5:.2f}\t{r1i7:.2f}\t{miou:.2f}\t"
                         .format(**test_m))
            self.logger.info(test_line)
            self.metrics.write("epoch", epoch=epoch, lr=cur_lr,
                               train=train_m, test=test_m,
                               pairs_per_sec=timer.pairs_per_sec,
                               step_ms=timer.mean_step_ms,
                               train_wall_s=train_wall,
                               eval_wall_s=time.time() - t1)
            self.last_epoch_wall = {"train_s": train_wall,
                                    "eval_s": time.time() - t1}

            # keep the checkpoint at best test R1@IoU0.7 (reference main.py:70-75)
            if test_m["r1i7"] > best["r1i7"]:
                best.update(r1i7=test_m["r1i7"], train_line=train_line,
                            test_line=test_line, epoch=epoch,
                            test_metrics=test_m, train_metrics=train_m,
                            improved=True)
                state.best_r1i7 = float(test_m["r1i7"])
                path = os.path.join(model_dir, "best")
                # the previous best-save is async and may still be
                # committing; wait before replacing, else its commit
                # recreates `path` between our rmtree and save
                ckptr.wait_until_finished()
                if os.path.exists(path):
                    import shutil
                    shutil.rmtree(path)
                ckptr.save(path, jax.device_get(state.params))
            state.epoch = epoch + 1
            # periodic full-state save (resume point) AFTER the best-ckpt
            # update so a resume carries a best_r1i7 threshold consistent
            # with the best/ checkpoint already on disk
            if every and (epoch + 1) % every == 0 \
                    and epoch + 1 < cfg.train.epochs:
                ckptr.wait_until_finished()
                self.save_state(state_path)
            if epoch_callback is not None:
                epoch_callback(epoch, test_m)
        ckptr.wait_until_finished()
        self.logger.info("Highest R1i7 epoch:\n%s\n%s",
                         best["train_line"], best["test_line"])
        best["pairs_per_sec"] = timer.pairs_per_sec
        self.metrics.write("best", **{k: v for k, v in best.items()
                                      if not k.endswith("_line")})
        return best

    # ------------------------------------------------------------------
    def save_state(self, path: str) -> None:
        """Full training state (params + optimizer + step) for resume —
        the reference declared a --checkpoint resume flag but never wired it
        (main.py:17, SURVEY.md §5)."""
        assert self.state is not None
        ckptr = ocp.StandardCheckpointer()
        path = os.path.abspath(path)
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        ckptr.save(path, {"params": jax.device_get(self.state.params),
                          "opt_state": jax.device_get(self.state.opt_state),
                          "step": self.state.step,
                          "best_r1i7": self.state.best_r1i7,
                          "epoch": self.state.epoch})
        ckptr.wait_until_finished()

    def load_state(self, path: str) -> None:
        if self.state is None:
            self.init_state()
        ckptr = ocp.StandardCheckpointer()
        target = {"params": jax.device_get(self.state.params),
                  "opt_state": jax.device_get(self.state.opt_state),
                  "step": self.state.step,
                  "best_r1i7": self.state.best_r1i7,
                  "epoch": self.state.epoch}
        restored = ckptr.restore(os.path.abspath(path), target=target)
        self.state.params = jax.device_put(restored["params"], self._repl)
        self.state.opt_state = jax.device_put(restored["opt_state"], self._repl)
        self.state.step = int(restored["step"])
        self.state.best_r1i7 = float(restored["best_r1i7"])
        self.state.epoch = int(restored["epoch"])

    # ------------------------------------------------------------------
    def restore(self, path: Optional[str] = None) -> None:
        if self.state is None:
            self.init_state()
        if path is None:
            path = os.path.join(os.path.abspath(self.config.model_dir()), "best")
        if not os.path.exists(path):
            raise ValueError(f"no pre-trained model exists at {path}")
        ckptr = ocp.StandardCheckpointer()
        target = jax.device_get(self.state.params)
        restored = ckptr.restore(path, target=target)
        self.state.params = jax.device_put(restored, self._repl)

    # ------------------------------------------------------------------
    def test(self, split: str = "test") -> dict[str, float]:
        assert self.state is not None
        ds = {"test": self.test_set, "val": self.val_set}[split]
        if ds is None:
            raise ValueError(f"{split} set is not available")
        # clamp so tiny corpora compile tiny programs (mirrors infer's clamp)
        batch_size = min(self.config.eval_batch_size, len(ds))
        if self.host_streaming:
            loader = EvalLoader(ds, batch_size, pad_to_batch=True)
            parts = []
            for _, batch, n_valid in prefetch(
                    self._hs_stream(loader.batch_iter())):
                out = self._eval_step_host(self.state.params, batch,
                                           self.word_vectors)
                parts.append(np.asarray(out["ious"])[:n_valid])
            return rank1_metrics(np.concatenate(parts))
        data = {"test": self._test_data, "val": self._val_data}[split]
        # pad_to_batch: eval is per-row independent, so padding the final
        # ragged batch (dropped via the n_valid mask) keeps one trace; the
        # whole split is ONE scanned dispatch + ONE fetch, and the index
        # matrix is cached on device across epochs
        pairs, sels = self._sweep_sels(split, ds, batch_size)
        ious = np.asarray(self._eval_sweep(self.state.params, data, sels,
                                           self.word_vectors))
        kept = np.concatenate([ious[i, :n] for i, (_, n) in enumerate(pairs)])
        return rank1_metrics(kept)

    # ------------------------------------------------------------------
    def infer_trainset(self, save_path: Optional[str] = None,
                       seed: Optional[int] = None) -> dict[str, float]:
        """Full-train-set MC-dropout inference; writes the round pickle with
        the reference schema (utils/runner_utils.py:89-104)."""
        assert self.state is not None
        cfg = self.config
        if save_path is None:
            save_path = f"./results/{cfg.task}/{cfg.suffix}.pkl"
        rng = jax.random.key(cfg.train.seed if seed is None else seed,
                             impl=self._infer_rng_impl)
        records = self.train_set.records
        batch_size = min(cfg.infer_batch_size, len(self.train_set))
        if self.host_streaming:
            # per-batch RNG = fold_in(rng, batch_index), identical to the
            # scanned device path, so both modes write the same pickle
            loader = EvalLoader(self.train_set, batch_size, pad_to_batch=True)
            parts = []
            for i, (_, batch, n_valid) in enumerate(
                    prefetch(self._hs_stream(loader.batch_iter()))):
                out = self._infer_step_host(self.state.params, batch,
                                            self.word_vectors,
                                            jax.random.fold_in(rng, i))
                parts.append({k: np.asarray(v)[:n_valid]
                              for k, v in out.items()})
            host = {k: np.concatenate([p[k] for p in parts], axis=0)
                    for k in parts[0]}
        else:
            # the whole sweep is ONE scanned dispatch; one fetch per output
            # field (per-batch fetches through a tunnel cost ~100 ms each)
            pairs, sels = self._sweep_sels("infer", self.train_set, batch_size)
            outs = self._infer_sweep(self.state.params, self._train_data,
                                     sels, self.word_vectors, rng)
            host = {}
            for k, v in outs.items():
                stacked = np.asarray(v)  # (n_batches, B, ...)
                host[k] = np.concatenate(
                    [stacked[i, :n] for i, (_, n) in enumerate(pairs)], axis=0)

        save_list = []
        for i, rec in enumerate(records):
            save_list.append({
                "vid": rec["vid"],
                "duration": rec["duration"],
                "psuedo_idx": [rec["s_ind"], rec["e_ind"]],
                "sentence": " ".join(rec["words"]),
                "v_len": int(rec["v_len"]),
                "prop_idx": [int(host["start_index"][i]),
                             int(host["end_index"][i])],
                "prop_logits": [host["start_logits"][i], host["end_logits"][i]],
                "prop_logits1": [host["start_logits1"][i], host["end_logits1"][i]],
                "prop_logits2": [host["start_logits2"][i], host["end_logits2"][i]],
                "m_score": host["match_scores"][i],
            })
        save_pickle(save_list, save_path)
        metrics = rank1_metrics(host["ious"])
        self.logger.info(
            "predict train set:\t{r1i3:.2f}\t{r1i5:.2f}\t{r1i7:.2f}\t{miou:.2f}\t"
            .format(**metrics))
        return metrics
