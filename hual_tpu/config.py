"""Structured configuration.

One dataclass tree mirroring the reference YAML schema
(``/root/reference/configs/charades/SeqPAN.yaml:1-30``) so existing config
files load unchanged.  The reference used two config libraries (easydict at
``main.py:28``, OmegaConf at ``utils/utils_hual.py:181-192``); here a single
dataclass schema covers model / train / paths / loss plus the per-round
config derivation used by the active-learning orchestrator.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml


# Compute/storage dtype names are validated at config construction: a typo
# like "bf32" must fail loudly, not silently mean float32 (the model compares
# the literal string "bfloat16", models/seqpan.py).
_DTYPE_ALIASES = {"float32": "float32", "f32": "float32", "": "float32",
                  "bfloat16": "bfloat16", "bf16": "bfloat16"}
# storage-only dtypes: valid for the feature TABLE (dequantized on gather),
# never for compute dtypes
_STORAGE_DTYPE_ALIASES = dict(_DTYPE_ALIASES, int8="int8", i8="int8")


def _canon_dtype(name: Any, field_name: str, storage: bool = False) -> str:
    aliases = _STORAGE_DTYPE_ALIASES if storage else _DTYPE_ALIASES
    try:
        return aliases[str(name).lower()]
    except KeyError:
        raise ValueError(
            f"{field_name} must be one of {sorted(set(aliases))!r}, "
            f"got {name!r}") from None


def _check_choice(value: Any, field_name: str, choices: tuple) -> Any:
    if value not in choices:
        raise ValueError(f"{field_name} must be one of {choices}, "
                         f"got {value!r}")
    return value


@dataclass
class PathsConfig:
    ckpt_dir: str = "./ckpt"
    cache_dir: str = "./data_pkl/"
    feature_path: str = ""
    glove_path: str = ""
    train_path: str = ""
    test_path: str = ""
    val_path: str = ""


@dataclass
class TrainConfig:
    epochs: int = 50
    batch_size: int = 16
    lr: float = 1e-4
    droprate: float = 0.2
    clip_norm: float = 1.0
    # TPU additions (defaults preserve reference behavior)
    weight_decay: float = 0.01      # reference models/ops.py:121 (hardcoded)
    eval_batch_size: Optional[int] = None   # default max(96, batch);
    # measured eval-sweep batch curve: results/eval_batch_bench.json
    infer_batch_size: Optional[int] = None  # train-set MC-dropout sweep;
    # defaults to max(96, batch): B=96 measured fastest on the v5e sweep
    # grid {32..1024} at 23.5k pairs/s vs 18.5k at the old 256 — this
    # model's small ops get slower per element as they grow, and
    # power-of-two batches (128/256) sit in a measurable dip
    # (results/sweep_ablation*.json, PROFILING.md §3)
    seed: int = 12345               # reference main.py:21
    # Save the FULL training state (params+optimizer+step+epoch, trainer
    # save_state) every K epochs to <model_dir>/state, and resume from it on
    # restart (orchestrate._run_one_round) — preemption-granular recovery a
    # TPU fleet needs; a killed anet round resumes at the last saved epoch
    # instead of retraining 100 epochs.  The reference declared a
    # --checkpoint resume flag but never wired it (main.py:17).  0 = off.
    save_state_every: int = 0
    # Dropout rate of the two "MC-dropout" inference passes.  The reference
    # INTENDED 0.5 (eval_test_save builds feed_dict_dropout05,
    # utils/runner_utils.py:79) but its eval feed never includes the
    # drop_rate placeholder (utils/runner_utils.py:61-65), which defaults to
    # 0.0 (models/model.py:26) — so the reference's stochastic passes are
    # actually deterministic and model uncertainty is identically zero.
    # Default 0.0 reproduces that shipped behavior (docs/PARITY.md); set 0.5
    # for true MC-dropout uncertainty (the paper's stated method).
    mc_droprate: float = 0.0
    # Fold the clean + 2 stochastic MC passes into ONE 3B-row forward with a
    # per-sample dropout-rate vector (runtime/steps.py make_infer_step):
    # same FLOPs, 3x larger ops, fewer scan steps.  Clean outputs are
    # unchanged (rate-0 rows are deterministic); only the stochastic noise
    # stream differs (distributional parity, docs/PARITY.md).  No effect at
    # mc_droprate 0.0 (single clean pass) or with the gumbel head enabled.
    # Default False: MEASURED 40% slower on the v5e at B=256 (per-element
    # cost of this model's small ops grows with op size — VMEM locality,
    # results/sweep_ablation.json, PROFILING.md §3) — the option exists
    # because the tradeoff may flip on other hardware.
    fold_mc: bool = False
    # Compute dtype of the two STOCHASTIC MC passes only ("float32" or
    # "bfloat16").  The clean pass — whose logits drive every deterministic
    # AL decision — always runs at model.compute_dtype; the stochastic
    # passes' parity is distributional under any RNG (docs/PARITY.md), so
    # bf16 activations there trade nothing that is promised.
    mc_dtype: str = "float32"
    # JAX PRNG implementation per stream, from real-chip measurements
    # (results/step_breakdown.json, docs/PROFILING.md §3): "rbg" (TPU
    # hardware RNG) is 35% faster for the B=16 train step and 22% faster
    # for the scanned B=256 inference sweep than "threefry" (whose mask
    # generation is a large share of these small steps' FLOPs).  Dropout
    # bits never matched the reference's TF stateful RNG anyway
    # (docs/PARITY.md), so parity is distributional under any impl.
    rng_impl: str = "rbg"        # train-step dropout/gumbel streams
    infer_rng_impl: str = "rbg"  # MC-dropout inference sweep streams
    # Backend for the scanned eval / AL-infer sweeps: "flax" (XLA-compiled
    # model, default) or "fused" (the whole deterministic forward as ONE
    # Pallas VMEM kernel, ops/pallas/fused_forward.py; stochastic MC passes
    # stay on the flax model).  Real-chip comparison in
    # results/fused_forward_bench.json / PROFILING.md §3.
    sweep_backend: str = "flax"
    # samples per fused-kernel grid step; Mosaic requires a multiple of 8
    fused_block: int = 8
    # bf16 multiplies (f32 accumulation) inside the fused kernel — the same
    # numerics class as the flax path's TPU-default matmul precision.  All
    # four infer variants (flax/fused × f32/bf16 stochastic passes) measure
    # within run-to-run drift of each other (22.0–23.2k pairs/s across
    # sessions: results/fused_forward_bench.json, PROFILING.md §3.6)
    fused_mxu_bf16: bool = False
    # Data residency.  None (auto): device-resident dataset unless the
    # feature table would exceed hbm_budget_gb per chip, then fall back to
    # host streaming (per-batch host gather + prefetch thread).  True/False
    # force a mode.  Both modes produce identical training trajectories
    # (tests/test_host_streaming.py).
    host_streaming: Optional[bool] = None
    hbm_budget_gb: float = 12.0

    def __post_init__(self):
        self.mc_dtype = _canon_dtype(self.mc_dtype, "train.mc_dtype")
        _check_choice(self.sweep_backend, "train.sweep_backend",
                      ("flax", "fused"))


@dataclass
class ModelConfig:
    name: str = "SeqPAN"
    max_vlen: int = 64
    max_tlen: int = 30
    vdim: int = 1024
    dim: int = 128
    num_heads: int = 8
    word_dim: int = 300
    char_dim: int = 50
    attn_layer: int = 2
    # filled in after dataset generation (reference main.py:34-35)
    num_chars: int = 0
    num_words: int = 0
    # XLA matmul precision: "default" (bf16 inputs, f32 accumulation — the
    # TPU-native choice, used for all benchmarks), "high" (bf16x3) or
    # "highest" (full f32, closest to the reference's CUDA fp32 numerics)
    matmul_precision: str = "default"
    # answer span decode backend: "xla" or "pallas" (fused VMEM kernel);
    # bit-identical outputs (tests/test_pallas.py), measured comparison in
    # docs/PROFILING.md §5
    span_decode: str = "xla"
    # activation compute dtype for the model: "float32" (default, full
    # numeric parity) or "bfloat16" (matmuls accumulate f32; LN stats,
    # softmaxes, logits and losses stay f32 — models/layers.py)
    compute_dtype: str = "float32"
    # storage dtype of the device-resident video feature table: "float32"
    # (parity default), "bfloat16" (halves HBM: ActivityNet at 33.7k
    # records / T=100 / vdim=1024 is ~13.8 GB f32 vs ~6.9 GB bf16 on a
    # 16 GB v5e chip), or "int8" (symmetric per-clip quantization with an
    # f32 scale column — quarters HBM and the one-time host->device upload;
    # data/features.py::quantize_features).  Features are restored to
    # float32 on gather; int8 is lossy (~0.4% of per-clip amax) and opt-in.
    feature_dtype: str = "float32"

    def __post_init__(self):
        self.compute_dtype = _canon_dtype(self.compute_dtype,
                                          "model.compute_dtype")
        self.feature_dtype = _canon_dtype(self.feature_dtype,
                                          "model.feature_dtype",
                                          storage=True)
        _check_choice(self.span_decode, "model.span_decode",
                      ("xla", "pallas"))
        _check_choice(self.matmul_precision, "model.matmul_precision",
                      ("default", "high", "highest"))


@dataclass
class LossConfig:
    match_lambda: float = 1.0
    tau: float = 0.3
    no_gumbel: bool = True


@dataclass
class Config:
    task: str = "charades"
    suffix: str = ""
    paths: PathsConfig = field(default_factory=PathsConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)

    # ------------------------------------------------------------------
    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        def _sub(dc_cls, sub: dict[str, Any]):
            names = {f.name for f in dataclasses.fields(dc_cls)}
            return dc_cls(**{k: v for k, v in sub.items() if k in names})

        return cls(
            task=d.get("task", "charades"),
            suffix=d.get("suffix", "") or "",
            paths=_sub(PathsConfig, d.get("paths", {}) or {}),
            train=_sub(TrainConfig, d.get("train", {}) or {}),
            model=_sub(ModelConfig, d.get("model", {}) or {}),
            loss=_sub(LossConfig, d.get("loss", {}) or {}),
        )

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path, encoding="utf8") as f:
            return cls.from_dict(yaml.safe_load(f))

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf8") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    # ------------------------------------------------------------------
    def derive_round(self, round_idx: int,
                     data_root: str = "./data") -> "Config":
        """Per-round config derivation (reference utils/utils_hual.py:181-192).

        Rewrites train/test paths to the round directory under ``data_root``
        (the same root the label updater writes to — run_rounds plumbs its
        ``data_root`` here so labels are never written to one tree and
        trained from another) and sets the suffix.
        """
        round_dir = os.path.join(data_root, f"{self.task}_re{round_idx}")
        cfg = dataclasses.replace(
            self,
            suffix=f"re{round_idx}",
            paths=dataclasses.replace(
                self.paths,
                train_path=os.path.join(round_dir, "train.json"),
                test_path=os.path.join(round_dir, "test.json"),
            ),
        )
        return cfg

    @property
    def eval_batch_size(self) -> int:
        # default max(96, batch): the single-pass eval sweep keeps gaining
        # with batch on the v5e (B=16: 60.1k pairs/s, 96: 76.8k, 192: 83.3k
        # at T=64 — results/eval_batch_bench.json); 96 shares the infer
        # sweep's shape (one cached executable serves both).  Metrics are
        # invariant to the choice (test_train_e2e pad-invariance); the
        # trainer clamps to the split size so tiny corpora compile tiny
        # programs.
        return self.train.eval_batch_size or max(96, self.train.batch_size)

    @property
    def infer_batch_size(self) -> int:
        return self.train.infer_batch_size or max(96, self.train.batch_size)

    def model_dir(self) -> str:
        # Reference main.py:42 formats 'ckpt/{}_' with the task only (the
        # suffix placeholder is missing), so every round overwrites one dir.
        # We keep the suffix so rounds are resumable, and fall back to the
        # reference layout when suffix is empty.
        name = f"{self.task}_{self.suffix}" if self.suffix else f"{self.task}_"
        return os.path.join(self.paths.ckpt_dir, name)
