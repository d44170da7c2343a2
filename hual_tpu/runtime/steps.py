"""Pure jittable step functions: train / eval / MC-dropout inference.

One fused XLA program replaces each reference host loop body:

* train step (reference utils/runner_utils.py:139-159): forward + all three
  losses + AdamW update + span decode + on-device IoU — one program, one
  host round-trip per batch (the reference ran sess.run then re-decoded
  times/IoU per sample in Python).
* MC-dropout inference step (reference eval_test_save,
  utils/runner_utils.py:69-110): the reference issued FIVE sess.runs per
  batch (match scores, clean logits, indices, 2x dropout logits); here all
  of it is a single compiled function with three internal forward passes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from hual_tpu.data.labels_jax import make_span_labels_jax
from hual_tpu.models.seqpan import seqpan_loss


def device_ious(start_idx, end_idx, s_ind, e_ind, v_len, duration):
    """Interval IoU of predicted vs (pseudo) GT spans, decoded with the
    trainer convention s=i*dur/T, e=(i+1)*dur/T (utils/data_utils.py:121-127),
    fully on device in float32."""
    vl = v_len.astype(jnp.float32)
    dur = duration.astype(jnp.float32)
    ps = start_idx.astype(jnp.float32) * dur / vl
    pe = (end_idx.astype(jnp.float32) + 1.0) * dur / vl
    gs = s_ind.astype(jnp.float32) * dur / vl
    ge = (e_ind.astype(jnp.float32) + 1.0) * dur / vl
    inter = jnp.minimum(pe, ge) - jnp.maximum(ps, gs)
    union = jnp.maximum(pe, ge) - jnp.minimum(ps, gs)
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
    return jnp.maximum(iou, 0.0)


def gather_batch(data: dict, sel: jnp.ndarray, with_labels: bool) -> dict:
    """Assemble a batch ON DEVICE from the device-resident dataset.

    ``data`` holds the whole split in HBM: ``features`` (n_videos, T, vdim)
    plus per-sample columns; ``sel`` is the only thing the host sends per
    step (B int32 indices).  Labels are synthesized on device too
    (labels_jax), so a train step's host->device traffic is ~4B*B.
    """
    def take(name):
        return jnp.take(data[name], sel, axis=0)

    feat_rows = take("feat_rows")
    feats = jnp.take(data["features"], feat_rows, axis=0)
    if feats.dtype == jnp.int8:
        # int8 table (model.feature_dtype): symmetric per-clip quantization
        # with an f32 scale column (features.quantize_features) — dequantize
        # only the B gathered rows; compute stays f32
        scales = jnp.take(data["feature_scales"], feat_rows, axis=0)
        feats = feats.astype(jnp.float32) * scales[..., None]
    elif feats.dtype != jnp.float32:
        # the table may be stored bf16 (model.feature_dtype) to halve HBM;
        # compute stays f32 — only the B gathered rows are cast
        feats = feats.astype(jnp.float32)
    batch = {
        "video_features": feats,
        "video_seq_len": take("v_len"),
        "word_ids": take("word_ids"),
        "char_ids": take("char_ids"),
        "s_ind": take("s_ind"),
        "e_ind": take("e_ind"),
        "duration": take("duration"),
    }
    if with_labels:
        y1, y2, match, inner = make_span_labels_jax(
            batch["s_ind"], batch["e_ind"], batch["video_seq_len"],
            data["features"].shape[1])
        batch.update(y1=y1, y2=y2, match_labels=match, inner_labels=inner)
    return batch


def dequantize_batch(batch: dict) -> dict:
    """Device-side dequantization for HOST-STREAMED batches.

    The >HBM fallback ships each batch over the (slow, ~12 MiB/s tunnel)
    host->device link; with model.feature_dtype='int8' the trainer streams
    (int8 features, f32 per-clip scales) — a quarter of the f32 bytes, the
    same per-clip symmetric scheme as the device-resident table
    (data/features.quantize_features), so both residencies see identical
    dequantized values.  No-op for f32 batches; bf16 casts up."""
    feats = batch["video_features"]
    if feats.dtype == jnp.int8:
        batch = dict(batch)
        scales = batch.pop("feature_scales")
        batch["video_features"] = feats.astype(jnp.float32) * scales[..., None]
    elif feats.dtype != jnp.float32:
        batch = dict(batch)
        batch["video_features"] = feats.astype(jnp.float32)
    return batch


def make_train_step(model, tx: optax.GradientTransformation,
                    match_lambda: float, droprate: float) -> Callable:
    def train_step(params, opt_state, batch, word_vectors, lr, rng):
        batch = dequantize_batch(batch)

        def loss_fn(p):
            outputs = model.apply(p, batch, word_vectors, droprate,
                                  batch["match_labels"], deterministic=False,
                                  rngs={"dropout": rng})
            total, aux = seqpan_loss(outputs, batch, match_lambda)
            return total, (aux, outputs)

        (loss, (aux, outputs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ious = device_ious(outputs["start_index"], outputs["end_index"],
                           batch["s_ind"], batch["e_ind"],
                           batch["video_seq_len"], batch["duration"])
        metrics = dict(aux)
        metrics["ious"] = ious
        return params, opt_state, metrics

    return train_step


def make_eval_step(model) -> Callable:
    def eval_step(params, batch, word_vectors):
        batch = dequantize_batch(batch)
        outputs = model.apply(params, batch, word_vectors, 0.0,
                              deterministic=True)
        ious = device_ious(outputs["start_index"], outputs["end_index"],
                           batch["s_ind"], batch["e_ind"],
                           batch["video_seq_len"], batch["duration"])
        return {"start_index": outputs["start_index"],
                "end_index": outputs["end_index"], "ious": ious}

    return eval_step


def make_infer_step(model, mc_droprate: float = 0.0,
                    fold_mc: bool = False, mc_model=None) -> Callable:
    """Clean forward + two "MC-dropout" forwards in one compiled program
    (reference eval_test_save's 5 sess.runs, utils/runner_utils.py:75-81).

    ``mc_droprate=0.0`` (default) replicates the reference exactly: its eval
    feed omits the drop_rate placeholder (utils/runner_utils.py:61-65), which
    defaults to 0.0 (models/model.py:26), so the reference's two stochastic
    passes are identical to the clean pass — reuse it instead of recomputing.
    A nonzero rate gives true MC-dropout (two extra stochastic forwards).

    ``fold_mc``: the three logical passes run as ONE forward over a 3B-row
    batch with a PER-SAMPLE dropout-rate vector [0,...,mc,...,mc] — same
    FLOPs, 3x larger ops, one third the ops.  The clean rows see rate 0 ==
    bitwise-deterministic (layers.dropout), so prop_idx/m_score/clean
    logits are unchanged; the stochastic rows draw a different (equally
    distributed) noise stream than the sequential path — parity at mc>0 is
    distributional anyway (docs/PARITY.md).  Default OFF: measured 40%
    SLOWER on the v5e at B=256 (this model's per-element op cost grows
    with op size; results/sweep_ablation.json, PROFILING.md §3).

    The reuse fast path additionally requires the model to have no OTHER
    eval-time stochasticity: with the gumbel matching head enabled
    (loss.no_gumbel: false) the reference samples gumbel noise in every
    sess.run, so even at drop_rate 0 the two passes differ — in that case
    the two extra forwards run sequentially with the gumbel RNG live (the
    folded path would add gumbel noise to the clean rows too).

    ``mc_model`` (optional): a variant model (same param tree) applied for
    the STOCHASTIC passes only — production use is a bfloat16-compute clone
    (train.mc_dtype) since those passes' parity is distributional anyway;
    the clean pass, whose logits drive the AL math, stays on ``model``.
    Incompatible with fold_mc (the folded forward is one model): sequential
    passes are used when both are set.
    """
    stochastic_eval = bool(getattr(model, "use_gumbel", False))
    stoch_model = mc_model if mc_model is not None else model

    def infer_step(params, batch, word_vectors, rng):
        batch = dequantize_batch(batch)
        if (mc_droprate != 0.0 and fold_mc and not stochastic_eval
                and mc_model is None):
            b = batch["video_features"].shape[0]
            batch3 = {k: jnp.concatenate([v, v, v], axis=0)
                      for k, v in batch.items()}
            rates = jnp.concatenate([
                jnp.zeros((b,), jnp.float32),
                jnp.full((2 * b,), mc_droprate, jnp.float32)])
            out3 = model.apply(params, batch3, word_vectors, rates,
                               deterministic=False, rngs={"dropout": rng})
            clean, mc1, mc2 = (
                jax.tree.map(
                    lambda x, lo=i * b: x[lo:lo + b] if jnp.ndim(x) else x,
                    out3)
                for i in range(3))
        else:
            clean = model.apply(params, batch, word_vectors, 0.0,
                                deterministic=True)
            if mc_droprate == 0.0 and not stochastic_eval:
                mc1 = mc2 = clean
            else:
                r1, r2 = jax.random.split(rng)
                mc1 = stoch_model.apply(params, batch, word_vectors,
                                        mc_droprate, deterministic=False,
                                        rngs={"dropout": r1})
                mc2 = stoch_model.apply(params, batch, word_vectors,
                                        mc_droprate, deterministic=False,
                                        rngs={"dropout": r2})
        ious = device_ious(clean["start_index"], clean["end_index"],
                           batch["s_ind"], batch["e_ind"],
                           batch["video_seq_len"], batch["duration"])
        return {
            "match_scores": clean["match_scores"],
            "start_logits": clean["start_logits"],
            "end_logits": clean["end_logits"],
            "start_index": clean["start_index"],
            "end_index": clean["end_index"],
            "start_logits1": mc1["start_logits"],
            "end_logits1": mc1["end_logits"],
            "start_logits2": mc2["start_logits"],
            "end_logits2": mc2["end_logits"],
            "ious": ious,
        }

    return infer_step


# ----------------------------------------------------------------------
# indexed (device-resident dataset) variants: the host sends only `sel`


def make_train_step_indexed(model, tx, match_lambda: float,
                            droprate: float) -> Callable:
    base = make_train_step(model, tx, match_lambda, droprate)

    def step(params, opt_state, data, sel, word_vectors, lr, rng):
        batch = gather_batch(data, sel, with_labels=True)
        return base(params, opt_state, batch, word_vectors, lr, rng)

    return step


def make_train_epoch_indexed(model, tx, match_lambda: float,
                             droprate: float) -> Callable:
    """A whole epoch of train steps as ONE compiled program.

    lax.scan over the (n_batches, B) shuffled index matrix: each scan
    iteration is exactly one train step (same per-step RNG stream as the
    per-step path: rng = fold_in(base_rng, global_step)).  One dispatch +
    one metrics fetch per epoch — the host is out of the loop entirely.
    """
    step = make_train_step_indexed(model, tx, match_lambda, droprate)

    def epoch_fn(params, opt_state, data, sels, word_vectors, lr, base_rng,
                 step0):
        steps = step0 + jnp.arange(sels.shape[0], dtype=jnp.int32)

        def body(carry, inp):
            p, o = carry
            sel, i = inp
            rng = jax.random.fold_in(base_rng, i)
            p, o, metrics = step(p, o, data, sel, word_vectors, lr, rng)
            return (p, o), (metrics["loss"], metrics["ious"])

        (params, opt_state), (losses, ious) = jax.lax.scan(
            body, (params, opt_state), (sels, steps))
        return params, opt_state, losses, ious

    return epoch_fn


def make_eval_step_indexed(model) -> Callable:
    base = make_eval_step(model)

    def step(params, data, sel, word_vectors):
        return base(params, gather_batch(data, sel, with_labels=False),
                    word_vectors)

    return step


def make_eval_sweep_indexed(model) -> Callable:
    """Whole-split evaluation as one scanned program: sels (n_batches, B) ->
    ious (n_batches, B)."""
    step = make_eval_step_indexed(model)

    def sweep(params, data, sels, word_vectors):
        def body(_, sel):
            return None, step(params, data, sel, word_vectors)["ious"]

        _, ious = jax.lax.scan(body, None, sels)
        return ious

    return sweep


def make_infer_sweep_indexed(model, mc_droprate: float = 0.0,
                             fold_mc: bool = False, mc_model=None) -> Callable:
    """Whole-train-set MC-dropout inference as one scanned program.

    Replaces the reference's 5-sess.run-per-batch host loop
    (utils/runner_utils.py:69-110) with a single dispatch: sels
    (n_batches, B) -> dict of (n_batches, B, ...) stacked outputs.
    Per-batch RNG = fold_in(rng, batch_index), matching the per-step path.
    """
    step = make_infer_step_indexed(model, mc_droprate, fold_mc, mc_model)

    def sweep(params, data, sels, word_vectors, rng):
        idxs = jnp.arange(sels.shape[0], dtype=jnp.int32)

        def body(_, inp):
            sel, i = inp
            return None, step(params, data, sel, word_vectors,
                              jax.random.fold_in(rng, i))

        _, outs = jax.lax.scan(body, None, (sels, idxs))
        return outs

    return sweep


def make_infer_step_indexed(model, mc_droprate: float = 0.0,
                            fold_mc: bool = False, mc_model=None) -> Callable:
    base = make_infer_step(model, mc_droprate, fold_mc, mc_model)

    def step(params, data, sel, word_vectors, rng):
        return base(params, gather_batch(data, sel, with_labels=False),
                    word_vectors, rng)

    return step


# ----------------------------------------------------------------------
# fused-Pallas sweeps: the whole deterministic forward as ONE kernel
# (ops/pallas/fused_forward.py) — targets the op-locality bound of the
# small-shape model (PROFILING.md §3).


def make_fused_eval_sweep_indexed(model, block_b: int = 8,
                                  mxu_bf16: bool = False) -> Callable:
    """Eval sweep with the fused forward: sels (n_batches, B) -> ious."""
    from hual_tpu.ops.pallas.fused_forward import (encoder_inputs, fused_call,
                                                   pack_weights)
    from hual_tpu.ops.pallas.span_decode import span_decode_pallas

    def sweep(params, data, sels, word_vectors):
        stacks, layout = pack_weights(params, model.attn_layer, model.dim)
        interp = jax.default_backend() != "tpu"

        def body(_, sel):
            batch = gather_batch(data, sel, with_labels=False)
            vf, qf, vm, qm = encoder_inputs(model, params, batch,
                                            word_vectors)
            s, e, _ = fused_call(stacks, layout, vf, qf, vm, qm,
                                 attn_layer=model.attn_layer,
                                 num_heads=model.num_heads, tau=model.tau,
                                 use_gumbel=model.use_gumbel,
                                 block_b=block_b, mxu_bf16=mxu_bf16,
                                 interpret=interp)
            sidx, eidx = span_decode_pallas(s, e, vm, interpret=interp)
            return None, device_ious(sidx, eidx, batch["s_ind"],
                                     batch["e_ind"], batch["video_seq_len"],
                                     batch["duration"])

        _, ious = jax.lax.scan(body, None, sels)
        return ious

    return sweep


def make_fused_infer_sweep_indexed(model, mc_droprate: float = 0.0,
                                   mc_model=None, block_b: int = 8,
                                   mxu_bf16: bool = False) -> Callable:
    """AL MC-dropout sweep with the CLEAN pass on the fused kernel; the
    stochastic passes (dropout needs the JAX RNG stream) stay on the flax
    model (or a bf16 mc_model clone).  Same stacked-output schema as
    make_infer_sweep_indexed."""
    from hual_tpu.ops.pallas.fused_forward import (encoder_inputs, fused_call,
                                                   pack_weights)
    from hual_tpu.ops.pallas.span_decode import span_decode_pallas

    stoch = mc_model if mc_model is not None else model
    # same reuse rule as make_infer_step: the clean logits can stand in for
    # the two "stochastic" passes only when NOTHING is stochastic at eval —
    # with the gumbel matching head enabled the reference samples noise in
    # every sess.run, so the passes must run live even at mc_droprate 0
    stochastic_eval = bool(getattr(model, "use_gumbel", False))

    def sweep(params, data, sels, word_vectors, rng):
        stacks, layout = pack_weights(params, model.attn_layer, model.dim)
        interp = jax.default_backend() != "tpu"
        idxs = jnp.arange(sels.shape[0], dtype=jnp.int32)

        def body(_, inp):
            sel, i = inp
            batch = gather_batch(data, sel, with_labels=False)
            vf, qf, vm, qm = encoder_inputs(model, params, batch,
                                            word_vectors)
            s, e, ms = fused_call(stacks, layout, vf, qf, vm, qm,
                                  attn_layer=model.attn_layer,
                                  num_heads=model.num_heads, tau=model.tau,
                                  use_gumbel=model.use_gumbel,
                                  block_b=block_b, mxu_bf16=mxu_bf16,
                                  interpret=interp)
            sidx, eidx = span_decode_pallas(s, e, vm, interpret=interp)
            if mc_droprate == 0.0 and not stochastic_eval:
                mc1 = mc2 = {"start_logits": s, "end_logits": e}
            else:
                r1, r2 = jax.random.split(jax.random.fold_in(rng, i))
                mc1 = stoch.apply(params, batch, word_vectors, mc_droprate,
                                  deterministic=False, rngs={"dropout": r1})
                mc2 = stoch.apply(params, batch, word_vectors, mc_droprate,
                                  deterministic=False, rngs={"dropout": r2})
            return None, {
                "match_scores": ms, "start_logits": s, "end_logits": e,
                "start_index": sidx, "end_index": eidx,
                "start_logits1": mc1["start_logits"],
                "end_logits1": mc1["end_logits"],
                "start_logits2": mc2["start_logits"],
                "end_logits2": mc2["end_logits"],
                "ious": device_ious(sidx, eidx, batch["s_ind"],
                                    batch["e_ind"], batch["video_seq_len"],
                                    batch["duration"]),
            }

        _, outs = jax.lax.scan(body, None, (sels, idxs))
        return outs

    return sweep
