"""Neural building blocks (reference models/layers.py, models/ops.py).

flax.linen re-designs of the reference TF1 layers.  Everything is fixed-shape
and mask-aware; dropout takes the rate as a *traced* scalar so one compiled
graph serves train (0.2), clean eval (0.0) and MC-dropout (0.5) passes.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from hual_tpu.models.initializers import glorot_uniform_tf, ones, orthogonal, zeros
from hual_tpu.ops.masking import attention_bias, mask_logits


def dropout(module: nn.Module, x: jnp.ndarray, rate, deterministic: bool) -> jnp.ndarray:
    """Inverted dropout with a dynamic rate (tf.nn.dropout semantics).

    ``rate`` may be a scalar or a per-sample vector of shape (batch,): the
    folded MC-dropout inference path (runtime/steps.py make_infer_step)
    concatenates the clean and stochastic passes into one forward and gives
    the clean rows rate 0 — bernoulli(p=1) keeps everything, so those rows
    are bitwise identical to a deterministic pass."""
    if deterministic:
        return x
    rng = module.make_rng("dropout")
    r = jnp.asarray(rate)
    if r.ndim == 1:  # per-sample rates, broadcast over trailing axes
        r = r.reshape(r.shape[0], *([1] * (x.ndim - 1)))
    keep = jax.random.bernoulli(rng, 1.0 - r, x.shape)
    inv = (1.0 / (1.0 - r)).astype(x.dtype)  # keep bf16 activations bf16
    return jnp.where(keep, x * inv, jnp.zeros_like(x))


class LayerNorm(nn.Module):
    """Reference layer_norm (models/layers.py:7-18): eps=1e-6, scale+bias."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param("scale", ones, (dim,))
        bias = self.param("bias", zeros, (dim,))
        xf = x.astype(jnp.float32)  # stats in f32 under bf16 compute
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        variance = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        norm = (xf - mean) * jax.lax.rsqrt(variance + 1e-6)
        return (norm * scale + bias).astype(x.dtype)


class Conv1D(nn.Module):
    """kernel-size-1 conv == dense over the last axis (reference
    models/layers.py:21-29).  Lowers to a single MXU matmul."""

    dim: int
    use_bias: bool = False
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", glorot_uniform_tf, (1, x.shape[-1], self.dim))
        out = jnp.einsum("...d,df->...f", x, kernel[0].astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            out = out + self.param("bias", zeros, (1, 1, self.dim)).astype(x.dtype)
        return out if self.activation is None else self.activation(out)


class DepthwiseSeparableConv(nn.Module):
    """k=7 depthwise over time + 1x1 pointwise + bias + relu (reference
    models/layers.py:32-45).  Runs on (B, T, D) directly (the reference
    inserts a dummy width axis for tf.nn.separable_conv2d)."""

    dim: int
    kernel_size: int = 7
    use_bias: bool = True
    activation: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        depthwise = self.param("depthwise_filter", glorot_uniform_tf,
                               (self.kernel_size, 1, d_in, 1))
        pointwise = self.param("pointwise_filter", glorot_uniform_tf,
                               (1, 1, d_in, self.dim))
        # depthwise conv over time, SAME padding
        dw = jax.lax.conv_general_dilated(
            x, depthwise[:, 0, :, :].transpose(0, 2, 1).astype(x.dtype),
            window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=d_in,
        )
        out = jnp.einsum("btd,df->btf", dw, pointwise[0, 0].astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            out = out + self.param("bias", zeros, (self.dim,)).astype(x.dtype)
        return self.activation(out)


class Bilinear(nn.Module):
    """Two bias-free dense projections summed + bias (reference
    models/layers.py:48-56)."""

    dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        out = (Conv1D(self.dim, use_bias=False, name="dense_1")(x1)
               + Conv1D(self.dim, use_bias=False, name="dense_2")(x2))
        if self.use_bias:
            out = out + self.param("bias", zeros, (self.dim,)).astype(out.dtype)
        return out


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


class DualMultiheadAttention(nn.Module):
    """The SeqPAN core op (reference models/layers.py:59-111).

    One query projection attends over *both* the from-stream (self) and the
    to-stream (cross); the two attended values are cross-gated with sigmoid
    gates, fused by a dense layer, and gated once more through two bilinear
    heads: out = sigmoid(mask(bilinear1)) * bilinear2.
    """

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, from_tensor, to_tensor, from_mask, to_mask, drop_rate,
                 deterministic: bool):
        h, hd = self.num_heads, self.dim // self.num_heads
        if self.dim % self.num_heads != 0:
            raise ValueError(f"dim {self.dim} not divisible by heads {self.num_heads}")
        query = _split_heads(Conv1D(self.dim, True, name="query")(from_tensor), h)
        f_key = _split_heads(Conv1D(self.dim, True, name="f_key")(from_tensor), h)
        f_value = _split_heads(Conv1D(self.dim, True, name="f_value")(from_tensor), h)
        t_key = _split_heads(Conv1D(self.dim, True, name="t_key")(to_tensor), h)
        t_value = _split_heads(Conv1D(self.dim, True, name="t_value")(to_tensor), h)

        scale = 1.0 / math.sqrt(float(hd))

        def attend(key, value, bias):
            scores = jnp.einsum("bhqd,bhkd->bhqk", query, key,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(scores + bias, axis=-1)  # f32
            probs = dropout(self, probs, drop_rate, deterministic)
            return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(value.dtype),
                              value,
                              preferred_element_type=jnp.float32
                              ).astype(value.dtype)

        s_out = _merge_heads(attend(f_key, f_value, attention_bias(from_mask, from_mask)))
        x_out = _merge_heads(attend(t_key, t_value, attention_bias(from_mask, to_mask)))
        s_value = Conv1D(self.dim, True, name="s_dense")(s_out)
        x_value = Conv1D(self.dim, True, name="x_dense")(x_out)

        # cross gating
        s_gate = Conv1D(self.dim, True, activation=jax.nn.sigmoid, name="s_gate")(s_value)
        x_gate = Conv1D(self.dim, True, activation=jax.nn.sigmoid, name="x_gate")(x_value)
        outputs = s_gate * x_value + x_gate * s_value
        outputs = Conv1D(self.dim, True, name="guided_dense")(outputs)
        scores = Bilinear(self.dim, name="bilinear_1")(from_tensor, outputs)
        values = Bilinear(self.dim, name="bilinear_2")(from_tensor, outputs)
        return jax.nn.sigmoid(mask_logits(scores, from_mask[:, :, None])) * values


class TrilinearAttention(nn.Module):
    """QANet-style trilinear similarity (reference models/ops.py:94-116)."""

    @nn.compact
    def __call__(self, x1, x2, drop_rate, deterministic: bool):
        d = x1.shape[-1]
        w0 = self.param("linear_kernel4arg0", glorot_uniform_tf, (d, 1))
        w1 = self.param("linear_kernel4arg1", glorot_uniform_tf, (d, 1))
        wm = self.param("linear_kernel4mul", glorot_uniform_tf, (1, 1, d))
        d1 = dropout(self, x1, drop_rate, deterministic)
        d2 = dropout(self, x2, drop_rate, deterministic)
        dt = x1.dtype
        sub0 = jnp.einsum("bld,do->blo", d1, w0.astype(dt),
                          preferred_element_type=jnp.float32)       # (B,L1,1)
        sub1 = jnp.einsum("bld,do->blo", d2, w1.astype(dt),
                          preferred_element_type=jnp.float32)       # (B,L2,1)
        sub2 = jnp.einsum("bld,bmd->blm", d1 * wm.astype(dt), d2,
                          preferred_element_type=jnp.float32)       # (B,L1,L2)
        return sub0 + sub1.transpose(0, 2, 1) + sub2   # f32 similarity


class CQAttention(nn.Module):
    """Context-query attention (reference models/layers.py:114-130)."""

    dim: int

    @nn.compact
    def __call__(self, inputs1, inputs2, mask1, mask2, drop_rate,
                 deterministic: bool):
        score = TrilinearAttention(name="efficient_trilinear")(
            inputs1, inputs2, drop_rate, deterministic)             # (B,L1,L2)
        score_ = jax.nn.softmax(mask_logits(score, mask2[:, None, :]), axis=-1)
        score_t = jax.nn.softmax(mask_logits(score, mask1[:, :, None]), axis=1)
        score_t = score_t.transpose(0, 2, 1)
        dt = inputs1.dtype
        c2q = jnp.einsum("blm,bmd->bld", score_.astype(dt), inputs2,
                         preferred_element_type=jnp.float32).astype(dt)
        q2c = jnp.einsum("blm,bmn,bnd->bld", score_.astype(dt),
                         score_t.astype(dt), inputs1,
                         preferred_element_type=jnp.float32).astype(dt)
        att = jnp.concatenate([inputs1, c2q, inputs1 * c2q, inputs1 * q2c], axis=-1)
        out = Conv1D(self.dim, use_bias=False, name="dense")(att)
        return out, score


class WeightedPooling(nn.Module):
    """Attention-pool a sequence to one vector (reference models/layers.py:133-143)."""

    @nn.compact
    def __call__(self, inputs, mask):
        d = inputs.shape[-1]
        weight = self.param("weight", glorot_uniform_tf, (d, 1))
        x = jnp.einsum("bld,do->blo", inputs, weight.astype(inputs.dtype),
                       preferred_element_type=jnp.float32)          # (B,L,1)
        alphas = jax.nn.softmax(mask_logits(x, mask[:, :, None]), axis=1)
        return jnp.einsum("bld,blo->bd", inputs, alphas.astype(inputs.dtype),
                          preferred_element_type=jnp.float32
                          ).astype(inputs.dtype)


class CQConcat(nn.Module):
    """Pool query, tile along video, concat+dense (reference models/layers.py:146-154)."""

    dim: int

    @nn.compact
    def __call__(self, inputs, pool_inputs, pool_mask):
        pooled = WeightedPooling(name="weighted_pooling")(pool_inputs, pool_mask)
        tiled = jnp.broadcast_to(pooled[:, None, :],
                                 (inputs.shape[0], inputs.shape[1], pooled.shape[-1]))
        out = jnp.concatenate([inputs, tiled], axis=-1)
        return Conv1D(self.dim, use_bias=True, name="dense")(out)


class MatchingHead(nn.Module):
    """Per-frame 4-class logits + masked CE (reference models/layers.py:157-174)."""

    label_size: int = 4
    tau: float = 0.3
    gumbel: bool = False

    @nn.compact
    def __call__(self, inputs, labels, mask, deterministic: bool):
        logits = Conv1D(self.label_size, use_bias=True,
                        name="dense")(inputs).astype(jnp.float32)
        onehot = jax.nn.one_hot(labels, self.label_size, axis=-1, dtype=logits.dtype)
        if self.gumbel:
            # the reference applies gumbel noise + 1/tau sharpening in EVERY
            # pass — train, eval and inference alike (matching_loss has no
            # mode switch, reference models/layers.py:163-165).  Deterministic
            # passes here have no RNG stream (TF's stateful noise cannot be
            # replayed anyway, docs/PARITY.md), so they keep the
            # deterministic part of the transform: the 1/tau sharpening.
            if not deterministic:
                u = jax.random.uniform(self.make_rng("dropout"), logits.shape)
                logits = logits - jnp.log(-jnp.log(u + 1e-20) + 1e-20)
            logits = logits / self.tau
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        probs = jax.nn.softmax(logits, axis=-1)
        per_pos = -jnp.sum(onehot * log_probs, axis=-1)
        m = mask.astype(logits.dtype)
        loss = jnp.sum(per_pos * m) / (jnp.sum(m) + 1e-12)
        return loss, probs


def localizing_loss(start_logits, end_logits, y1, y2, mask):
    """Masked softmax-CE vs soft labels (reference models/layers.py:177-191)."""
    sl = mask_logits(start_logits, mask)
    el = mask_logits(end_logits, mask)
    start_losses = -jnp.sum(y1 * jax.nn.log_softmax(sl, axis=-1), axis=-1)
    end_losses = -jnp.sum(y2 * jax.nn.log_softmax(el, axis=-1), axis=-1)
    return jnp.mean(start_losses + end_losses)


def _l2_normalize(x, axis=-1, eps=1e-12):
    # tf.nn.l2_normalize: x * rsqrt(max(sum(x^2), eps))
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


def _kl_for_log_probs(log_p, log_q):
    """Reference kl_for_log_probs (models/layers.py:239-244).  NOTE: callers
    pass raw probabilities as ``log_q`` — a reference quirk kept verbatim."""
    p = jnp.exp(log_p)
    return jnp.sum(p * log_p, axis=-1) - jnp.sum(p * log_q, axis=-1)


def alignment_loss(tfeat, vfeat, tmask, vmask, inner_label):
    """Video-level contrastive KL (reference lossfun_aligment,
    models/layers.py:205-248), quirks included: the query mean-pool sums over
    padded positions, and kl_for_log_probs receives probabilities where
    log-probabilities are expected."""
    tsum = jnp.sum(tfeat, axis=1)                                   # (B, D)
    tcount = jnp.sum(tmask, axis=1, keepdims=True).astype(tsum.dtype)
    tfeat_n = _l2_normalize(tsum / tcount, axis=1)

    vm = vmask.astype(inner_label.dtype)
    frame_w = inner_label / jnp.sum(vm, axis=1, keepdims=True)
    vsum = jnp.sum(vfeat * frame_w[:, :, None], axis=1)
    vfeat_n = _l2_normalize(vsum, axis=1)

    video_sim = jax.nn.softmax(vfeat_n @ vfeat_n.T, axis=-1)
    query_sim = jax.nn.softmax(tfeat_n @ vfeat_n.T, axis=-1)
    kl = (_kl_for_log_probs(jnp.log(query_sim), video_sim)
          + _kl_for_log_probs(jnp.log(video_sim), query_sim))
    return jnp.sum(kl)
