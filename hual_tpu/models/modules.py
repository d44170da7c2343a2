"""Model modules (reference models/modules.py).

All weight sharing that the reference expresses through TF1 ``reuse=True``
(pos-emb + conv-block shared between video and query streams; dual-attention
blocks shared across both directions; feature encoder shared between start
and end) is expressed here by calling one module instance multiple times.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from hual_tpu.models.initializers import glorot_uniform_tf, zeros
from hual_tpu.models.layers import (Conv1D, DepthwiseSeparableConv,
                                    DualMultiheadAttention, LayerNorm, dropout)
from hual_tpu.ops.masking import attention_bias


class WordEmbedding(nn.Module):
    """Frozen GloVe rows + trainable UNK + zero PAD (reference
    models/modules.py:8-16).  The GloVe matrix is passed at call time so it
    is a device buffer, not a baked-in constant."""

    word_dim: int

    @nn.compact
    def __call__(self, word_ids, word_vectors, drop_rate, deterministic: bool):
        unk = self.param("unk", glorot_uniform_tf, (1, self.word_dim))
        table = jnp.concatenate(
            [jnp.zeros((1, self.word_dim), jnp.float32), unk, word_vectors], axis=0)
        emb = jnp.take(table, word_ids, axis=0)
        return dropout(self, emb, drop_rate, deterministic)


class CharEmbedding(nn.Module):
    """Char table + per-word char CNN, max-pool over chars (reference
    models/modules.py:19-38).  kernels [1,2,3,4] x filters [10,20,30,40]."""

    char_size: int
    dim: int
    kernels: Sequence[int] = (1, 2, 3, 4)
    filters: Sequence[int] = (10, 20, 30, 40)

    @nn.compact
    def __call__(self, char_ids, drop_rate, deterministic: bool):
        table = self.param("char_table", glorot_uniform_tf,
                           (self.char_size - 1, self.dim))
        full = jnp.concatenate([jnp.zeros((1, self.dim), jnp.float32), table], axis=0)
        emb = jnp.take(full, char_ids, axis=0)            # (B, W, C, dim)
        emb = dropout(self, emb, drop_rate, deterministic)
        outs = []
        for i, (k, ch) in enumerate(zip(self.kernels, self.filters)):
            w = self.param(f"filter_{i}", glorot_uniform_tf, (1, k, self.dim, ch))
            b = self.param(f"bias_{i}", zeros, (ch,))
            # VALID conv over the char axis only
            conv = jax.lax.conv_general_dilated(
                emb, w.astype(emb.dtype), window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            conv = jax.nn.relu(conv + b.astype(emb.dtype))
            outs.append(jnp.max(conv, axis=2))            # (B, W, ch)
        return jnp.concatenate(outs, axis=-1)             # (B, W, sum(filters))


class PositionalEmbedding(nn.Module):
    """Learned absolute positions, sliced to the sequence length (reference
    models/modules.py:41-56)."""

    max_pos_len: int
    dim: int

    @nn.compact
    def __call__(self, x):
        seq_len = x.shape[1]
        assert seq_len <= self.max_pos_len, (seq_len, self.max_pos_len)
        table = self.param("position_embeddings", glorot_uniform_tf,
                           (self.max_pos_len, self.dim))
        return x + table[None, :seq_len, :].astype(x.dtype)


class ConvBlock(nn.Module):
    """4 x {LN -> depthwise-separable conv(k=7) -> dropout + residual}
    (reference models/modules.py:59-70)."""

    dim: int
    kernel_size: int = 7
    num_layers: int = 4

    @nn.compact
    def __call__(self, x, drop_rate, deterministic: bool):
        for i in range(self.num_layers):
            residual = x
            x = LayerNorm(name=f"layer_norm_{i}")(x)
            x = DepthwiseSeparableConv(self.dim, self.kernel_size,
                                       name=f"depthwise_conv_layers_{i}")(x)
            x = dropout(self, x, drop_rate, deterministic) + residual
        return x


class DualAttnBlock(nn.Module):
    """Pre-LN dual attention + FFN with residuals (reference
    models/modules.py:73-89)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, from_tensor, to_tensor, from_mask, to_mask, drop_rate,
                 deterministic: bool):
        out = LayerNorm(name="layer_norm_1")(from_tensor)
        to_n = LayerNorm(name="layer_norm_t")(to_tensor)
        out = DualMultiheadAttention(self.dim, self.num_heads,
                                     name="dual_multihead_attention")(
            out, to_n, from_mask, to_mask, drop_rate, deterministic)
        out = Conv1D(self.dim, use_bias=True, name="dense_1")(out)
        residual = dropout(self, out, drop_rate, deterministic) + from_tensor
        out = LayerNorm(name="layer_norm_2")(residual)
        out = dropout(self, out, drop_rate, deterministic)
        out = Conv1D(self.dim, use_bias=True, name="dense_2")(out)
        return dropout(self, out, drop_rate, deterministic) + residual


class TopSelfAttention(nn.Module):
    """Plain multi-head self-attention (reference models/modules.py:92-129)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask, drop_rate, deterministic: bool):
        import math
        h, hd = self.num_heads, self.dim // self.num_heads
        b, t, _ = x.shape

        def split(y):
            return y.reshape(b, t, h, hd).transpose(0, 2, 1, 3)

        q = split(Conv1D(self.dim, True, name="query")(x))
        k = split(Conv1D(self.dim, True, name="key")(x))
        v = split(Conv1D(self.dim, True, name="value")(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(float(hd))
        probs = jax.nn.softmax(scores + attention_bias(mask, mask), axis=-1)
        probs = dropout(self, probs, drop_rate, deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return out.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


class FeatureEncoder(nn.Module):
    """pos-emb -> conv-block -> LN -> self-attn -> FFN with residuals
    (reference models/modules.py:132-151)."""

    dim: int
    num_heads: int
    max_pos_len: int

    @nn.compact
    def __call__(self, x, mask, drop_rate, attn_drop, deterministic: bool):
        feats = PositionalEmbedding(self.max_pos_len, self.dim, name="pos_emb")(x)
        feats = ConvBlock(self.dim, name="conv_block")(feats, drop_rate, deterministic)
        out = LayerNorm(name="layer_norm_1")(feats)
        out = dropout(self, out, drop_rate, deterministic)
        out = TopSelfAttention(self.dim, self.num_heads, name="top_self_attention")(
            out, mask, attn_drop, deterministic)
        residual = dropout(self, out, drop_rate, deterministic) + feats
        out = LayerNorm(name="layer_norm_2")(residual)
        out = dropout(self, out, drop_rate, deterministic)
        out = Conv1D(self.dim, use_bias=True, name="dense")(out)
        return dropout(self, out, drop_rate, deterministic) + residual


class ConditionedPredictor(nn.Module):
    """Start/end span logits; one FeatureEncoder instance shared between the
    start pass and the (start-conditioned) end pass (reference
    models/modules.py:154-173)."""

    dim: int
    num_heads: int
    max_pos_len: int

    def setup(self):
        self.feature_encoder = FeatureEncoder(self.dim, self.num_heads,
                                              self.max_pos_len)
        self.start_layer_norm = LayerNorm()
        self.end_layer_norm = LayerNorm()
        self.start_hidden = Conv1D(self.dim, use_bias=True,
                                   activation=jax.nn.relu)
        self.end_hidden = Conv1D(self.dim, use_bias=True, activation=jax.nn.relu)
        self.start_dense = Conv1D(1, use_bias=True)
        self.end_dense = Conv1D(1, use_bias=True)

    def __call__(self, x, mask, drop_rate, attn_drop, deterministic: bool):
        start_feats = self.feature_encoder(x, mask, drop_rate, attn_drop,
                                           deterministic)
        end_feats = self.feature_encoder(start_feats, mask, drop_rate,
                                         attn_drop, deterministic)
        start_feats = self.start_layer_norm(start_feats)
        end_feats = self.end_layer_norm(end_feats)
        start_feats = self.start_hidden(jnp.concatenate([start_feats, x], axis=-1))
        end_feats = self.end_hidden(jnp.concatenate([end_feats, x], axis=-1))
        start_logits = jnp.squeeze(self.start_dense(start_feats), axis=-1)
        end_logits = jnp.squeeze(self.end_dense(end_feats), axis=-1)
        return start_logits, end_logits
