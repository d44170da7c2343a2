"""Fused Pallas span-decode kernel.

Computes, per batch element, entirely in VMEM (no (B, T, T) outer-product
tensor ever hits HBM):

    s_prob = softmax(mask(start_logits));  e_prob = softmax(mask(end_logits))
    outer  = triu(s_prob ⊗ e_prob)
    start  = argmax_i max_j outer;  end = argmax_j max_i outer

which is the reference ans_predictor (models/layers.py:194-203).  The XLA
path (hual_tpu.ops.decode.span_decode) materializes the (B, T, T) outer
product; at T=64 that is 16 KB/row and XLA fuses it well, but at longer
sequences (anet T=100+, or higher-resolution clips) the fused kernel keeps
the decode O(T) in HBM traffic instead of O(T^2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hual_tpu.ops.masking import MASK_VALUE


def _span_decode_kernel(s_ref, e_ref, mask_ref, sidx_ref, eidx_ref):
    # (1, T) blocks for one batch row
    T = s_ref.shape[1]
    mask = mask_ref[0, :].astype(jnp.float32)
    bias = (1.0 - mask) * MASK_VALUE

    s = s_ref[0, :] * mask + bias
    e = e_ref[0, :] * mask + bias
    s_prob = jax.nn.softmax(s, axis=-1)
    e_prob = jax.nn.softmax(e, axis=-1)

    outer = s_prob[:, None] * e_prob[None, :]                     # (T, T) VPU
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    outer = jnp.where(rows <= cols, outer, 0.0)                   # triu

    row_max = jnp.max(outer, axis=1)                              # (T,)
    col_max = jnp.max(outer, axis=0)
    sidx_ref[0, 0] = jnp.argmax(row_max, axis=0).astype(jnp.int32)
    eidx_ref[0, 0] = jnp.argmax(col_max, axis=0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def span_decode_pallas(start_logits: jnp.ndarray, end_logits: jnp.ndarray,
                       mask: jnp.ndarray, interpret: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for hual_tpu.ops.decode.span_decode."""
    B, T = start_logits.shape
    grid = (B,)
    blk = lambda i: (i, 0)
    sidx, eidx = pl.pallas_call(
        _span_decode_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T), blk, memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, T), blk, memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, T), blk, memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), blk, memory_space=pltpu.ANY if interpret else pltpu.SMEM),
            pl.BlockSpec((1, 1), blk, memory_space=pltpu.ANY if interpret else pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(start_logits, end_logits, mask)
    return sidx[:, 0], eidx[:, 0]
