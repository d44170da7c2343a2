"""Fused Pallas span-decode kernel.

Computes, per batch row, entirely in VMEM (no (B, T, T) outer-product tensor
ever hits HBM):

    s_prob = softmax(mask(start_logits));  e_prob = softmax(mask(end_logits))
    outer  = triu(s_prob ⊗ e_prob)
    start  = argmax_i max_j outer;  end = argmax_j max_i outer

which is the reference ans_predictor (models/layers.py:194-203).  The XLA
path (hual_tpu.ops.decode.span_decode) materializes the (B, T, T) outer
product in HBM; the fused kernel keeps HBM traffic at O(B*T) — it matters
for the full-train-set inference sweeps where B is large.

Grid: one program per 8-row batch tile (TPU sublane granularity); the
(8, T, T) outer product lives in registers/VMEM only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hual_tpu.ops.masking import MASK_VALUE

_BLOCK_B = 8


def _span_decode_kernel(s_ref, e_ref, mask_ref, sidx_ref, eidx_ref):
    T = s_ref.shape[1]
    mask = mask_ref[...].astype(jnp.float32)                      # (8, T)
    bias = (1.0 - mask) * MASK_VALUE

    s_prob = jax.nn.softmax(s_ref[...] * mask + bias, axis=-1)
    e_prob = jax.nn.softmax(e_ref[...] * mask + bias, axis=-1)

    outer = s_prob[:, :, None] * e_prob[:, None, :]               # (8, T, T)
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    outer = jnp.where((rows <= cols)[None], outer, 0.0)           # triu

    sidx_ref[...] = jnp.argmax(jnp.max(outer, axis=2), axis=1
                               ).astype(jnp.int32)[:, None]
    eidx_ref[...] = jnp.argmax(jnp.max(outer, axis=1), axis=1
                               ).astype(jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def span_decode_pallas(start_logits: jnp.ndarray, end_logits: jnp.ndarray,
                       mask: jnp.ndarray, interpret: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for hual_tpu.ops.decode.span_decode.

    Pads the batch up to a multiple of 8 (TPU sublane tile) if needed.
    """
    B, T = start_logits.shape
    pad = (-B) % _BLOCK_B
    if pad:
        start_logits = jnp.pad(start_logits, ((0, pad), (0, 0)))
        end_logits = jnp.pad(end_logits, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)), constant_values=1)
    Bp = B + pad

    blk = lambda i: (i, 0)
    sidx, eidx = pl.pallas_call(
        _span_decode_kernel,
        grid=(Bp // _BLOCK_B,),
        in_specs=[
            pl.BlockSpec((_BLOCK_B, T), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_B, T), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_B, T), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BLOCK_B, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_B, 1), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(start_logits, end_logits, mask)
    return sidx[:B, 0], eidx[:B, 0]
