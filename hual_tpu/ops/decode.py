"""Span decoding: argmax over the upper-triangular start⊗end probability grid.

Reference ans_predictor (models/layers.py:194-203): softmax the masked
start/end logits, outer-product them, keep the upper triangle (s <= e), and
take the row/col argmax of the max-reduced matrix.  Here it is one batched
jnp expression (and there is a fused Pallas variant in
hual_tpu.ops.pallas.span_decode for larger T).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hual_tpu.ops.masking import mask_logits


def span_decode(start_logits: jnp.ndarray, end_logits: jnp.ndarray,
                mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (start_index, end_index), each (B,) int32.

    start_logits/end_logits: (B, T); mask: (B, T) 0/1 validity.
    """
    start_prob = jax.nn.softmax(mask_logits(start_logits, mask), axis=1)
    end_prob = jax.nn.softmax(mask_logits(end_logits, mask), axis=1)
    outer = start_prob[:, :, None] * end_prob[:, None, :]          # (B, T, T)
    T = outer.shape[-1]
    band = jnp.triu(jnp.ones((T, T), dtype=outer.dtype))
    outer = outer * band[None]
    start_index = jnp.argmax(jnp.max(outer, axis=2), axis=1).astype(jnp.int32)
    end_index = jnp.argmax(jnp.max(outer, axis=1), axis=1).astype(jnp.int32)
    return start_index, end_index
