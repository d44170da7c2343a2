"""Masking primitives (reference models/ops.py:80-116).

All sequences are fixed length on TPU; validity is carried as int/bool masks
and applied with the reference's additive -1e30 convention (``mask_logits``,
reference models/ops.py:89-91) so softmaxes over padded positions are
numerically identical to the reference's batch-max-length graphs.
"""

from __future__ import annotations

import jax.numpy as jnp

MASK_VALUE = -1e30


def sequence_mask(lengths: jnp.ndarray, maxlen: int, dtype=jnp.int32) -> jnp.ndarray:
    """(B,) lengths -> (B, maxlen) 0/1 mask (tf.sequence_mask equivalent)."""
    pos = jnp.arange(maxlen, dtype=lengths.dtype)[None, :]
    return (pos < lengths[:, None]).astype(dtype)


def mask_logits(inputs: jnp.ndarray, mask: jnp.ndarray,
                mask_value: float = MASK_VALUE) -> jnp.ndarray:
    """inputs*mask + mask_value*(1-mask), mask broadcastable to inputs."""
    mask = mask.astype(inputs.dtype)
    return inputs * mask + mask_value * (1.0 - mask)


def attention_bias(from_mask: jnp.ndarray, to_mask: jnp.ndarray) -> jnp.ndarray:
    """(B,1,F,T) additive bias: (1 - from_mask⊗to_mask) * -1e30.

    Equivalent to reference create_attention_mask (models/ops.py:80-87)
    followed by ``scores += (1-mask)*-1e30``.
    """
    pair = (from_mask[:, :, None] * to_mask[:, None, :]).astype(jnp.float32)
    return ((1.0 - pair) * MASK_VALUE)[:, None, :, :]
