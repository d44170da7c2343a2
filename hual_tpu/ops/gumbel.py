"""Gumbel sampling utilities (reference models/ops.py:6-56).

``gumbel_sample`` backs the optional gumbel path of the matching head
(disabled by default: ``no_gumbel: true`` in both reference configs);
``gumbel_softmax`` / ``gumbel_sigmoid`` / ``label_smoothing`` are part of the
reference op surface (defined there, unused by SeqPAN) and provided for API
completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_sample(rng, shape) -> jnp.ndarray:
    u = jax.random.uniform(rng, shape, minval=0.0, maxval=1.0)
    return -jnp.log(-jnp.log(u + 1e-20) + 1e-20)


def gumbel_softmax(rng, logits: jnp.ndarray, tau: float,
                   hard: bool = False) -> jnp.ndarray:
    noise = gumbel_sample(rng, logits.shape)
    y = jax.nn.softmax((logits + noise) / tau)
    if hard:
        y_hard = (y == jnp.max(y, axis=1, keepdims=True)).astype(y.dtype)
        y = jax.lax.stop_gradient(y_hard - y) + y
    return y


def gumbel_sigmoid(rng, logits: jnp.ndarray, tau: float,
                   hard: bool = False) -> jnp.ndarray:
    r1, r2 = jax.random.split(rng)
    u1 = jax.random.uniform(r1, logits.shape, minval=0.0, maxval=1.0)
    u2 = jax.random.uniform(r2, logits.shape, minval=0.0, maxval=1.0)
    noise = -jnp.log(jnp.log(u2 + 1e-20) / jnp.log(u1 + 1e-20) + 1e-20)
    y = jax.nn.sigmoid((logits + noise) / tau)
    if hard:
        y_hard = (y == jnp.max(y, axis=1, keepdims=True)).astype(y.dtype)
        y = jax.lax.stop_gradient(y_hard - y) + y
    return y


def label_smoothing(labels: jnp.ndarray, mask: jnp.ndarray,
                    epsilon: float = 0.1) -> jnp.ndarray:
    mask = mask.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    seq_len = jnp.sum(mask, axis=1)
    smooth = (1.0 - epsilon) * labels + (epsilon / seq_len)[:, None]
    return smooth * mask
