"""BERT-style AdamW matching the reference optimizer exactly.

Reference AdamWeightDecayOptimizer (models/ops.py:137-204):
  m = b1*m + (1-b1)*g;  v = b2*v + (1-b2)*g^2          (NO bias correction)
  update = m / (sqrt(v) + eps) [+ wd * param if decayed]
  param -= lr * update
with global-norm gradient clipping applied first (models/ops.py:126-127) and
weight decay excluded for names matching ['LayerNorm', 'layer_norm', 'bias']
(models/ops.py:122-123).  optax.adamw applies bias correction and a different
eps placement, so we implement the transform directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class BertAdamState(NamedTuple):
    mu: optax.Updates
    nu: optax.Updates


def count_params(params) -> int:
    """Total trainable parameter count (reference count_params,
    models/ops.py:59-63)."""
    return int(sum(x.size for x in jax.tree.leaves(params)))


def _decay_mask(params) -> optax.Params:
    """True where weight decay applies: path has no 'layer_norm'/'bias' part."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decayed(path) -> bool:
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        full = "/".join(str(n) for n in names).lower()
        return "layer_norm" not in full and "bias" not in full

    masks = [decayed(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, masks)


def bert_adamw(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
               weight_decay: float = 0.01) -> optax.GradientTransformation:
    """Produces *negative* parameter deltas (optax convention: p += update)."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return BertAdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        assert params is not None, "bert_adamw requires params"
        mask = _decay_mask(params)
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
                          state.nu, grads)

        def delta(m, v, p, use_decay):
            upd = m / (jnp.sqrt(v) + eps)
            if use_decay:
                upd = upd + weight_decay * p
            return -upd

        updates = jax.tree.map(delta, mu, nu, params, mask)
        return updates, BertAdamState(mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(clip_norm: float = 1.0, weight_decay: float = 0.01
                   ) -> optax.GradientTransformation:
    """clip-by-global-norm -> BERT AdamW -> scale by the (dynamic) lr.

    The learning rate follows the reference's linear decay
    ``lr * (1 - epoch/epochs)`` (main.py:61) and is injected per step via
    optax.inject_hyperparams so one compiled train step serves all epochs.
    """
    @optax.inject_hyperparams
    def _opt(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(clip_norm),
            bert_adamw(weight_decay=weight_decay),
            optax.scale(learning_rate),
        )

    return _opt(learning_rate=0.0)
