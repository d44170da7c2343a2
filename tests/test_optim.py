"""BERT-style AdamW numerics + decay-mask naming rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hual_tpu.ops.optim import _decay_mask, bert_adamw, make_optimizer


def test_decay_mask_names():
    params = {
        "encoder": {
            "q_layer_norm": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
            "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)},
            "pos_emb": {"position_embeddings": jnp.ones((8, 4))},
        }
    }
    mask = _decay_mask(params)
    assert mask["encoder"]["q_layer_norm"]["scale"] is False
    assert mask["encoder"]["q_layer_norm"]["bias"] is False
    assert mask["encoder"]["dense"]["kernel"] is True
    assert mask["encoder"]["dense"]["bias"] is False
    assert mask["encoder"]["pos_emb"]["position_embeddings"] is True


def test_bert_adamw_matches_manual():
    b1, b2, eps, wd = 0.9, 0.999, 1e-6, 0.01
    tx = bert_adamw(b1, b2, eps, wd)
    params = {"dense": {"kernel": jnp.array([1.0, -2.0]),
                        "bias": jnp.array([0.5])}}
    grads = {"dense": {"kernel": jnp.array([0.1, 0.2]),
                       "bias": jnp.array([-0.3])}}
    state = tx.init(params)
    # two steps
    p = params
    m = {"kernel": np.zeros(2), "bias": np.zeros(1)}
    v = {"kernel": np.zeros(2), "bias": np.zeros(1)}
    for _ in range(2):
        updates, state = tx.update(grads, state, p)
        # manual reference math (models/ops.py:166-187): no bias correction
        for name in ["kernel", "bias"]:
            g = np.asarray(grads["dense"][name])
            m[name] = b1 * m[name] + (1 - b1) * g
            v[name] = b2 * v[name] + (1 - b2) * g ** 2
            upd = m[name] / (np.sqrt(v[name]) + eps)
            if name == "kernel":  # decayed; 'bias' excluded
                upd = upd + wd * np.asarray(p["dense"][name])
            np.testing.assert_allclose(np.asarray(updates["dense"][name]),
                                       -upd, rtol=1e-6)
        p = jax.tree.map(lambda a, u: a + u, p, updates)


def test_make_optimizer_lr_injection_and_clip():
    tx = make_optimizer(clip_norm=1.0, weight_decay=0.0)
    params = {"w": jnp.array([1.0, 1.0])}
    state = tx.init(params)
    state.hyperparams["learning_rate"] = jnp.float32(0.1)
    grads = {"w": jnp.array([30.0, 40.0])}  # norm 50 -> clipped to 1
    updates, state = tx.update(grads, state, params)
    # after clipping, g = [0.6, 0.8]; m=(1-b1)*g; v=(1-b2)*g^2;
    # upd = m/(sqrt(v)+eps); scaled by lr -> -0.1*m/(sqrt(v)+eps)
    g = np.array([0.6, 0.8])
    m = 0.1 * g
    v = 0.001 * g ** 2
    want = -0.1 * m / (np.sqrt(v) + 1e-6)
    np.testing.assert_allclose(np.asarray(updates["w"]), want, rtol=1e-5)
