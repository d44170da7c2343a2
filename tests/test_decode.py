"""Span decode vs an independent numpy oracle."""

import jax.numpy as jnp
import numpy as np

from hual_tpu.ops.decode import span_decode
from hual_tpu.ops.masking import mask_logits, sequence_mask


def softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def oracle_decode(sl, el, mask):
    sp = softmax(np.where(mask > 0, sl, sl * 0 - 1e30), axis=1)
    ep = softmax(np.where(mask > 0, el, el * 0 - 1e30), axis=1)
    sidx, eidx = [], []
    for i in range(sl.shape[0]):
        outer = np.triu(np.outer(sp[i], ep[i]))
        sidx.append(int(np.argmax(outer.max(axis=1))))
        eidx.append(int(np.argmax(outer.max(axis=0))))
    return np.array(sidx), np.array(eidx)


def test_span_decode_matches_oracle():
    rng = np.random.default_rng(2)
    B, T = 8, 32
    sl = rng.normal(size=(B, T)).astype(np.float32)
    el = rng.normal(size=(B, T)).astype(np.float32)
    lens = rng.integers(2, T + 1, size=B).astype(np.int32)
    mask = np.asarray(sequence_mask(jnp.asarray(lens), T))
    si, ei = span_decode(jnp.asarray(sl), jnp.asarray(el), jnp.asarray(mask))
    osi, oei = oracle_decode(sl, el, mask)
    np.testing.assert_array_equal(np.asarray(si), osi)
    np.testing.assert_array_equal(np.asarray(ei), oei)
    # decoded span always ordered and within length
    assert np.all(np.asarray(si) <= np.asarray(ei))
    assert np.all(np.asarray(ei) < lens)


def test_mask_logits_value():
    x = jnp.ones((2, 3))
    m = jnp.asarray([[1, 1, 0], [1, 0, 0]])
    out = np.asarray(mask_logits(x, m))
    assert out[0, 0] == 1.0 and out[0, 2] == -1e30 and out[1, 1] == -1e30
