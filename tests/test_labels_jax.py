"""On-device label synthesis vs the NumPy path (which is itself oracle-tested
against the reference semantics in test_labels.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hual_tpu.data.labels import make_span_labels
from hual_tpu.data.labels_jax import make_span_labels_jax


@pytest.mark.parametrize("seed,T", [(0, 64), (1, 100), (2, 16)])
def test_jax_labels_match_numpy(seed, T):
    rng = np.random.default_rng(seed)
    n = 128
    vl = rng.integers(1, T + 1, size=n)
    s = (rng.uniform(0, 1, n) * vl).astype(np.int64)
    e = np.minimum(s + (rng.uniform(0, 1, n) * (vl - s)).astype(np.int64), vl - 1)
    s = np.minimum(s, e)
    a = make_span_labels(s, e, vl, T)
    b = make_span_labels_jax(jnp.asarray(s), jnp.asarray(e), jnp.asarray(vl), T)
    # soft labels: float32 vs float64-then-cast; agreement to 1e-6 rel
    np.testing.assert_allclose(a[0], np.asarray(b[0]), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(a[1], np.asarray(b[1]), rtol=1e-6, atol=1e-9)
    # integer labels exact
    np.testing.assert_array_equal(a[2], np.asarray(b[2]))
    np.testing.assert_array_equal(a[3], np.asarray(b[3]).astype(np.int32))


def test_jax_labels_edge_single_frame():
    y1, y2, match, inner = make_span_labels_jax(
        jnp.asarray([0]), jnp.asarray([0]), jnp.asarray([1]), 8)
    a = make_span_labels(np.array([0]), np.array([0]), np.array([1]), 8)
    np.testing.assert_allclose(a[0], np.asarray(y1), rtol=1e-6)
    assert int(match[0, 0]) == 3
    assert float(inner.sum()) == 0.0
