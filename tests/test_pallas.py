"""Pallas span-decode kernel vs the XLA path (interpret mode on CPU; the
same kernel is compiled-and-verified on the real chip by bench/driver runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hual_tpu.ops.decode import span_decode
from hual_tpu.ops.masking import sequence_mask
from hual_tpu.ops.pallas.span_decode import span_decode_pallas


@pytest.mark.parametrize("B,T", [(16, 64), (13, 100), (8, 16)])
def test_pallas_matches_xla(B, T):
    rng = np.random.default_rng(B * T)
    sl = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
    el = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
    lens = jnp.asarray(rng.integers(2, T + 1, size=B).astype(np.int32))
    mask = sequence_mask(lens, T)
    s1, e1 = span_decode(sl, el, mask)
    s2, e2 = span_decode_pallas(sl, el, mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
