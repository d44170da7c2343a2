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


def test_model_span_decode_config_wiring():
    """SeqPAN(span_decode="pallas") produces the same indices as the XLA
    default (interpret mode off-TPU), through the real model wiring."""
    import jax

    from hual_tpu.models.seqpan import SeqPAN

    rng = np.random.default_rng(0)
    B, T, W, C, V = 4, 8, 6, 4, 16
    batch = {
        "video_features": rng.normal(size=(B, T, V)).astype(np.float32),
        "video_seq_len": rng.integers(2, T + 1, size=B).astype(np.int32),
        "word_ids": rng.integers(1, 20, size=(B, W)).astype(np.int32),
        "char_ids": rng.integers(0, 10, size=(B, W, C)).astype(np.int32),
        "duration": rng.uniform(10, 30, size=B).astype(np.float32),
    }
    wv = rng.normal(size=(25, 32)).astype(np.float32)
    outs = {}
    for decode in ("xla", "pallas"):
        model = SeqPAN(dim=16, num_heads=2, attn_layer=1, max_vlen=T,
                       word_dim=32, char_dim=4, num_chars=10,
                       span_decode=decode)
        params = model.init({"params": jax.random.key(0)}, batch, wv, 0.0,
                            deterministic=True)
        outs[decode] = jax.jit(
            lambda p, b, w, m=model: m.apply(p, b, w, 0.0,
                                             deterministic=True))(
            params, batch, wv)
    np.testing.assert_array_equal(np.asarray(outs["xla"]["start_index"]),
                                  np.asarray(outs["pallas"]["start_index"]))
    np.testing.assert_array_equal(np.asarray(outs["xla"]["end_index"]),
                                  np.asarray(outs["pallas"]["end_index"]))
    np.testing.assert_allclose(np.asarray(outs["xla"]["start_logits"]),
                               np.asarray(outs["pallas"]["start_logits"]),
                               rtol=0, atol=0)
