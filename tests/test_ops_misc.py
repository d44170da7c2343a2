import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hual_tpu.data.tokenize import tokenize
from hual_tpu.ops.gumbel import (gumbel_sample, gumbel_sigmoid,
                                 gumbel_softmax, label_smoothing)
from hual_tpu.ops.masking import attention_bias, sequence_mask


def test_tokenize_reference_style():
    assert tokenize("Person takes a DRINK from the cup.\n") == \
        ["person", "takes", "a", "drink", "from", "the", "cup", "."]
    assert tokenize("a person's book, opened.") == \
        ["a", "person", "'s", "book", ",", "opened", "."]


def test_sequence_mask():
    m = np.asarray(sequence_mask(jnp.asarray([0, 2, 5]), 5))
    assert m.tolist() == [[0, 0, 0, 0, 0], [1, 1, 0, 0, 0], [1, 1, 1, 1, 1]]


def test_attention_bias_shape_and_values():
    fm = jnp.asarray([[1, 1, 0]])
    tm = jnp.asarray([[1, 0]])
    bias = np.asarray(attention_bias(fm, tm))
    assert bias.shape == (1, 1, 3, 2)
    assert bias[0, 0, 0, 0] == 0.0
    assert bias[0, 0, 0, 1] == -1e30     # masked to-position
    assert bias[0, 0, 2, 0] == -1e30     # masked from-position


def test_gumbel_sample_distribution():
    g = gumbel_sample(jax.random.key(0), (20000,))
    # standard Gumbel mean = Euler-Mascheroni ~ 0.5772
    assert float(jnp.mean(g)) == pytest.approx(0.5772, abs=0.05)


def test_gumbel_softmax_hard_is_onehot():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 6)))
    y = gumbel_softmax(jax.random.key(1), logits, tau=0.5, hard=True)
    s = np.asarray(jnp.sum(y, axis=1))
    np.testing.assert_allclose(s, 1.0, rtol=1e-5)
    assert np.all((np.asarray(y) == np.asarray(y).max(1, keepdims=True)).sum(1) >= 1)


def test_gumbel_sigmoid_range():
    logits = jnp.zeros((8, 4))
    y = gumbel_sigmoid(jax.random.key(2), logits, tau=1.0)
    arr = np.asarray(y)
    assert np.all(arr >= 0) and np.all(arr <= 1)


def test_label_smoothing():
    labels = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    mask = jnp.asarray([[1, 1, 1, 0]])
    sm = np.asarray(label_smoothing(labels, mask, epsilon=0.3))
    assert sm[0, 0] == pytest.approx(0.7 + 0.1)
    assert sm[0, 1] == pytest.approx(0.1)
    assert sm[0, 3] == 0.0  # padding stays zero


def test_matching_head_gumbel_tau_applies_in_every_pass():
    """Reference matching_loss applies (logits+noise)/tau unconditionally when
    gumbel is on (models/layers.py:163-165) — deterministic passes here keep
    the 1/tau sharpening (noise needs an RNG stream; docs/PARITY.md)."""
    import numpy as np

    from hual_tpu.models.layers import MatchingHead

    B, T, D = 2, 6, 8
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    labels = rng.integers(0, 4, size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)

    plain = MatchingHead(4, tau=0.3, gumbel=False)
    sharp = MatchingHead(4, tau=0.3, gumbel=True)
    p = plain.init({"params": jax.random.key(0)}, x, labels, mask,
                   deterministic=True)
    _, probs_plain = plain.apply(p, x, labels, mask, deterministic=True)
    _, probs_sharp = sharp.apply(p, x, labels, mask, deterministic=True)
    # deterministic gumbel == softmax(logits / tau): sharper, not equal
    assert not np.allclose(np.asarray(probs_plain), np.asarray(probs_sharp))
    assert float(jnp.max(probs_sharp)) > float(jnp.max(probs_plain))
    # stochastic pass adds noise on top
    _, probs_noisy = sharp.apply(p, x, labels, mask, deterministic=False,
                                 rngs={"dropout": jax.random.key(1)})
    assert not np.allclose(np.asarray(probs_noisy), np.asarray(probs_sharp))
