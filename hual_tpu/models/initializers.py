"""TF1-compatible initializers.

The reference relies on tf.compat.v1.get_variable's default glorot_uniform,
whose fan computation treats rank>=3 kernels as convolutions (receptive field
= all but the last two dims).  jax.nn.initializers.glorot_uniform assumes
in/out are the last two axes but computes receptive field the same way, so we
implement the TF fan rule directly for exactness.
"""

from __future__ import annotations

import numpy as np
import jax


def _tf_fans(shape) -> tuple[float, float]:
    if len(shape) < 1:
        return 1.0, 1.0
    if len(shape) == 1:
        return float(shape[0]), float(shape[0])
    if len(shape) == 2:
        return float(shape[0]), float(shape[1])
    receptive = float(np.prod(shape[:-2]))
    return receptive * shape[-2], receptive * shape[-1]


def glorot_uniform_tf(key, shape, dtype=jax.numpy.float32):
    fan_in, fan_out = _tf_fans(shape)
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def zeros(key, shape, dtype=jax.numpy.float32):
    return jax.numpy.zeros(shape, dtype)


def ones(key, shape, dtype=jax.numpy.float32):
    return jax.numpy.ones(shape, dtype)


orthogonal = jax.nn.initializers.orthogonal()
