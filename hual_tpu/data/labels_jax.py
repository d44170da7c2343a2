"""On-device training-label synthesis.

jnp re-expression of hual_tpu.data.labels.make_span_labels (reference
utils/data_loader.py:57-97) so label tensors are built inside the jitted
train step from (s_ind, e_ind, vlen) — no (B, T) float labels ever cross the
host-device boundary.  Same semantics, expressed as broadcast compares
instead of scatters:

* every in-length frame gets the 1e-10 floor,
* the target frame gets +0.5 plus the folds of any missing neighbors,
* existing neighbors are ASSIGNED y = (1 - vlen*1e-10 - 0.5)/2,
* match windows painted B(1) -> I(2) -> E(3), later paints win, with the
  collision clamp st_r = max(st, et_l - 1).

float32 throughout (the NumPy path computes in float64 then casts; the
difference is below 1e-7 relative and covered by tests).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_span_labels_jax(s_inds: jnp.ndarray, e_inds: jnp.ndarray,
                         vlens: jnp.ndarray, max_len: int):
    """Returns (y1, y2, match_labels, inner_labels); shapes (B, max_len)."""
    s = s_inds.astype(jnp.int32)
    e = e_inds.astype(jnp.int32)
    vl = vlens.astype(jnp.int32)
    idx = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    valid = idx < vl[:, None]
    base = jnp.where(valid, jnp.float32(1e-10), jnp.float32(0.0))

    y = ((1.0 - vl.astype(jnp.float32) * 1e-10 - 0.5) / 2.0)

    def soft(t):
        has_left = (t > 0).astype(jnp.float32)
        has_right = (t < vl - 1).astype(jnp.float32)
        center = (base + 0.5
                  + (1.0 - has_left)[:, None] * y[:, None]
                  + (1.0 - has_right)[:, None] * y[:, None])
        is_t = idx == t[:, None]
        is_l = idx == (t[:, None] - 1)
        is_r = (idx == (t[:, None] + 1)) & valid
        yb = jnp.broadcast_to(y[:, None], base.shape)
        return jnp.where(is_t, center,
                         jnp.where(is_l | is_r, yb, base)).astype(jnp.float32)

    y1 = soft(s)
    y2 = soft(e)

    ext = 2
    st_l = jnp.maximum(0, s - ext)
    st_r = jnp.minimum(s + ext, vl - 1)
    et_l = jnp.maximum(0, e - ext)
    et_r = jnp.minimum(e + ext, vl - 1)
    st_r = jnp.where(st_r >= et_l, jnp.maximum(s, et_l - 1), st_r)

    m1 = (idx >= st_l[:, None]) & (idx <= st_r[:, None])
    m2 = (idx > st_r[:, None]) & (idx < et_l[:, None])
    m3 = (idx >= et_l[:, None]) & (idx <= et_r[:, None])
    match = jnp.where(m3, 3, jnp.where(m2, 2, jnp.where(m1, 1, 0))).astype(jnp.int32)
    inner = m2.astype(jnp.float32)
    return y1, y2, match, inner
