"""Fully-fused SeqPAN forward as ONE Pallas kernel (deterministic passes).

Why: the AL inference sweep is bound by neither the MXU (~7% MFU) nor HBM
streaming (~2% of peak BW) but by the locality of ~hundreds of small XLA ops
at T=64/dim=128 — measured batch-size curve and analysis in PROFILING.md §3.
The model is tiny (≈1.2M params ≈ 4.7 MB), so the entire post-projection
forward fits in VMEM: this kernel runs pos-emb -> conv-block -> dual
attention stack -> CQ fusion -> matching head -> conditioned predictor for a
block of `bb` samples per grid step with zero HBM roundtrips between ops.

Design notes:

* Weights are packed ONCE per call into six stacked arrays (square matrices,
  128-vectors, 4D->D and 2D->D wide kernels, depthwise filters, positional
  tables) so the kernel takes 10 refs instead of ~90 (`pack_weights`); a
  static name->row layout indexes them in-kernel.
* Per-head attention over a bb-sample block is ONE (bb*Tq, hd) @ (hd, bb*Tk)
  matmul per head with a BLOCK-DIAGONAL additive mask: off-block pairs get
  -1e30 so their post-softmax weight is exactly 0.0 and samples never mix.
  The bbx compute waste is ~17% of a step that sits at 7% MFU — op-count,
  not FLOPs, is what this kernel removes.  Rows whose own `from` position is
  padding attend uniformly over their block (bias 0 on the whole block),
  which reproduces the reference's all-masked softmax exactly
  (softmax(-1e30 * 1) == softmax(0 * 1)).
* The math body (`_forward_math`) is pure jnp on loaded values, so the same
  code runs inside the kernel and as a plain-XLA reference; parity vs the
  flax model is pinned in tests/test_fused_forward.py.

Deterministic only (drop 0): the clean AL pass and the eval sweep.  The
reference cites: models/model.py:53-122, models/modules.py, models/layers.py.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = -1e30


# ---------------------------------------------------------------------------
# weight packing


class _Packer:
    KINDS = ("mat", "vec", "w4", "w2", "dw", "pos")

    def __init__(self):
        self.stacks = {k: [] for k in self.KINDS}
        self.layout: dict[str, tuple[str, int]] = {}

    def add(self, kind: str, name: str, arr: jnp.ndarray):
        assert name not in self.layout, name
        self.layout[name] = (kind, len(self.stacks[kind]))
        self.stacks[kind].append(arr)


def _conv_kernel(p):  # flax Conv1D kernel (1, in, out) -> (in, out)
    return p["kernel"][0]


def _conv_bias(p):  # flax Conv1D bias (1, 1, out) -> (out,)
    return p["bias"][0, 0]


def pack_weights(params: dict, attn_layer: int, dim: int) -> tuple[dict, dict]:
    """Walk the SeqPAN param tree (models/seqpan.py setup order) into six
    stacked arrays + a static name->(stack, row) layout."""
    p = params["params"]
    pk = _Packer()
    D = dim

    def add_mat(name, arr):
        assert arr.shape == (D, D), (name, arr.shape)
        pk.add("mat", name, arr)

    def add_vec(name, arr):
        v = arr.reshape(-1)
        assert v.shape[0] <= D, (name, arr.shape)
        if v.shape[0] < D:
            v = jnp.pad(v, (0, D - v.shape[0]))
        pk.add("vec", name, v)

    def add_ln(prefix, ln):
        add_vec(prefix + ".scale", ln["scale"])
        add_vec(prefix + ".bias", ln["bias"])

    def add_conv_block(prefix, cb):
        for i in range(4):
            add_ln(f"{prefix}.ln{i}", cb[f"layer_norm_{i}"])
            dwc = cb[f"depthwise_conv_layers_{i}"]
            pk.add("dw", f"{prefix}.dw{i}",
                   jnp.pad(dwc["depthwise_filter"][:, 0, :, 0], ((0, 1), (0, 0))))
            add_mat(f"{prefix}.pw{i}", dwc["pointwise_filter"][0, 0])
            add_vec(f"{prefix}.pwb{i}", dwc["bias"])

    pk.add("pos", "pos_emb", p["pos_emb"]["position_embeddings"])
    add_conv_block("conv_block", p["conv_block"])

    for li in range(attn_layer):
        d = p[f"d_attn_{li}"]
        pre = f"d{li}"
        add_ln(pre + ".ln1", d["layer_norm_1"])
        add_ln(pre + ".lnt", d["layer_norm_t"])
        add_ln(pre + ".ln2", d["layer_norm_2"])
        m = d["dual_multihead_attention"]
        for nm in ("query", "f_key", "f_value", "t_key", "t_value",
                   "s_dense", "x_dense", "s_gate", "x_gate", "guided_dense"):
            add_mat(f"{pre}.{nm}", _conv_kernel(m[nm]))
            add_vec(f"{pre}.{nm}.b", _conv_bias(m[nm]))
        for bl in ("bilinear_1", "bilinear_2"):
            add_mat(f"{pre}.{bl}.d1", _conv_kernel(m[bl]["dense_1"]))
            add_mat(f"{pre}.{bl}.d2", _conv_kernel(m[bl]["dense_2"]))
            add_vec(f"{pre}.{bl}.b", m[bl]["bias"])
        add_mat(pre + ".dense_1", _conv_kernel(d["dense_1"]))
        add_vec(pre + ".dense_1.b", _conv_bias(d["dense_1"]))
        add_mat(pre + ".dense_2", _conv_kernel(d["dense_2"]))
        add_vec(pre + ".dense_2.b", _conv_bias(d["dense_2"]))

    for nm in ("q2v_attn", "v2q_attn"):
        cq = p[nm]
        tri = cq["efficient_trilinear"]
        add_vec(nm + ".w0", tri["linear_kernel4arg0"])
        add_vec(nm + ".w1", tri["linear_kernel4arg1"])
        add_vec(nm + ".wm", tri["linear_kernel4mul"])
        pk.add("w4", nm + ".dense", _conv_kernel(cq["dense"]))

    cc = p["cq_cat"]
    add_vec("cq_cat.wp", cc["weighted_pooling"]["weight"])
    pk.add("w2", "cq_cat.dense", _conv_kernel(cc["dense"]))
    add_vec("cq_cat.dense.b", _conv_bias(cc["dense"]))

    mh = p["matching_head"]["dense"]
    add_mat("match.k", jnp.pad(_conv_kernel(mh), ((0, 0), (0, D - 4))))
    add_vec("match.b", _conv_bias(mh))
    for i in range(4):
        add_vec(f"label_emb.{i}", p["label_emb"][i])

    pred = p["predictor"]
    fe = pred["feature_encoder"]
    pk.add("pos", "fe.pos", fe["pos_emb"]["position_embeddings"])
    add_conv_block("fe.conv_block", fe["conv_block"])
    add_ln("fe.ln1", fe["layer_norm_1"])
    for nm in ("query", "key", "value"):
        add_mat(f"fe.{nm}", _conv_kernel(fe["top_self_attention"][nm]))
        add_vec(f"fe.{nm}.b", _conv_bias(fe["top_self_attention"][nm]))
    add_ln("fe.ln2", fe["layer_norm_2"])
    add_mat("fe.dense", _conv_kernel(fe["dense"]))
    add_vec("fe.dense.b", _conv_bias(fe["dense"]))
    add_ln("start_ln", pred["start_layer_norm"])
    add_ln("end_ln", pred["end_layer_norm"])
    pk.add("w2", "start_hidden", _conv_kernel(pred["start_hidden"]))
    add_vec("start_hidden.b", _conv_bias(pred["start_hidden"]))
    pk.add("w2", "end_hidden", _conv_kernel(pred["end_hidden"]))
    add_vec("end_hidden.b", _conv_bias(pred["end_hidden"]))
    add_vec("start_dense.k", pred["start_dense"]["kernel"][0])
    add_vec("start_dense.b", pred["start_dense"]["bias"])
    add_vec("end_dense.k", pred["end_dense"]["kernel"][0])
    add_vec("end_dense.b", pred["end_dense"]["bias"])

    stacks = {k: jnp.stack(v) for k, v in pk.stacks.items()}
    return stacks, pk.layout


# ---------------------------------------------------------------------------
# the math body (pure jnp on loaded values — runs in-kernel and as reference)


def _forward_math(vf, qf, vmask, qmask, w, *, bb, T, W, D, H, attn_layer,
                  tau, use_gumbel, mxu_bf16=False):
    """vf (bb,T,D), qf (bb,W,D); masks as FLAT COLUMNS (bb*T,1)/(bb*W,1)
    float32 (flattened outside the kernel — Mosaic rejects lane-merging
    reshapes, and XLA does them for free).
    Returns start_logits (bb,T), end_logits (bb,T), match_scores (bb,T,4)."""
    hd = D // H
    f32 = jnp.float32

    def ln(x, pre):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-6) * w(pre + ".scale") \
            + w(pre + ".bias")

    # mxu_bf16: multiply in bfloat16, accumulate f32 — the SAME numerics
    # class as the flax path's TPU-default matmul precision (config
    # model.matmul_precision "default"); f32 multiplies cost ~4x on the MXU.
    mul_dt = jnp.bfloat16 if mxu_bf16 else f32

    def mm(x2, mat):  # (N, D) @ (D, M)
        return jax.lax.dot_general(x2.astype(mul_dt), mat.astype(mul_dt),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def dense(x2, name):
        return mm(x2, w(name)) + w(name + ".b")

    def mmt(a2, b2):  # (N, K) @ (M, K)^T without a materialized transpose
        # (Mosaic rejects relayout transposes; its matmul contracts any dim)
        return jax.lax.dot_general(a2.astype(mul_dt), b2.astype(mul_dt),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    # Mosaic rejects reshapes that merge/split the lane (minor) dimension —
    # e.g. (bb, L) -> (bb*L,) or (bb*L, 1) -> (bb, L).  The helpers below
    # express those data movements as one-hot matmuls + lane reductions
    # (exact: 0/1 weights, adding 0.0 is exact in f32).  They are pure
    # LAYOUT moves, so they must never quantize: mm_exact keeps f32
    # operands even under mxu_bf16 (a bf16 mm here would round the finished
    # f32 values it is merely relocating — e.g. the final span logits).

    def mm_exact(x2, mat):
        return jax.lax.dot_general(x2.astype(f32), mat.astype(f32),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def mmt_exact(a2, b2):  # ones-broadcasts: (N,1) @ (M,1)^T, exact
        return jax.lax.dot_general(a2.astype(f32), b2.astype(f32),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def samp_sel(R, L):  # (R, bb): S[r, b] = 1.0 iff b == r // L
        r = jax.lax.broadcasted_iota(jnp.int32, (R, bb), 0) // L
        b = jax.lax.broadcasted_iota(jnp.int32, (R, bb), 1)
        return (r == b).astype(f32)

    def pos_onehot(R, L):  # (R, L): C[r, t] = 1.0 iff t == r % L
        r = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0) % L
        t = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        return (r == t).astype(f32)

    def flatcol(x2, L):  # (bb, L) -> (bb*L, 1)
        R = bb * L
        rows = mm_exact(samp_sel(R, L), x2)       # (R, L), row r = x2[r//L]
        return jnp.sum(rows * pos_onehot(R, L), axis=-1, keepdims=True)

    def samp_gather(L):  # (bb, bb*L): G[b, r] = 1.0 iff b == r // L
        b = jax.lax.broadcasted_iota(jnp.int32, (bb, bb * L), 0)
        r = jax.lax.broadcasted_iota(jnp.int32, (bb, bb * L), 1) // L
        return (b == r).astype(f32)

    def unflat(xcol, L):  # (bb*L, 1) -> (bb, L)
        spread = xcol * pos_onehot(bb * L, L)     # (R, L)
        return mm_exact(samp_gather(L), spread)   # (bb, L)

    def vec0(name):  # first element of a packed (D,) vector, as (1, 1)
        i = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
        return jnp.sum(jnp.expand_dims(w(name), 0) * (i == 0).astype(f32),
                       axis=-1, keepdims=True)

    vm_col, qm_col = vmask, qmask                 # (bbT, 1) / (bbW, 1)

    def conv_block(x3, prefix, L):
        # 4 x {LN -> depthwise(k=7, SAME) -> pointwise -> +bias -> relu
        #      -> (+residual)}  (reference models/modules.py:59-70)
        for i in range(4):
            res = x3
            h = ln(x3, f"{prefix}.ln{i}")
            dwf = w(f"{prefix}.dw{i}", kind="dw")           # (8, D); row 7 pad
            acc = jnp.zeros_like(h)
            hp = jnp.pad(h, ((0, 0), (3, 3), (0, 0)))
            for k in range(7):
                acc = acc + hp[:, k:k + L, :] * dwf[k]
            pw = mm(acc.reshape(bb * L, D), w(f"{prefix}.pw{i}"))
            x3 = jax.nn.relu(pw + w(f"{prefix}.pwb{i}")).reshape(bb, L, D) + res
        return x3

    def block_bias(fm_col, tm_col, Tq, Tk, row_uniform=True):
        # (bb*Tq, bb*Tk) additive bias restricted to same-sample blocks;
        # fm_col/tm_col are (bb*Tq, 1)/(bb*Tk, 1) flat mask columns.
        # row_uniform=True (multi-head attentions): pairs with a valid `to`
        # position get 0, and an all-padding `from` row gets 0 on its whole
        # block — exactly the reference's (1 - from x to) * -1e30, whose
        # all-masked rows softmax to uniform over their own Tk.
        # row_uniform=False (CQ attention): the reference masks only the
        # `to` columns (mask2), so padding `from` rows still attend over the
        # valid columns.
        rows = jax.lax.broadcasted_iota(jnp.int32, (bb * Tq, bb * Tk), 0) // Tq
        cols = jax.lax.broadcasted_iota(jnp.int32, (bb * Tq, bb * Tk), 1) // Tk
        same = rows == cols
        # tm_col broadcast across rows via an outer product with a ones
        # column (K=1 matmul — no transpose).
        tm_mat = mmt_exact(jnp.ones((bb * Tq, 1), f32), tm_col)
        ok = same & (tm_mat > 0)
        if not row_uniform:
            return jnp.where(ok, 0.0, MASK).astype(f32)
        # All-padding `from` rows: the reference adds -1e30 to EVERY score;
        # in f32 the finite scores are absorbed (s - 1e30 == -1e30 exactly)
        # so its softmax is UNIFORM over the sample's Tk.  Replicate by
        # giving such rows -1e30 on their whole block and pushing off-block
        # pairs to -2e30 (still 0 after the softmax's max-shift).
        bias = jnp.where(ok, 0.0, MASK)
        bias = jnp.where(same & (fm_col <= 0), MASK, bias)
        return jnp.where(same, bias, 2.0 * MASK).astype(f32)

    def heads_attn(q2, k2, v2, bias, Tq):
        outs = []
        scale = 1.0 / jnp.sqrt(f32(hd))
        for h in range(H):
            s = mmt(q2[:, h * hd:(h + 1) * hd],
                    k2[:, h * hd:(h + 1) * hd]) * scale + bias
            prob = jax.nn.softmax(s, axis=-1)
            outs.append(mm(prob, v2[:, h * hd:(h + 1) * hd]))
        return jnp.concatenate(outs, axis=-1)                 # (bb*Tq, D)

    def dual_attn(frm3, to3, fm, tm, Tq, Tk, pre):
        out = ln(frm3, pre + ".ln1")
        ton = ln(to3, pre + ".lnt")
        o2, t2 = out.reshape(bb * Tq, D), ton.reshape(bb * Tk, D)
        q2 = dense(o2, pre + ".query")
        s_bias = block_bias(fm, fm, Tq, Tq)
        x_bias = block_bias(fm, tm, Tq, Tk)
        s_out = heads_attn(q2, dense(o2, pre + ".f_key"),
                           dense(o2, pre + ".f_value"), s_bias, Tq)
        x_out = heads_attn(q2, dense(t2, pre + ".t_key"),
                           dense(t2, pre + ".t_value"), x_bias, Tq)
        s_val = dense(s_out, pre + ".s_dense")
        x_val = dense(x_out, pre + ".x_dense")
        s_gate = jax.nn.sigmoid(dense(s_val, pre + ".s_gate"))
        x_gate = jax.nn.sigmoid(dense(x_val, pre + ".x_gate"))
        outputs = dense(s_gate * x_val + x_gate * s_val, pre + ".guided_dense")
        scores = (mm(o2, w(pre + ".bilinear_1.d1"))
                  + mm(outputs, w(pre + ".bilinear_1.d2"))
                  + w(pre + ".bilinear_1.b"))
        values = (mm(o2, w(pre + ".bilinear_2.d1"))
                  + mm(outputs, w(pre + ".bilinear_2.d2"))
                  + w(pre + ".bilinear_2.b"))
        fmask = fm                                # (bb*Tq, 1) flat column
        gated = jax.nn.sigmoid(scores * fmask + MASK * (1.0 - fmask)) * values
        # post-attention dense + residuals (reference models/modules.py:73-89)
        res = mm(gated, w(pre + ".dense_1")) + w(pre + ".dense_1.b") \
            + frm3.reshape(bb * Tq, D)
        out2 = mm(ln(res.reshape(bb, Tq, D), pre + ".ln2").reshape(bb * Tq, D),
                  w(pre + ".dense_2")) + w(pre + ".dense_2.b") + res
        return out2.reshape(bb, Tq, D)

    def cq_attention(x13, x23, m1, m2, T1, T2, nm):
        x1, x2 = x13.reshape(bb * T1, D), x23.reshape(bb * T2, D)
        sub0 = jnp.sum(x1 * w(nm + ".w0"), axis=-1, keepdims=True)  # (bbT1,1)
        sub1 = jnp.sum(x2 * w(nm + ".w1"), axis=-1, keepdims=True)  # (bbT2,1)
        sub2 = mmt(x1 * w(nm + ".wm"), x2)                     # (bbT1, bbT2)
        # sub1 broadcast across rows = outer product with a ones column
        score = sub0 + mmt_exact(jnp.ones((bb * T1, 1), f32), sub1) + sub2
        b2 = block_bias(m1, m2, T1, T2, row_uniform=False)
        score_ = jax.nn.softmax(score + b2, axis=-1)
        # softmax over axis 0 restricted to each sample's row-block: the
        # reference's softmax(mask_logits(score, mask1), axis=1).  The bias
        # built with (m2, m1) swapped is symmetric under transposition of
        # its (row-block, col-block) structure, so build it directly at
        # (bbT1, bbT2): valid pairs are same-sample with a valid m1 ROW.
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (bb * T1, bb * T2), 0) // T1
        cols1 = jax.lax.broadcasted_iota(jnp.int32, (bb * T1, bb * T2), 1) // T2
        b1 = jnp.where((rows1 == cols1) & (m1 > 0), 0.0, MASK).astype(f32)
        score_t = jax.nn.softmax(score + b1, axis=0)
        c2q = mm(score_, x2)
        q2c = mm(mmt(score_, score_t), x1)
        att = jnp.concatenate([x1, c2q, x1 * c2q, x1 * q2c], axis=-1)
        return mm(att, w(nm + ".dense", kind="w4"))            # (bbT1, D)

    def pos_slice(name, L):
        # NOT `pos[None, :L, :]`: jnp lowers that mixed newaxis+slice index
        # to a gather, which Mosaic's TPU lowering rejects at these shapes.
        p = w(name, kind="pos")
        return jnp.expand_dims(jax.lax.slice(p, (0, 0), (L, D)), 0)

    def feature_encoder(x3, vm, L):
        feats = x3 + pos_slice("fe.pos", L)
        feats = conv_block(feats, "fe.conv_block", L)
        o2 = ln(feats, "fe.ln1").reshape(bb * L, D)
        bias = block_bias(vm, vm, L, L)
        attn = heads_attn(dense(o2, "fe.query"), dense(o2, "fe.key"),
                          dense(o2, "fe.value"), bias, L)
        res = attn + feats.reshape(bb * L, D)
        out = mm(ln(res.reshape(bb, L, D), "fe.ln2").reshape(bb * L, D),
                 w("fe.dense")) + w("fe.dense.b") + res
        return out.reshape(bb, L, D)

    # --- encoder: shared pos emb + conv block (models/model.py:53-58) ------
    vf = conv_block(vf + pos_slice("pos_emb", T), "conv_block", T)
    qf = conv_block(qf + pos_slice("pos_emb", W), "conv_block", W)

    # --- dual attention stack (models/model.py:60-68) ----------------------
    for li in range(attn_layer):
        vf_ = dual_attn(vf, qf, vmask, qmask, T, W, f"d{li}")
        qf_ = dual_attn(qf, vf, qmask, vmask, W, T, f"d{li}")
        vf, qf = vf_, qf_

    # --- CQ fusion (models/model.py:70-74) ----------------------------------
    q2v = cq_attention(vf, qf, vmask, qmask, T, W, "q2v_attn")   # (bbT, D)
    v2q = cq_attention(qf, vf, qmask, vmask, W, T, "v2q_attn")   # (bbW, D)
    # weighted pooling of v2q over W, per sample (lane-layout-safe: the
    # (bbW,1)<->(bb,W) moves go through flatcol/unflat, the per-sample sum
    # and the tile are one-hot matmuls)
    qmask2 = unflat(qm_col, W)                                   # (bb, W)
    xw = unflat(jnp.sum(v2q * w("cq_cat.wp"), axis=-1, keepdims=True), W)
    alphas = jax.nn.softmax(xw * qmask2 + MASK * (1.0 - qmask2), axis=-1)
    pooled = mm_exact(samp_gather(W), v2q * flatcol(alphas, W))  # (bb, D)
    tiled = mm_exact(samp_sel(bb * T, T), pooled)                # (bbT, D)
    fuse = mm(jnp.concatenate([q2v, tiled], axis=-1),
              w("cq_cat.dense", kind="w2")) + w("cq_cat.dense.b")

    # --- matching head + soft label embedding (models/model.py:82-97) ------
    mlogits = (mm(fuse, w("match.k")) + w("match.b"))[:, :4]
    if use_gumbel:
        mlogits = mlogits / tau  # deterministic part only (docs/PARITY.md)
    mscores = jax.nn.softmax(mlogits, axis=-1)                   # (bbT, 4)
    label_emb = jnp.stack([w(f"label_emb.{i}") for i in range(4)])
    soft = mm(mscores, label_emb)
    outputs = (fuse + soft) * vm_col

    # --- conditioned predictor (models/modules.py:154-173) -----------------
    o3 = outputs.reshape(bb, T, D)
    start_f = feature_encoder(o3, vmask, T)
    end_f = feature_encoder(start_f, vmask, T)
    start_f = ln(start_f, "start_ln").reshape(bb * T, D)
    end_f = ln(end_f, "end_ln").reshape(bb * T, D)
    start_h = jax.nn.relu(
        mm(jnp.concatenate([start_f, outputs], axis=-1),
           w("start_hidden", kind="w2")) + w("start_hidden.b"))
    end_h = jax.nn.relu(
        mm(jnp.concatenate([end_f, outputs], axis=-1),
           w("end_hidden", kind="w2")) + w("end_hidden.b"))
    s_col = jnp.sum(start_h * w("start_dense.k"), axis=-1, keepdims=True) \
        + vec0("start_dense.b")
    e_col = jnp.sum(end_h * w("end_dense.k"), axis=-1, keepdims=True) \
        + vec0("end_dense.b")
    return (unflat(s_col, T), unflat(e_col, T), mscores.reshape(bb, T, 4))


# ---------------------------------------------------------------------------
# the pallas call


def _kernel(vf_ref, qf_ref, vm_ref, qm_ref, mat_ref, vec_ref, w4_ref, w2_ref,
            dw_ref, pos_ref, s_ref, e_ref, ms_ref, *, layout, static):
    loaded = {"mat": mat_ref, "vec": vec_ref, "w4": w4_ref, "w2": w2_ref,
              "dw": dw_ref, "pos": pos_ref}

    def w(name, kind=None):
        k, i = layout[name]
        return loaded[k][i]

    s, e, ms = _forward_math(vf_ref[...].astype(jnp.float32),
                             qf_ref[...].astype(jnp.float32),
                             vm_ref[...].astype(jnp.float32),
                             qm_ref[...].astype(jnp.float32), w, **static)
    s_ref[...] = s
    e_ref[...] = e
    ms_ref[...] = ms


def fused_call(stacks: dict, layout: dict, vfeats: jnp.ndarray,
               qfeats: jnp.ndarray, v_mask: jnp.ndarray,
               q_mask: jnp.ndarray, *, attn_layer: int = 2,
               num_heads: int = 8, tau: float = 0.3,
               use_gumbel: bool = False, block_b: int = 8,
               mxu_bf16: bool = False, interpret: bool = False):
    """The pallas_call on pre-packed weight stacks (pack once per sweep,
    not once per scanned step).

    vfeats (B,T,D) / qfeats (B,W,D): the projected+LN'd streams
    (models/model.py:42-49); masks int/float (B,T)/(B,W).
    Returns (start_logits, end_logits, match_scores) float32.
    """
    B, T, D = vfeats.shape
    W = qfeats.shape[1]
    # keep the block at its configured size and pad B up to a multiple of
    # it (B < bb included): Mosaic requires the (bb, T) output blocks'
    # second-to-last dim divisible by 8, so shrinking bb to a small batch
    # would produce an illegal block shape
    bb = block_b
    if not interpret and bb % 8 != 0:
        raise ValueError(
            f"block_b={bb}: Mosaic requires the (bb, T) output blocks' "
            f"second-to-last dim divisible by 8 (use block_b in 8, 16, ...)")
    pad = (-B) % bb
    if pad:
        vfeats = jnp.pad(vfeats, ((0, pad), (0, 0), (0, 0)))
        qfeats = jnp.pad(qfeats, ((0, pad), (0, 0), (0, 0)))
        v_mask = jnp.pad(v_mask, ((0, pad), (0, 0)), constant_values=1)
        q_mask = jnp.pad(q_mask, ((0, pad), (0, 0)), constant_values=1)
    Bp = B + pad

    static = dict(bb=bb, T=T, W=W, D=D, H=num_heads, attn_layer=attn_layer,
                  tau=tau, use_gumbel=use_gumbel, mxu_bf16=mxu_bf16)

    blk3 = lambda i: (i, 0, 0)
    blk2 = lambda i: (i, 0)
    whole3 = lambda i: (0, 0, 0)
    whole2 = lambda i: (0, 0)
    kern = functools.partial(_kernel, layout=layout, static=static)
    # masks enter as FLAT (B*T, 1) columns: the (bb,T)->(bb*T,1) flatten is
    # free in XLA but a forbidden lane-merging reshape inside Mosaic
    vm_col = v_mask.astype(jnp.float32).reshape(Bp * T, 1)
    qm_col = q_mask.astype(jnp.float32).reshape(Bp * W, 1)
    s, e, ms = pl.pallas_call(
        kern,
        grid=(Bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, T, D), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, W, D), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb * T, 1), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb * W, 1), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec(stacks["mat"].shape, whole3, memory_space=pltpu.VMEM),
            pl.BlockSpec(stacks["vec"].shape, whole2, memory_space=pltpu.VMEM),
            pl.BlockSpec(stacks["w4"].shape, whole3, memory_space=pltpu.VMEM),
            pl.BlockSpec(stacks["w2"].shape, whole3, memory_space=pltpu.VMEM),
            pl.BlockSpec(stacks["dw"].shape, whole3, memory_space=pltpu.VMEM),
            pl.BlockSpec(stacks["pos"].shape, whole3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, T), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T, 4), blk3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, T), jnp.float32),
            jax.ShapeDtypeStruct((Bp, T), jnp.float32),
            jax.ShapeDtypeStruct((Bp, T, 4), jnp.float32),
        ],
        # the block-diagonal attention matrices put the kernel just past the
        # conservative 16 MB default scoped-VMEM limit at block_b=8; v5e has
        # 128 MB of VMEM, so raise the cap (also unlocks block_b=16/32)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(vfeats.astype(jnp.float32), qfeats.astype(jnp.float32),
      vm_col, qm_col,
      stacks["mat"], stacks["vec"], stacks["w4"], stacks["w2"],
      stacks["dw"], stacks["pos"])
    return s[:B], e[:B], ms[:B]


@functools.partial(jax.jit, static_argnames=("attn_layer", "num_heads",
                                             "tau", "use_gumbel", "block_b",
                                             "mxu_bf16", "interpret"))
def fused_forward(params: dict, vfeats: jnp.ndarray, qfeats: jnp.ndarray,
                  v_mask: jnp.ndarray, q_mask: jnp.ndarray, *,
                  attn_layer: int = 2, num_heads: int = 8, tau: float = 0.3,
                  use_gumbel: bool = False, block_b: int = 8,
                  mxu_bf16: bool = False, interpret: bool = False):
    """pack_weights + fused_call in one step (single-dispatch use)."""
    stacks, layout = pack_weights(params, attn_layer, vfeats.shape[-1])
    return fused_call(stacks, layout, vfeats, qfeats, v_mask, q_mask,
                      attn_layer=attn_layer, num_heads=num_heads, tau=tau,
                      use_gumbel=use_gumbel, block_b=block_b,
                      mxu_bf16=mxu_bf16, interpret=interpret)


def encoder_inputs(model, params: dict, batch: dict,
                   word_vectors: jnp.ndarray):
    """The pre-kernel XLA part: embeddings + input projections + LN
    (models/model.py:36-49).  Gathers and two big GEMMs — shapes XLA
    already handles well.  Runs the MODEL'S OWN encoder submodules (bound
    via method=) rather than re-implementing the table layout / projection
    / LN math, so a future change to WordEmbedding/Conv1D/LayerNorm cannot
    desync the fused backend's inputs from the flax model."""
    from hual_tpu.ops.masking import sequence_mask

    v_mask = sequence_mask(batch["video_seq_len"], model.max_vlen)
    q_mask = (batch["word_ids"] != 0).astype(jnp.int32)

    def _enc(m, b, wv):
        # the deterministic drop-0 encoder of SeqPAN.__call__ (f32 inputs
        # keep this at the fused path's f32 numerics regardless of the
        # model's compute_dtype)
        word_emb = m.word_embs(b["word_ids"], wv, 0.0, True)
        char_emb = m.char_embs(b["char_ids"], 0.0, True)
        qf = jnp.concatenate([word_emb, char_emb], axis=-1)
        qf = m.q_layer_norm(m.query_conv1d(qf))
        vf = m.v_layer_norm(m.video_conv1d(b["video_features"]))
        return vf, qf

    vfeats, qfeats = model.apply(params, batch, word_vectors, method=_enc)
    return vfeats, qfeats, v_mask, q_mask


def seqpan_forward_fused(model, params: dict, batch: dict,
                         word_vectors: jnp.ndarray, *, block_b: int = 8,
                         interpret: bool = False) -> dict:
    """Deterministic SeqPAN forward: XLA front (embeddings/projections) +
    fused Pallas body + fused Pallas span decode.  Output dict carries the
    keys the eval/infer paths consume."""
    from hual_tpu.ops.pallas.span_decode import span_decode_pallas

    vfeats, qfeats, v_mask, q_mask = encoder_inputs(model, params, batch,
                                                    word_vectors)
    s_logits, e_logits, mscores = fused_forward(
        params, vfeats, qfeats, v_mask, q_mask, attn_layer=model.attn_layer,
        num_heads=model.num_heads, tau=model.tau,
        use_gumbel=model.use_gumbel, block_b=block_b, interpret=interpret)
    sidx, eidx = span_decode_pallas(s_logits, e_logits, v_mask,
                                    interpret=interpret)
    return {"v_mask": v_mask, "q_mask": q_mask,
            "match_scores": mscores, "start_logits": s_logits,
            "end_logits": e_logits, "start_index": sidx, "end_index": eidx}
