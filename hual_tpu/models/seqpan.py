"""SeqPAN: the flagship span-prediction model (reference models/model.py:7-122).

Pipeline: text/video encoders -> shared pos-emb + conv-block -> N x dual
attention (video<->query, shared weights both directions) -> CQ fusion ->
matching head (+ label-embedding orthogonality penalty) -> conditioned span
predictor -> localization + matching + alignment losses.

The module returns logits/scores; losses live in :func:`seqpan_loss` so the
same apply serves train, eval and MC-dropout inference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hual_tpu.config import Config
from hual_tpu.models.initializers import orthogonal
from hual_tpu.models.layers import (CQAttention, CQConcat, Conv1D, LayerNorm,
                                    MatchingHead, alignment_loss, dropout,
                                    localizing_loss)
from hual_tpu.models.modules import (CharEmbedding, ConditionedPredictor,
                                     ConvBlock, DualAttnBlock,
                                     PositionalEmbedding, WordEmbedding)
from hual_tpu.ops.decode import span_decode
from hual_tpu.ops.masking import sequence_mask


class SeqPAN(nn.Module):
    dim: int = 128
    num_heads: int = 8
    attn_layer: int = 2
    max_vlen: int = 64
    word_dim: int = 300
    char_dim: int = 50
    num_chars: int = 100
    tau: float = 0.3
    use_gumbel: bool = False
    # Activation compute dtype: "float32" (default; full numeric parity) or
    # "bfloat16" (halves on-chip activation traffic; matmuls accumulate f32,
    # LN stats/softmaxes/losses/logits stay f32 — see layers.py).  Production
    # use: the stochastic MC-dropout passes of the AL sweep, whose parity is
    # distributional anyway (train.mc_dtype, docs/PARITY.md).
    compute_dtype: str = "float32"
    # answer decode backend: "xla" (ops/decode.py) or "pallas" (fused kernel,
    # ops/pallas/span_decode.py — keeps the (B,T,T) outer product in VMEM).
    # Bit-parity of the two is pinned by tests/test_pallas.py; the measured
    # choice lives in docs/PROFILING.md §5.
    span_decode: str = "xla"

    @classmethod
    def from_config(cls, config: Config) -> "SeqPAN":
        m = config.model
        return cls(dim=m.dim, num_heads=m.num_heads, attn_layer=m.attn_layer,
                   max_vlen=m.max_vlen, word_dim=m.word_dim, char_dim=m.char_dim,
                   num_chars=m.num_chars, tau=config.loss.tau,
                   use_gumbel=not config.loss.no_gumbel,
                   span_decode=m.span_decode,
                   compute_dtype=m.compute_dtype)

    def setup(self):
        self.word_embs = WordEmbedding(self.word_dim)
        self.char_embs = CharEmbedding(self.num_chars, self.char_dim)
        self.query_conv1d = Conv1D(self.dim, use_bias=True)
        self.q_layer_norm = LayerNorm()
        self.video_conv1d = Conv1D(self.dim, use_bias=True)
        self.v_layer_norm = LayerNorm()
        # shared between video and query streams (reference reuse=True,
        # models/model.py:53-58)
        self.pos_emb = PositionalEmbedding(self.max_vlen, self.dim)
        self.conv_block = ConvBlock(self.dim)
        # one block per layer, applied to both directions (reference
        # models/model.py:60-68, second call reuse=True)
        self.d_attn = [DualAttnBlock(self.dim, self.num_heads,
                                     name=f"d_attn_{i}")
                       for i in range(self.attn_layer)]
        self.q2v_attn = CQAttention(self.dim)
        self.v2q_attn = CQAttention(self.dim)
        self.cq_cat = CQConcat(self.dim)
        self.matching_head = MatchingHead(4, self.tau, self.use_gumbel)
        self.label_emb = self.param("label_emb", orthogonal, (4, self.dim))
        self.predictor = ConditionedPredictor(self.dim, self.num_heads,
                                              self.max_vlen)

    def __call__(self, batch: dict[str, jnp.ndarray], word_vectors: jnp.ndarray,
                 drop_rate, match_labels: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> dict[str, jnp.ndarray]:
        v_mask = sequence_mask(batch["video_seq_len"], self.max_vlen)
        q_mask = (batch["word_ids"] != 0).astype(jnp.int32)

        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

        # text encoder
        word_emb = self.word_embs(batch["word_ids"], word_vectors, drop_rate,
                                  deterministic)
        char_emb = self.char_embs(batch["char_ids"], drop_rate, deterministic)
        qfeats = jnp.concatenate([word_emb, char_emb], axis=-1).astype(dt)
        qfeats = self.q_layer_norm(self.query_conv1d(qfeats))

        # video encoder
        vfeats = dropout(self, batch["video_features"].astype(dt), drop_rate,
                         deterministic)
        vfeats = self.v_layer_norm(self.video_conv1d(vfeats))

        # shared positional embedding + conv block
        vfeats = self.conv_block(self.pos_emb(vfeats), drop_rate, deterministic)
        qfeats = self.conv_block(self.pos_emb(qfeats), drop_rate, deterministic)

        # dual attention stack
        for blk in self.d_attn:
            vfeats_ = blk(vfeats, qfeats, v_mask, q_mask, drop_rate, deterministic)
            qfeats_ = blk(qfeats, vfeats, q_mask, v_mask, drop_rate, deterministic)
            vfeats, qfeats = vfeats_, qfeats_

        # CQ fusion
        q2v_feats, _ = self.q2v_attn(vfeats, qfeats, v_mask, q_mask, drop_rate,
                                     deterministic)
        v2q_feats, _ = self.v2q_attn(qfeats, vfeats, q_mask, v_mask, drop_rate,
                                     deterministic)
        fuse_feats = self.cq_cat(q2v_feats, v2q_feats, q_mask)

        # matching head (loss needs labels; scores always computed)
        labels = match_labels if match_labels is not None else jnp.zeros(
            fuse_feats.shape[:2], jnp.int32)
        match_loss, match_scores = self.matching_head(fuse_feats, labels,
                                                      v_mask, deterministic)
        ortho = self.label_emb @ self.label_emb.T * (1.0 - jnp.eye(4))
        match_loss = match_loss + jnp.sqrt(jnp.sum(jnp.square(ortho)))

        soft_label_embs = jnp.einsum(
            "btl,ld->btd", match_scores, self.label_emb,
            preferred_element_type=jnp.float32).astype(fuse_feats.dtype)
        outputs = (fuse_feats + soft_label_embs) * v_mask[:, :, None].astype(
            fuse_feats.dtype)

        start_logits, end_logits = self.predictor(outputs, v_mask, drop_rate,
                                                  drop_rate, deterministic)
        # logits, fusion outputs and everything loss-facing leave in f32
        start_logits = start_logits.astype(jnp.float32)
        end_logits = end_logits.astype(jnp.float32)
        q2v_feats = q2v_feats.astype(jnp.float32)
        v2q_feats = v2q_feats.astype(jnp.float32)
        if self.span_decode == "pallas":
            from hual_tpu.ops.pallas.span_decode import span_decode_pallas

            # interpret mode off-TPU so CPU tests exercise the same wiring
            start_index, end_index = span_decode_pallas(
                start_logits, end_logits, v_mask,
                interpret=jax.default_backend() != "tpu")
        else:
            start_index, end_index = span_decode(start_logits, end_logits,
                                                 v_mask)
        return {
            "v_mask": v_mask, "q_mask": q_mask,
            "q2v_feats": q2v_feats, "v2q_feats": v2q_feats,
            "match_loss": match_loss, "match_scores": match_scores,
            "start_logits": start_logits, "end_logits": end_logits,
            "start_index": start_index, "end_index": end_index,
        }


def seqpan_loss(outputs: dict[str, jnp.ndarray], batch: dict[str, jnp.ndarray],
                match_lambda: float = 1.0) -> tuple[jnp.ndarray, dict[str, Any]]:
    """Total loss = loc + lambda*match + 1.0*align (reference models/model.py:110-120)."""
    loc = localizing_loss(outputs["start_logits"], outputs["end_logits"],
                          batch["y1"], batch["y2"], outputs["v_mask"])
    align = alignment_loss(outputs["v2q_feats"], outputs["q2v_feats"],
                           outputs["q_mask"], outputs["v_mask"],
                           batch["inner_labels"])
    total = loc + match_lambda * outputs["match_loss"] + align * 1.0
    return total, {"loc_loss": loc, "match_loss": outputs["match_loss"],
                   "align_loss": align, "loss": total}
