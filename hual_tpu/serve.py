"""Deployment-facing inference API: (video features, query) -> moment span.

The reference has no serving story — its only inference paths are the
per-epoch test loop and the AL train-set sweep, both driven by dataset
pickles (`main.py:82-113`, `utils/runner_utils.py:69-110`).  A user deploying
a trained moment-retrieval model needs the inverse packaging: ONE artifact
that carries everything inference requires (params, vocab, feature bounds),
loadable without the training corpus, GloVe file, or feature directory, and a
latency-oriented predict call.

Design (TPU-first):

* ``export_bundle(trainer, path)`` writes a self-contained directory:
  ``params.npz`` (the flax tree flattened to path-keyed arrays — no Orbax
  target-tree dance at load time), ``word_vectors.npy`` (the frozen GloVe
  rows the word embedding takes as an argument), ``vocab.json`` and
  ``meta.json`` (full Config + packed text bounds).
* ``Predictor`` compiles ONE fixed-shape XLA program per (batch_size): the
  deterministic forward + span decode + span confidence.  Requests are
  padded to the compiled batch (repeating the last row, like EvalLoader) so
  any request count reuses the same trace — no retraces in a serving loop.
* Host preprocessing mirrors the training pipeline exactly: the same
  tokenizer (`data/tokenize.py`), the same UNK fallback (`data/datasets.py::
  dataset_gen`), the same word-truncation quirk (words cut at max_vlen —
  reference utils/data_gen.py:106), the same mean-pool downsampling for
  videos longer than max_vlen (`data/features.py::visual_feature_sampling`),
  and the trainer time convention s=i*dur/T, e=(i+1)*dur/T
  (reference utils/data_utils.py:121-127).

The per-call cost on a real deployment is one dispatch + one value fetch;
batching requests amortizes it (tools/bench_serve.py measures both).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Sequence

import numpy as np

from hual_tpu.config import Config
from hual_tpu.data.features import visual_feature_sampling
from hual_tpu.data.tokenize import tokenize
from hual_tpu.data.vocab import UNK
from hual_tpu.utils.metrics import index_to_time

_META = "meta.json"
_PARAMS = "params.npz"
_VOCAB = "vocab.json"
_WORDVECS = "word_vectors.npy"


def _flatten_params(params: dict) -> dict[str, np.ndarray]:
    """Flax tree -> {'params/a/b': array} (path keys never contain '/')."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                       for k in path)
        out[key] = np.asarray(leaf)
    return out


def _unflatten_like(template: dict, values: dict[str, np.ndarray]) -> dict:
    """Rebuild a tree with the template's structure from path-keyed arrays."""
    import jax
    import jax.numpy as jnp

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, tmpl in flat:
        key = "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                       for k in path)
        if key not in values:
            raise ValueError(f"bundle params.npz is missing leaf {key!r}")
        v = values[key]
        if tuple(v.shape) != tuple(tmpl.shape):
            raise ValueError(f"bundle leaf {key!r} has shape {v.shape}, "
                             f"model expects {tuple(tmpl.shape)}")
        leaves.append(jnp.asarray(v))
    extra = set(values) - {
        "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in p)
        for p, _ in flat}
    if extra:
        raise ValueError(f"bundle params.npz has unknown leaves {sorted(extra)}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def export_bundle(trainer, path: str) -> str:
    """Write a self-contained serving bundle from a (trained) Trainer.

    Contents: flattened params, frozen GloVe rows, word/char vocab, the full
    Config plus the packed text bounds (max_wlen/max_clen) the training
    pipeline derived from the corpus.  Returns ``path``.
    """
    import jax

    assert trainer.state is not None, "init_state()/train() the trainer first"
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, _PARAMS),
             **_flatten_params(jax.device_get(trainer.state.params)))
    np.save(os.path.join(path, _WORDVECS),
            np.asarray(trainer.dataset["word_vector"], np.float32))
    with open(os.path.join(path, _VOCAB), "w") as f:
        json.dump({"word_dict": trainer.dataset["word_dict"],
                   "char_dict": trainer.dataset["char_dict"]}, f)
    meta = {"config": trainer.config.to_dict(),
            "max_wlen": int(trainer.train_set.max_wlen),
            "max_clen": int(trainer.train_set.max_clen),
            "format_version": 1}
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return path


class Predictor:
    """Fixed-shape compiled moment-retrieval inference.

    One XLA program per batch_size; requests beyond it run in padded chunks.
    ``predict``/``predict_batch`` each end on a host value fetch — the
    returned floats ARE the sync point (the only trusted one through this
    environment's tunnel, docs/PROFILING.md §1).
    """

    def __init__(self, config: Config, params: dict,
                 word_dict: dict[str, int], char_dict: dict[str, int],
                 word_vectors: np.ndarray, max_wlen: int, max_clen: int,
                 batch_size: int = 8):
        import jax
        import jax.numpy as jnp

        from hual_tpu.models import get_model_class
        from hual_tpu.ops.masking import mask_logits

        self.config = config
        self.model = get_model_class(config.model.name).from_config(config)
        self.word_dict = word_dict
        self.char_dict = char_dict
        self.max_wlen, self.max_clen = int(max_wlen), int(max_clen)
        self.batch_size = int(batch_size)
        self.max_vlen = int(config.model.max_vlen)
        self.vdim = int(config.model.vdim)
        self._unk_w = word_dict[UNK]
        self._unk_c = char_dict[UNK]
        self._params = jax.tree.map(jnp.asarray, params)
        self._word_vectors = jnp.asarray(word_vectors, jnp.float32)

        model = self.model

        def forward(p, batch, wv):
            out = model.apply(p, batch, wv, 0.0, deterministic=True)
            # span confidence: the decoded span's upper-triangular outer-
            # product probability (the quantity ans_predictor argmaxes,
            # reference models/layers.py:194-203)
            sp = jax.nn.softmax(
                mask_logits(out["start_logits"], out["v_mask"]), axis=-1)
            ep = jax.nn.softmax(
                mask_logits(out["end_logits"], out["v_mask"]), axis=-1)
            outer = sp[:, :, None] * ep[:, None, :]
            band = jnp.triu(jnp.ones(outer.shape[-2:], outer.dtype))
            score = jnp.max(outer * band[None], axis=(1, 2))
            return out["start_index"], out["end_index"], score

        self._forward = jax.jit(forward)

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_bundle(cls, path: str, batch_size: int = 8) -> "Predictor":
        with open(os.path.join(path, _META)) as f:
            meta = json.load(f)
        config = Config.from_dict(meta["config"])
        with open(os.path.join(path, _VOCAB)) as f:
            vocab = json.load(f)
        word_vectors = np.load(os.path.join(path, _WORDVECS))
        raw = dict(np.load(os.path.join(path, _PARAMS)))
        self = cls(config, params={}, word_dict=vocab["word_dict"],
                   char_dict=vocab["char_dict"], word_vectors=word_vectors,
                   max_wlen=meta["max_wlen"], max_clen=meta["max_clen"],
                   batch_size=batch_size)
        # shape/structure-check the stored leaves against a fresh init
        import jax

        template = self.model.init(
            {"params": jax.random.key(0)},
            self._dummy_batch(), self._word_vectors, 0.0, deterministic=True)
        self._params = _unflatten_like(template, raw)
        return self

    @classmethod
    def from_trainer(cls, trainer, batch_size: int = 8) -> "Predictor":
        import jax

        assert trainer.state is not None
        return cls(trainer.config, jax.device_get(trainer.state.params),
                   trainer.dataset["word_dict"], trainer.dataset["char_dict"],
                   np.asarray(trainer.dataset["word_vector"], np.float32),
                   trainer.train_set.max_wlen, trainer.train_set.max_clen,
                   batch_size=batch_size)

    # -- host-side encoding (mirrors the training pipeline) -----------------
    def _dummy_batch(self) -> dict:
        import jax.numpy as jnp

        b = self.batch_size
        return {"video_features": jnp.zeros((b, self.max_vlen, self.vdim),
                                            jnp.float32),
                "video_seq_len": jnp.ones((b,), jnp.int32),
                "word_ids": jnp.ones((b, self.max_wlen), jnp.int32),
                "char_ids": jnp.ones((b, self.max_wlen, self.max_clen),
                                     jnp.int32)}

    def encode_query(self, query: str) -> tuple[np.ndarray, np.ndarray]:
        """Tokenize + vocab-map one query to fixed-shape id arrays.

        Same tokenizer and UNK fallback as dataset_gen (data/datasets.py:
        70-80); words truncated at max_vlen first (the reference's quirk,
        utils/data_gen.py:106) and then at the packed width max_wlen.
        """
        words = tokenize(query)[:self.max_vlen][:self.max_wlen]
        word_ids = np.zeros((self.max_wlen,), np.int32)
        char_ids = np.zeros((self.max_wlen, self.max_clen), np.int32)
        for j, w in enumerate(words):
            word_ids[j] = self.word_dict.get(w, self._unk_w)
            for k, c in enumerate(w[:self.max_clen]):
                char_ids[j, k] = self.char_dict.get(c, self._unk_c)
        return word_ids, char_ids

    def encode_video(self, features: np.ndarray) -> tuple[np.ndarray, int]:
        """(n_clips, vdim) raw features -> (max_vlen, vdim) padded + v_len.

        Videos longer than max_vlen are mean-pool downsampled exactly like
        the training feature store (reference utils/data_utils.py:70-85).
        """
        feats = np.asarray(features, np.float32)
        if feats.ndim != 2 or feats.shape[1] != self.vdim:
            raise ValueError(f"features must be (n_clips, {self.vdim}), "
                             f"got {feats.shape}")
        if feats.shape[0] == 0:
            raise ValueError("empty video")
        if feats.shape[0] > self.max_vlen:
            feats = visual_feature_sampling(feats, self.max_vlen)
        v_len = feats.shape[0]
        if v_len < self.max_vlen:
            feats = np.concatenate(
                [feats, np.zeros((self.max_vlen - v_len, self.vdim),
                                 np.float32)], axis=0)
        return feats, v_len

    # -- inference -----------------------------------------------------------
    def warmup(self) -> None:
        """Trigger the one-time XLA compile off the request path."""
        import jax

        out = self._forward(self._params, self._dummy_batch(),
                            self._word_vectors)
        jax.device_get(out)

    def predict(self, features: np.ndarray, duration: float,
                query: str) -> dict[str, Any]:
        """One request -> {'start_time','end_time','score',...} seconds."""
        return self.predict_batch([(features, duration, query)])[0]

    def predict_batch(self, requests: Sequence[tuple[np.ndarray, float, str]]
                      ) -> list[dict[str, Any]]:
        """Batched requests, chunked/padded to the compiled batch size.

        Padding repeats the chunk's last row (like EvalLoader.pad_to_batch)
        so padded rows are well-formed; their outputs are sliced away.
        """
        import jax

        n = len(requests)
        if n == 0:
            return []
        results: list[Optional[dict]] = [None] * n
        bs = self.batch_size
        for lo in range(0, n, bs):
            chunk = list(requests[lo:lo + bs])
            valid = len(chunk)
            chunk += [chunk[-1]] * (bs - valid)
            vf = np.zeros((bs, self.max_vlen, self.vdim), np.float32)
            vl = np.zeros((bs,), np.int32)
            wid = np.zeros((bs, self.max_wlen), np.int32)
            cid = np.zeros((bs, self.max_wlen, self.max_clen), np.int32)
            for i, (feats, _, query) in enumerate(chunk):
                vf[i], vl[i] = self.encode_video(feats)
                wid[i], cid[i] = self.encode_query(query)
            batch = {"video_features": vf, "video_seq_len": vl,
                     "word_ids": wid, "char_ids": cid}
            s_idx, e_idx, score = jax.device_get(
                self._forward(self._params, batch, self._word_vectors))
            for i in range(valid):
                dur = float(chunk[i][1])
                s_t, e_t = index_to_time(int(s_idx[i]), int(e_idx[i]),
                                         int(vl[i]), dur)
                results[lo + i] = {
                    "start_time": s_t, "end_time": e_t,
                    "score": float(score[i]),
                    "start_index": int(s_idx[i]), "end_index": int(e_idx[i]),
                    "v_len": int(vl[i]),
                }
        return results  # type: ignore[return-value]
