"""Port reference TF1 SeqPAN checkpoints into hual_tpu flax param trees.

The reference saves TF1 ``Saver`` checkpoints (reference ``main.py:57,71-75``);
this module maps every trainable variable of its graph
(``/root/reference/models/model.py:7-122``) onto the corresponding leaf of
our flax param tree so an existing trained model can be reused without
retraining.  Values copy over verbatim — the two graphs keep identical
parameter shapes (no transposes) — and the map is asserted exhaustive in
both directions against our own graph by tests/test_golden_model.py, which
also pins that the grafted forward/losses agree numerically.

The CLI wrapper lives in tools/port_tf1_checkpoint.py.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

# optimizer slot suffixes created by the reference's hand-rolled AdamW
# (reference models/ops.py:156,161); not model parameters
_SLOT_SUFFIXES = ("/adam_m", "/adam_v")
_NON_PARAM_NAMES = ("global_step",)
# the frozen GloVe matrix is a non-trainable tf.Variable saved inside the
# reference checkpoint (reference models/modules.py:10); in our design the
# word vectors are a pipeline input, not a model parameter
WORD_TABLE = "word_embs/word_table"


def tf_name_to_flax_path(name: str) -> tuple:
    """Map a reference TF1 variable name onto our flax param-tree path.

    Scope-by-scope the graphs line up; the deliberate differences:
      * ``matching_loss`` scope -> our ``matching_head`` module
        (reference models/layers.py:157 vs models/seqpan.py setup)
      * the reference nests LN/attn/FFN of feature_encoder in an extra
        ``multihead_attention_block`` scope (models/modules.py:128) that our
        FeatureEncoder flattens — drop that component
      * TF layer_norm variables are ``layer_norm_scale``/``layer_norm_bias``
        (models/layers.py:11-12); ours are ``scale``/``bias``
    """
    parts = name.split(":")[0].split("/")
    parts = [p for p in parts if p != "multihead_attention_block"]
    if parts[0] == "matching_loss":
        parts[0] = "matching_head"
    tail = {"layer_norm_scale": "scale", "layer_norm_bias": "bias"}
    parts[-1] = tail.get(parts[-1], parts[-1])
    return tuple(parts)


def is_model_variable(name: str) -> bool:
    """True for model parameters; False for optimizer slots, bookkeeping,
    and the frozen GloVe table (returned separately by the port)."""
    base = name.split(":")[0]
    if base in _NON_PARAM_NAMES or base == WORD_TABLE:
        return False
    return not base.endswith(_SLOT_SUFFIXES)


def params_from_tf_values(values: Mapping[str, np.ndarray]) -> dict:
    """Nest a ``{tf_variable_name: array}`` dict into a flax param tree
    ``{"params": {...}}``.  Optimizer slot variables and ``global_step`` are
    skipped; duplicate destination paths are an error."""
    root: dict[str, Any] = {}
    seen: dict[tuple, str] = {}
    for name, value in values.items():
        if not is_model_variable(name):
            continue
        path = tf_name_to_flax_path(name)
        if path in seen:
            raise ValueError(
                f"TF variables {seen[path]!r} and {name!r} both map to "
                f"flax path {path}")
        seen[path] = name
        node = root
        for part in path[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise ValueError(f"path conflict at {part!r} for {name!r}")
        node[path[-1]] = np.asarray(value)
    if not root:
        raise ValueError("no model variables found in the checkpoint")
    return {"params": root}


def load_tf1_checkpoint(ckpt_prefix: str) -> dict:
    """Read every variable of a TF1 ``Saver`` checkpoint into numpy arrays.

    ``ckpt_prefix`` is the Saver path stem (the reference's
    ``ckpt/<task>_/best_SeqPAN.ckpt-<step>``) or a directory containing a
    ``checkpoint`` pointer file, in which case the latest is used — the same
    resolution rule as the reference's ``tf.train.latest_checkpoint``
    (reference main.py:93,109).
    """
    import os

    import tensorflow as tf

    if os.path.isdir(ckpt_prefix):
        resolved = tf.train.latest_checkpoint(ckpt_prefix)
        if resolved is None:
            raise FileNotFoundError(
                f"no TF checkpoint pointer under {ckpt_prefix!r}")
        ckpt_prefix = resolved
    reader = tf.train.load_checkpoint(ckpt_prefix)
    shape_map = reader.get_variable_to_shape_map()
    return {name: reader.get_tensor(name) for name in shape_map}


def port_checkpoint(ckpt_prefix: str, out_dir: str) -> tuple[dict, Any]:
    """Port a reference TF1 checkpoint to an Orbax checkpoint at ``out_dir``
    loadable by :meth:`hual_tpu.runtime.trainer.Trainer.restore`.

    If the checkpoint carries the frozen GloVe matrix
    (``word_embs/word_table``, present in every reference Saver checkpoint),
    it is written as ``<out_dir>_word_vectors.npy`` so the ported model can
    run against exactly the embedding rows it was trained with.

    Returns ``(param_tree, word_vectors_or_None)``.
    """
    import os

    import jax
    import orbax.checkpoint as ocp

    values = load_tf1_checkpoint(ckpt_prefix)
    params = params_from_tf_values(values)
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    ckptr = ocp.StandardCheckpointer()
    out_dir = os.path.abspath(out_dir)
    if os.path.exists(out_dir):
        import shutil
        shutil.rmtree(out_dir)
    ckptr.save(out_dir, params)
    ckptr.wait_until_finished()
    wv = values.get(WORD_TABLE)
    if wv is None:  # Saver readers drop the ':0' suffix, but be permissive
        wv = values.get(WORD_TABLE + ":0")
    if wv is not None:
        np.save(out_dir + "_word_vectors.npy", np.asarray(wv, np.float32))
    return params, wv
