"""TF1-checkpoint porting (hual_tpu/utils/tf1_port.py).

A reference user's trained Saver checkpoints must load into our flax tree
without retraining (docs/MIGRATION.md).  test_golden_model.py pins that the
grafted weights produce numerically identical forwards/losses; this file
pins the FILE path: a real TF1 ``Saver`` checkpoint of the reference graph
(reference main.py:57,71-75) round-trips through ``port_checkpoint`` into an
Orbax checkpoint whose every leaf equals the session values, with the frozen
GloVe matrix extracted alongside.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

from hual_tpu.utils.tf1_port import (is_model_variable, params_from_tf_values,
                                     tf_name_to_flax_path)

REFERENCE = "/root/reference"

# tiny but structurally complete shapes (dim % heads == 0; one sample at
# full T so the reference's dynamic reduce_max mask spans max_vlen)
B, T, W, C = 4, 16, 6, 8
DIM, HEADS, LAYERS = 16, 2, 1
WORD_DIM, CHAR_DIM, VOCAB, CHARS = 24, 8, 30, 20


def test_params_from_tf_values_filters_and_nests():
    values = {
        "pos/emb:0": np.ones((3, 2), np.float32),
        "pos/emb/adam_m": np.zeros((3, 2), np.float32),
        "pos/emb/adam_v": np.zeros((3, 2), np.float32),
        "global_step": np.int64(7),
        "word_embs/word_table": np.ones((5, 2), np.float32),
        "word_embs/unk:0": np.ones((1, 2), np.float32),
        "matching_loss/dense/kernel": np.ones((2, 4), np.float32),
        "feature_encoder/multihead_attention_block/layer_norm_scale":
            np.ones((2,), np.float32),
    }
    tree = params_from_tf_values(values)
    p = tree["params"]
    assert set(p) == {"pos", "word_embs", "matching_head", "feature_encoder"}
    assert p["pos"]["emb"].shape == (3, 2)           # slots/global_step gone
    assert "word_table" not in p["word_embs"]        # GloVe is not a param
    assert p["feature_encoder"]["scale"].shape == (2,)  # scope + LN renames
    assert not is_model_variable("a/adam_m")
    assert not is_model_variable("global_step")

    with pytest.raises(ValueError, match="both map"):
        params_from_tf_values({
            "matching_loss/w:0": np.zeros(1, np.float32),
            "matching_head/w:0": np.zeros(1, np.float32),
        })


@pytest.fixture(scope="module")
def saved_reference_ckpt(tmp_path_factory):
    """Build the reference graph at tiny shapes, Saver-save it, and return
    (ckpt_dir, {var_name: value}, word_vectors)."""
    import types

    sys.path.insert(0, REFERENCE)
    try:
        import tensorflow as tf
    except ImportError:  # pragma: no cover
        pytest.skip("tensorflow unavailable")
    tf.compat.v1.disable_eager_execution()
    tf.compat.v1.reset_default_graph()
    tf.compat.v1.set_random_seed(7)

    from models.model import SeqPAN as RefSeqPAN  # noqa: E402

    configs = types.SimpleNamespace(
        num_chars=CHARS,
        model=types.SimpleNamespace(vdim=32, dim=DIM, num_heads=HEADS,
                                    attn_layer=LAYERS, max_vlen=T,
                                    word_dim=WORD_DIM, char_dim=CHAR_DIM),
        train=types.SimpleNamespace(batch_size=B, clip_norm=1.0,
                                    droprate=0.2, lr=1e-4),
        loss=types.SimpleNamespace(no_gumbel=True, tau=0.3, match_lambda=1.0),
    )
    rng = np.random.default_rng(3)
    word_vectors = rng.normal(size=(VOCAB - 2, WORD_DIM)).astype(np.float32)

    graph = tf.Graph()
    RefSeqPAN(configs, graph, word_vectors=word_vectors)
    with graph.as_default():
        gvars = tf.compat.v1.global_variables()
        init = tf.compat.v1.global_variables_initializer()
        saver = tf.compat.v1.train.Saver(max_to_keep=3)
    sess = tf.compat.v1.Session(graph=graph)
    sess.run(init)
    values = dict(zip([v.name for v in gvars], sess.run(gvars)))

    ckpt_dir = str(tmp_path_factory.mktemp("tf1_ckpt"))
    saver.save(sess, os.path.join(ckpt_dir, "best_SeqPAN.ckpt"),
               global_step=42)
    sess.close()
    return ckpt_dir, values, word_vectors


def test_port_checkpoint_roundtrip(saved_reference_ckpt, tmp_path):
    ckpt_dir, values, word_vectors = saved_reference_ckpt

    from hual_tpu.utils.tf1_port import port_checkpoint

    out = str(tmp_path / "ported")
    params, wv = port_checkpoint(ckpt_dir, out)  # dir form: latest wins

    # the frozen GloVe matrix came out intact, as tree return and .npy
    np.testing.assert_array_equal(wv, word_vectors)
    np.testing.assert_array_equal(np.load(out + "_word_vectors.npy"),
                                  word_vectors)

    # every model variable landed at its mapped path with its session value
    model_vars = {n: v for n, v in values.items() if is_model_variable(n)}
    assert model_vars, "fixture produced no model variables"
    import jax
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    by_path = {tuple(getattr(k, "key", str(k)) for k in path): leaf
               for path, leaf in flat}
    assert len(by_path) == len(model_vars)
    for name, value in model_vars.items():
        np.testing.assert_array_equal(by_path[tf_name_to_flax_path(name)],
                                      value, err_msg=name)


def test_ported_tree_matches_flax_init_structure(saved_reference_ckpt,
                                                 tmp_path):
    """The ported tree is structurally identical to a fresh model.init at
    the same config — i.e. Trainer.restore(target=init) accepts it."""
    ckpt_dir, _, word_vectors = saved_reference_ckpt

    import jax
    import orbax.checkpoint as ocp

    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.utils.tf1_port import port_checkpoint

    out = str(tmp_path / "ported2")
    ported, _ = port_checkpoint(ckpt_dir, out)

    model = SeqPAN(dim=DIM, num_heads=HEADS, attn_layer=LAYERS, max_vlen=T,
                   word_dim=WORD_DIM, char_dim=CHAR_DIM, num_chars=CHARS,
                   tau=0.3, use_gumbel=False)
    rng = np.random.default_rng(5)
    v_len = np.array([T, 5, 9, T // 2], np.int32)
    batch = {
        "video_features": rng.normal(size=(B, T, 32)).astype(np.float32),
        "video_seq_len": v_len,
        "word_ids": np.concatenate(
            [rng.integers(1, VOCAB, size=(B, 4)),
             np.zeros((B, W - 4))], axis=1).astype(np.int32),
        "char_ids": rng.integers(1, CHARS, size=(B, W, C)).astype(np.int32),
    }
    init = model.init({"params": jax.random.key(0)}, batch,
                      word_vectors, 0.0, deterministic=True)

    same_struct = (jax.tree_util.tree_structure(init)
                   == jax.tree_util.tree_structure(ported))
    assert same_struct, "ported tree differs structurally from model.init"
    for a, b in zip(jax.tree_util.tree_leaves(init),
                    jax.tree_util.tree_leaves(ported)):
        assert np.shape(a) == np.shape(b)

    # and Orbax restores it against the init target (the Trainer.restore
    # call pattern, runtime/trainer.py)
    restored = ocp.StandardCheckpointer().restore(
        os.path.abspath(out), target=jax.device_get(init))
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(ported)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ported_checkpoint_serves(saved_reference_ckpt, tmp_path):
    """Migration x serving COMPOSE: a reference TF1 Saver checkpoint, ported
    (utils/tf1_port.py), exported as a serving bundle (serve.export_bundle)
    and loaded back (Predictor.from_bundle), decodes the SAME spans on raw
    requests as the reference graph restored from that very checkpoint.

    This is the end-to-end path a reference user takes to deploy a trained
    model on TPU without retraining (docs/MIGRATION.md): TF1 ckpt -> port ->
    bundle -> fixed-shape compiled Predictor.
    """
    import types

    import tensorflow as tf

    from hual_tpu.config import (Config, LossConfig, ModelConfig, PathsConfig,
                                 TrainConfig)
    from hual_tpu.serve import Predictor, export_bundle
    from hual_tpu.utils.metrics import index_to_time
    from hual_tpu.utils.tf1_port import port_checkpoint

    ckpt_dir, _, word_vectors = saved_reference_ckpt
    ported, wv = port_checkpoint(ckpt_dir, str(tmp_path / "ported_serve"))
    np.testing.assert_array_equal(wv, word_vectors)

    # synthetic vocab at the graph's sizes: [PAD, UNK] + VOCAB-2 words whose
    # GloVe rows are the checkpoint's frozen word table
    corpus = [f"word{i}" for i in range(VOCAB - 2)]
    word_dict = {w: i for i, w in enumerate(["<PAD>", "<UNK>"] + corpus)}
    chars = list("abcdefghijklmnopqr")[:CHARS - 2]
    char_dict = {c: i for i, c in enumerate(["<PAD>", "<UNK>"] + chars)}

    config = Config(
        task="charades", suffix="re0",
        paths=PathsConfig(ckpt_dir="unused", cache_dir="unused",
                          feature_path="unused", glove_path="unused",
                          train_path="unused", test_path="unused"),
        train=TrainConfig(epochs=1, batch_size=B),
        model=ModelConfig(name="SeqPAN", max_vlen=T, max_tlen=W, vdim=32,
                          dim=DIM, num_heads=HEADS, word_dim=WORD_DIM,
                          char_dim=CHAR_DIM, attn_layer=LAYERS,
                          num_chars=CHARS),
        loss=LossConfig(no_gumbel=True, tau=0.3),
    )
    trainer = types.SimpleNamespace(
        state=types.SimpleNamespace(params=ported),
        dataset={"word_vector": wv, "word_dict": word_dict,
                 "char_dict": char_dict},
        config=config,
        train_set=types.SimpleNamespace(max_wlen=W, max_clen=C),
    )
    bundle = export_bundle(trainer, str(tmp_path / "bundle"))
    pred = Predictor.from_bundle(bundle, batch_size=B)

    # raw requests: full-length, downsampled (>max_vlen) and short videos;
    # queries mix known words and an OOV token (UNK on both sides)
    rng = np.random.default_rng(11)
    # request 0 fills max_wlen words: the reference's ragged graph computes at
    # batch-max width, our compiled program at the static width — they agree
    # exactly when the batch-max hits the static bound (same condition as in
    # training, docs/PARITY.md "Fixed shapes"; kernel-7 convs over the word
    # axis see pad columns, so narrower batches differ in float noise)
    requests = [
        (rng.normal(size=(T, 32)).astype(np.float32), 24.0,
         "word0 word5 word11 word2 word8 word9"),
        (rng.normal(size=(2 * T + 3, 32)).astype(np.float32), 31.5,
         "word3 zzzunseen word7 word19"),
        (rng.normal(size=(7, 32)).astype(np.float32), 12.0,
         "word27 word1 word2 word4"),
    ]
    results = pred.predict_batch(requests)

    # the reference graph, restored FROM THE SAME CHECKPOINT, on the same
    # encoded inputs (Predictor's public encoders produce the feed)
    tf.compat.v1.reset_default_graph()
    from models.model import SeqPAN as RefSeqPAN  # noqa: E402

    configs = types.SimpleNamespace(
        num_chars=CHARS,
        model=types.SimpleNamespace(vdim=32, dim=DIM, num_heads=HEADS,
                                    attn_layer=LAYERS, max_vlen=T,
                                    word_dim=WORD_DIM, char_dim=CHAR_DIM),
        train=types.SimpleNamespace(batch_size=B, clip_norm=1.0,
                                    droprate=0.2, lr=1e-4),
        loss=types.SimpleNamespace(no_gumbel=True, tau=0.3, match_lambda=1.0),
    )
    graph = tf.Graph()
    ref = RefSeqPAN(configs, graph, word_vectors=word_vectors)
    with graph.as_default():
        saver = tf.compat.v1.train.Saver()
    sess = tf.compat.v1.Session(graph=graph)
    saver.restore(sess, tf.train.latest_checkpoint(ckpt_dir))

    n = len(requests)
    vf = np.zeros((n, T, 32), np.float32)
    vl = np.zeros((n,), np.int32)
    wid = np.zeros((n, W), np.int32)
    cid = np.zeros((n, W, C), np.int32)
    for i, (feats, _, query) in enumerate(requests):
        vf[i], vl[i] = pred.encode_video(feats)
        wid[i], cid[i] = pred.encode_query(query)
    assert wid[1, 1] == word_dict["<UNK>"], "OOV word should map to UNK"
    # the reference's ragged loaders always feed batch-max-trimmed word ids
    # (its trilinear attention hard-requires width == max(sum(q_mask)));
    # our fixed-width padding is mask-correct so the outputs are comparable
    wmax = int((wid != 0).sum(axis=1).max())
    ref_si, ref_ei = sess.run(
        [ref.start_index, ref.end_index],
        feed_dict={ref.video_inputs: vf, ref.video_seq_len: vl,
                   ref.word_ids: wid[:, :wmax], ref.char_ids: cid[:, :wmax]})
    sess.close()

    for i, r in enumerate(results):
        assert r["start_index"] == int(ref_si[i]), i
        assert r["end_index"] == int(ref_ei[i]), i
        s_t, e_t = index_to_time(int(ref_si[i]), int(ref_ei[i]),
                                 int(vl[i]), requests[i][1])
        assert r["start_time"] == pytest.approx(s_t)
        assert r["end_time"] == pytest.approx(e_t)
        assert r["v_len"] == int(vl[i])
