"""Data-parallel sharding over the virtual 8-device CPU mesh.

Validates that the jitted train/infer steps compile and execute with the
batch sharded over the `data` mesh axis and params replicated, and that the
DP gradient all-reduce gives (numerically) the same update as single-device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hual_tpu.data.labels import make_span_labels
from hual_tpu.models.seqpan import SeqPAN
from hual_tpu.ops.optim import make_optimizer
from hual_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from hual_tpu.runtime.steps import make_infer_step, make_train_step


def _tiny_batch(B=16, T=8, W=6, C=4, V=16, seed=0):
    rng = np.random.default_rng(seed)
    batch = {
        "video_features": rng.normal(size=(B, T, V)).astype(np.float32),
        "video_seq_len": rng.integers(2, T + 1, size=B).astype(np.int32),
        "word_ids": np.concatenate(
            [rng.integers(1, 20, size=(B, 4)), np.zeros((B, W - 4))],
            axis=1).astype(np.int32),
        "char_ids": rng.integers(0, 10, size=(B, W, C)).astype(np.int32),
        "duration": rng.uniform(10, 30, size=B).astype(np.float32),
    }
    s = (rng.uniform(0, 0.5, B) * batch["video_seq_len"]).astype(np.int32)
    e = np.minimum(s + rng.integers(0, 4, B), batch["video_seq_len"] - 1).astype(np.int32)
    batch["s_ind"], batch["e_ind"] = s, np.maximum(e, s)
    y1, y2, match, inner = make_span_labels(batch["s_ind"], batch["e_ind"],
                                            batch["video_seq_len"], T)
    batch.update(y1=y1, y2=y2, match_labels=match,
                 inner_labels=inner.astype(np.float32))
    return batch


@pytest.fixture(scope="module")
def setup():
    model = SeqPAN(dim=16, num_heads=2, attn_layer=1, max_vlen=8,
                   word_dim=32, char_dim=4, num_chars=10)
    tx = make_optimizer(1.0, 0.01)
    batch = _tiny_batch()
    wv = np.random.default_rng(1).normal(size=(25, 32)).astype(np.float32)
    params = model.init({"params": jax.random.key(0)}, batch, wv, 0.0,
                        batch["match_labels"], deterministic=True)
    return model, tx, batch, wv, params


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dp_train_step_matches_single_device(setup):
    model, tx, batch, wv, params = setup
    train_step = jax.jit(make_train_step(model, tx, 1.0, 0.0))
    rng = jax.random.key(3)
    lr = jnp.float32(1e-3)

    # single device
    p1 = jax.tree.map(jnp.copy, params)
    o1 = tx.init(p1)
    p1, o1, m1 = train_step(p1, o1, batch, wv, lr, rng)

    # 8-way data parallel
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    p2 = jax.device_put(params, repl)
    o2 = jax.device_put(tx.init(p2), repl)
    sharded = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    p2, o2, m2 = train_step(p2, o2, sharded, jax.device_put(wv, repl), lr, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_indexed_steps_dp_sharded(setup):
    """The production data path: device-resident dataset (replicated), sel
    sharded over the data axis, labels synthesized on device."""
    from hual_tpu.runtime.steps import (make_eval_step_indexed,
                                        make_train_step_indexed)

    model, tx, batch, wv, params = setup
    B = batch["s_ind"].shape[0]
    mesh = make_mesh()
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    data = {
        "features": batch["video_features"],
        "feat_rows": np.arange(B, dtype=np.int32),
        "word_ids": batch["word_ids"], "char_ids": batch["char_ids"],
        "s_ind": batch["s_ind"], "e_ind": batch["e_ind"],
        "v_len": batch["video_seq_len"], "duration": batch["duration"],
    }
    data = {k: jax.device_put(v, repl) for k, v in data.items()}
    sel = jax.device_put(np.arange(B, dtype=np.int32), bsh)

    # indexed train step == batch train step numerics
    t_idx = jax.jit(make_train_step_indexed(model, tx, 1.0, 0.0))
    t_batch = jax.jit(make_train_step(model, tx, 1.0, 0.0))
    lr, rng = jnp.float32(1e-3), jax.random.key(5)
    p1, o1, m1 = t_idx(jax.device_put(params, repl),
                       jax.device_put(tx.init(params), repl), data, sel,
                       jax.device_put(wv, repl), lr, rng)
    p2, o2, m2 = t_batch(params, tx.init(params), batch, wv, lr, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)

    e_idx = jax.jit(make_eval_step_indexed(model))
    out = e_idx(jax.device_put(params, repl), data, sel,
                jax.device_put(wv, repl))
    assert out["ious"].shape == (B,)


def test_dp_infer_step_runs_sharded(setup):
    model, _, batch, wv, params = setup
    infer_step = jax.jit(make_infer_step(model, 0.5))
    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    sharded = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    out = infer_step(jax.device_put(params, replicated(mesh)), sharded,
                     jax.device_put(wv, replicated(mesh)), jax.random.key(0))
    assert out["start_logits"].shape == (16, 8)
    assert np.all(np.asarray(out["ious"]) >= 0)
    # MC passes differ
    assert not np.allclose(np.asarray(out["start_logits1"]),
                           np.asarray(out["start_logits2"]))


def test_two_dim_mesh_model_axis(setup):
    """(data=4, model=2) mesh: the reserved model axis composes with DP."""
    model, tx, batch, wv, params = setup
    mesh = make_mesh(model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    train_step = jax.jit(make_train_step(model, tx, 1.0, 0.0))
    p = jax.device_put(params, replicated(mesh))
    o = jax.device_put(tx.init(p), replicated(mesh))
    sharded = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in batch.items()}
    p, o, m = train_step(p, o, sharded, jax.device_put(wv, replicated(mesh)),
                         jnp.float32(1e-3), jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_sharded_feature_table_matches_replicated(setup):
    """Row-sharding the feature table over every mesh device (the per-chip
    HBM win that makes ActivityNet fit) must not change the training step:
    same loss, same updated params as the replicated table.  The GloVe
    matrix is likewise row-sharded over the model axis."""
    from hual_tpu.parallel.mesh import (feature_sharding, pad_rows,
                                        vocab_sharding)
    from hual_tpu.runtime.steps import make_train_step_indexed

    model, tx, batch, wv, params = setup
    B = batch["s_ind"].shape[0]
    mesh = make_mesh(model_parallel=2)
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    base = {
        "feat_rows": np.arange(B, dtype=np.int32),
        "word_ids": batch["word_ids"], "char_ids": batch["char_ids"],
        "s_ind": batch["s_ind"], "e_ind": batch["e_ind"],
        "v_len": batch["video_seq_len"], "duration": batch["duration"],
    }
    step = jax.jit(make_train_step_indexed(model, tx, 1.0, 0.0))
    lr, rng = jnp.float32(1e-3), jax.random.key(5)
    sel = jax.device_put(np.arange(B, dtype=np.int32), bsh)

    outs = []
    for sharded_tables in (False, True):
        data = {k: jax.device_put(v, repl) for k, v in base.items()}
        if sharded_tables:
            feats = pad_rows(batch["video_features"], mesh.size)
            data["features"] = jax.device_put(feats, feature_sharding(mesh))
            wv_dev = jax.device_put(pad_rows(wv, 2), vocab_sharding(mesh))
        else:
            data["features"] = jax.device_put(batch["video_features"], repl)
            wv_dev = jax.device_put(wv, repl)
        p = jax.device_put(params, repl)
        o = jax.device_put(tx.init(params), repl)
        p, o, m = step(p, o, data, sel, wv_dev, lr, rng)
        outs.append((float(m["loss"]), jax.tree.leaves(jax.device_get(p))))

    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    for a, b in zip(outs[0][1], outs[1][1]):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


def test_feature_table_memory_actually_shards(setup):
    """The per-chip HBM claim, checked concretely: each device holds exactly
    rows/mesh.size of the table (and of the vocab over the model axis),
    not a replica."""
    from hual_tpu.parallel.mesh import (feature_sharding, pad_rows,
                                        vocab_sharding)

    model, tx, batch, wv, params = setup
    mesh = make_mesh(model_parallel=2)
    feats = pad_rows(batch["video_features"], mesh.size)
    tab = jax.device_put(feats, feature_sharding(mesh))
    shard_rows = {s.data.shape[0] for s in tab.addressable_shards}
    assert shard_rows == {feats.shape[0] // mesh.size}
    assert len(tab.addressable_shards) == mesh.size

    wv_pad = pad_rows(wv, 2)
    wv_dev = jax.device_put(wv_pad, vocab_sharding(mesh))
    vocab_rows = {s.data.shape[0] for s in wv_dev.addressable_shards}
    assert vocab_rows == {wv_pad.shape[0] // 2}


def test_bf16_feature_table_step(setup):
    """bf16 table storage: gather_batch casts the gathered rows to f32; the
    step runs and stays finite on the sharded mesh."""
    import ml_dtypes

    from hual_tpu.parallel.mesh import feature_sharding, pad_rows
    from hual_tpu.runtime.steps import make_train_step_indexed

    model, tx, batch, wv, params = setup
    B = batch["s_ind"].shape[0]
    mesh = make_mesh()
    repl = replicated(mesh)
    data = {
        "feat_rows": np.arange(B, dtype=np.int32),
        "word_ids": batch["word_ids"], "char_ids": batch["char_ids"],
        "s_ind": batch["s_ind"], "e_ind": batch["e_ind"],
        "v_len": batch["video_seq_len"], "duration": batch["duration"],
    }
    data = {k: jax.device_put(v, repl) for k, v in data.items()}
    feats16 = pad_rows(batch["video_features"].astype(ml_dtypes.bfloat16),
                       mesh.size)
    data["features"] = jax.device_put(feats16, feature_sharding(mesh))
    step = jax.jit(make_train_step_indexed(model, tx, 1.0, 0.0))
    sel = jax.device_put(np.arange(B, dtype=np.int32), batch_sharding(mesh))
    p, o, m = step(jax.device_put(params, repl),
                   jax.device_put(tx.init(params), repl), data, sel,
                   jax.device_put(wv, repl), jnp.float32(1e-3),
                   jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
