import os

from hual_tpu.config import Config, TrainConfig


def test_load_reference_yaml_schema(tmp_path):
    # the shipped configs use the exact reference schema
    cfg = Config.load("configs/charades/SeqPAN.yaml")
    assert cfg.task == "charades"
    assert cfg.train.epochs == 50 and cfg.train.batch_size == 16
    assert cfg.model.max_vlen == 64 and cfg.model.dim == 128
    assert cfg.loss.no_gumbel is True and cfg.loss.tau == 0.3

    cfg2 = Config.load("configs/anet/SeqPAN.yaml")
    assert cfg2.model.max_vlen == 100 and cfg2.model.char_dim == 100
    assert cfg2.train.epochs == 100


def test_save_load_roundtrip(tmp_path):
    cfg = Config.load("configs/charades/SeqPAN.yaml")
    p = str(tmp_path / "cfg.yaml")
    cfg.save(p)
    cfg2 = Config.load(p)
    assert cfg2.to_dict() == cfg.to_dict()


def test_derive_round():
    cfg = Config.load("configs/charades/SeqPAN.yaml")
    r2 = cfg.derive_round(2)
    assert r2.suffix == "re2"
    assert r2.paths.train_path == "./data/charades_re2/train.json"
    assert r2.paths.test_path == "./data/charades_re2/test.json"
    # base untouched
    assert cfg.suffix == "" and "gt" in cfg.paths.train_path
    # a non-default data_root (run_rounds plumbs its own) lands in the paths,
    # so the label updater and the trainer always share one tree
    r3 = cfg.derive_round(3, data_root="/tmp/exp/data")
    assert r3.paths.train_path == "/tmp/exp/data/charades_re3/train.json"
    assert r3.paths.test_path == "/tmp/exp/data/charades_re3/test.json"


def test_batch_size_properties():
    cfg = Config.load("configs/charades/SeqPAN.yaml")
    # eval default = max(96, batch): measured eval-sweep optimum region
    # (results/eval_batch_bench.json); metrics are batch-invariant
    assert cfg.eval_batch_size == 96
    assert Config(train=TrainConfig(batch_size=128)).eval_batch_size == 128
    # default sweep batch = max(96, batch_size): 96 measured optimal on the
    # v5e grid (results/sweep_ablation*.json, PROFILING.md §3.5)
    assert cfg.infer_batch_size == 96
    assert Config(train=TrainConfig(batch_size=128)).infer_batch_size == 128
    cfg.train.eval_batch_size = 64
    cfg.train.infer_batch_size = 512
    assert cfg.eval_batch_size == 64 and cfg.infer_batch_size == 512


def test_model_dir_layout():
    cfg = Config.load("configs/charades/SeqPAN.yaml")
    assert cfg.model_dir() == os.path.join("./ckpt", "charades_")
    cfg.suffix = "re1"
    assert cfg.model_dir() == os.path.join("./ckpt", "charades_re1")


def test_unknown_keys_ignored(tmp_path):
    p = str(tmp_path / "extra.yaml")
    with open(p, "w") as f:
        f.write("task: anet\nmodel: {name: SeqPAN, future_knob: 3}\n")
    cfg = Config.load(p)
    assert cfg.task == "anet" and cfg.model.name == "SeqPAN"


def test_dtype_and_backend_validation():
    """Typos must fail loudly at construction, not silently mean float32
    (the model compares the literal string 'bfloat16')."""
    import pytest

    from hual_tpu.config import ModelConfig

    assert ModelConfig(compute_dtype="bf16").compute_dtype == "bfloat16"
    assert ModelConfig(feature_dtype="f32").feature_dtype == "float32"
    assert TrainConfig(mc_dtype="bf16").mc_dtype == "bfloat16"
    with pytest.raises(ValueError, match="compute_dtype"):
        ModelConfig(compute_dtype="bf32")
    with pytest.raises(ValueError, match="mc_dtype"):
        TrainConfig(mc_dtype="half")
    with pytest.raises(ValueError, match="sweep_backend"):
        TrainConfig(sweep_backend="fussed")
    with pytest.raises(ValueError, match="span_decode"):
        ModelConfig(span_decode="pallass")
    with pytest.raises(ValueError, match="matmul_precision"):
        ModelConfig(matmul_precision="hi")
