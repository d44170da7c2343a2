"""CLI surface end-to-end (reference main.py modes) on synthetic data."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_synthetic_data import make_dataset  # noqa: E402

from hual_tpu.cli import main as cli_main  # noqa: E402
from hual_tpu.config import Config, LossConfig, ModelConfig, PathsConfig, TrainConfig


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli"))
    make_dataset(root, task="charades", n_train=24, n_test=8, vdim=32,
                 max_raw_len=24, seed=11)
    cfg = Config(
        task="charades", suffix="re0",
        paths=PathsConfig(
            ckpt_dir=os.path.join(root, "ckpt"),
            cache_dir=os.path.join(root, "data_pkl"),
            feature_path=os.path.join(root, "data/features/charades_i3d"),
            glove_path=os.path.join(root, "data/glove/glove.840B.300d.txt"),
            train_path=os.path.join(root, "data/charades_re0/train.json"),
            test_path=os.path.join(root, "data/charades_re0/test.json"),
        ),
        train=TrainConfig(epochs=1, batch_size=8, lr=1e-3),
        model=ModelConfig(max_vlen=16, vdim=32, dim=32, num_heads=4,
                          char_dim=8, attn_layer=1),
        loss=LossConfig(),
    )
    cfg_path = os.path.join(root, "SeqPAN.yaml")
    cfg.save(cfg_path)
    return root, cfg_path


def test_cli_train_test_infer(cli_env, monkeypatch):
    root, cfg_path = cli_env
    monkeypatch.chdir(root)
    # --mode train writes a best checkpoint
    assert cli_main(["--config", cfg_path, "--mode", "train",
                     "--suffix", "re0"]) == 0
    assert os.path.isdir(os.path.join(root, "ckpt", "charades_re0", "best"))
    # --mode test restores it
    assert cli_main(["--config", cfg_path, "--mode", "test",
                     "--suffix", "re0"]) == 0
    # --mode infer_trainset writes the round pickle
    assert cli_main(["--config", cfg_path, "--mode", "infer_trainset",
                     "--suffix", "re0"]) == 0
    assert os.path.exists(os.path.join(root, "results", "charades", "re0.pkl"))


def test_cli_debug_flag_limits_epochs(cli_env, monkeypatch):
    root, cfg_path = cli_env
    monkeypatch.chdir(root)
    assert cli_main(["--config", cfg_path, "--mode", "train",
                     "--suffix", "re0", "--debug"]) == 0


def test_cli_checkpoint_flag_resumes_training(cli_env, monkeypatch):
    """--checkpoint on --mode train restores a full save_state checkpoint
    and continues at the saved epoch (the reference DECLARED this flag but
    never wired it, main.py:17)."""
    import jax

    from hual_tpu.cli import build_trainer

    root, cfg_path = cli_env
    monkeypatch.chdir(root)
    cfg = Config.load(cfg_path)
    cfg.suffix = "resume"
    cfg.train.epochs = 2
    t = build_trainer(cfg)
    t.init_state()
    t.train()
    state_path = os.path.join(root, "ckpt", "resume_state_cli")
    t.save_state(state_path)  # epoch==2: a complete run's state
    params_saved = jax.device_get(t.state.params)

    cfg2_path = os.path.join(root, "SeqPAN_resume.yaml")
    cfg.save(cfg2_path)
    # resumed CLI train: state.epoch == epochs, so zero further epochs run
    # and the params stay exactly the restored ones
    assert cli_main(["--config", cfg2_path, "--mode", "train",
                     "--suffix", "resume", "--checkpoint", state_path]) == 0
    t2 = build_trainer(cfg)
    t2.init_state()
    t2.load_state(state_path)
    assert t2.state.epoch == 2
    for a, b in zip(jax.tree.leaves(params_saved),
                    jax.tree.leaves(jax.device_get(t2.state.params))):
        import numpy as np
        np.testing.assert_array_equal(a, b)
