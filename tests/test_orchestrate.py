"""Round-loop orchestration plumbing (reference run_charades.py), hermetic:
the heavy trainer is stubbed; label updates, config derivation, round
artifacts, and the summary file are real."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_synthetic_data import make_dataset  # noqa: E402

from hual_tpu.utils.io import load_json, save_pickle


class StubTrainer:
    def __init__(self, config):
        self.config = config

    def init_state(self):
        pass

    def train(self):
        return {"r1i7": 10.0, "epoch": 0, "train_line": "t", "test_line": "t",
                "test_metrics": {"r1i3": 30.0, "r1i5": 20.0, "r1i7": 10.0,
                                 "miou": 25.0}}

    def restore(self):
        pass

    def infer_trainset(self, save_path=None):
        _write_fake_predictions(self.config, save_path)
        return {"r1i3": 30.0, "r1i5": 20.0, "r1i7": 10.0, "miou": 25.0}


def _write_fake_predictions(config, save_path, T=16):
    rng = np.random.default_rng(0)
    train = load_json(config.paths.train_path)
    preds = []
    for vid, dur, (s, e), sent in (r[:4] for r in train):
        vlen = T
        preds.append({
            "vid": vid, "duration": dur, "psuedo_idx": [1, 5],
            "sentence": sent.strip(), "v_len": vlen, "prop_idx": [2, 6],
            "prop_logits": [rng.normal(size=T).astype(np.float32),
                            rng.normal(size=T).astype(np.float32)],
            "prop_logits1": [rng.normal(size=T).astype(np.float32),
                             rng.normal(size=T).astype(np.float32)],
            "prop_logits2": [rng.normal(size=T).astype(np.float32),
                             rng.normal(size=T).astype(np.float32)],
            "m_score": rng.uniform(size=(T, 4)).astype(np.float32),
        })
    save_pickle(preds, save_path)


def test_run_rounds_plumbing(tmp_path, monkeypatch):
    root = str(tmp_path)
    make_dataset(root, task="charades", n_train=20, n_test=8, vdim=8,
                 max_raw_len=16, seed=3)
    monkeypatch.chdir(root)

    # base config with reference-relative paths
    cfg_dir = os.path.join(root, "configs", "charades")
    os.makedirs(cfg_dir)
    base_path = os.path.join(cfg_dir, "SeqPAN.yaml")
    from hual_tpu.config import Config, PathsConfig, TrainConfig
    cfg = Config(task="charades",
                 paths=PathsConfig(feature_path="./data/features/charades_i3d",
                                   glove_path="./data/glove/glove.840B.300d.txt",
                                   train_path="./data/charades_gt/train.json",
                                   test_path="./data/charades_gt/test.json"),
                 train=TrainConfig(epochs=1, batch_size=4))
    cfg.save(base_path)

    # round-0 predictions (normally produced by infer_trainset on re0)
    cfg_re0 = cfg.derive_round(0)
    _write_fake_predictions(cfg_re0, "./results/charades/re0.pkl")

    import hual_tpu.cli as cli
    monkeypatch.setattr(cli, "build_trainer", lambda c, **kw: StubTrainer(c))

    from hual_tpu.orchestrate import run_rounds
    history = run_rounds("charades", rounds=2, base_config_path=base_path)

    assert len(history) == 2
    for i in (1, 2):
        assert os.path.exists(f"./data/charades_re{i}/train.json")
        assert os.path.exists(f"./data/charades_re{i}/test.json")
        assert os.path.exists(f"./results/charades/re{i}.pkl")
        assert os.path.exists(os.path.join(cfg_dir, f"SeqPAN_re{i}.yaml"))
    with open("./results/charades/rounds_summary.json") as f:
        summary = json.load(f)
    assert summary[0]["round"] == 1
    assert summary[0]["best"]["test_metrics"]["r1i7"] == 10.0

    # round 2 builds on round 1's annotations: cumulative points grow
    r1 = load_json("./data/charades_re1/train.json")
    r2 = load_json("./data/charades_re2/train.json")
    pts1 = sum(len(r[4]["pos_idx"]) + len(r[4]["neg_idx"]) for r in r1)
    pts2 = sum(len(r[4]["pos_idx"]) + len(r[4]["neg_idx"]) for r in r2)
    assert pts1 == 10  # ceil(20/2) annotations in round 1
    assert pts2 == 20


def test_cli_point_strategy_and_selection_flags(tmp_path, monkeypatch):
    """The paper's ablation axes are runnable end-to-end from the CLI
    (VERDICT r3 #5): --point-strategy dichotomy --selection all annotates
    every record with the deterministic dichotomy midpoint."""
    root = str(tmp_path)
    make_dataset(root, task="charades", n_train=12, n_test=4, vdim=8,
                 max_raw_len=16, seed=7)
    monkeypatch.chdir(root)
    cfg_dir = os.path.join(root, "configs", "charades")
    os.makedirs(cfg_dir)
    base_path = os.path.join(cfg_dir, "SeqPAN.yaml")
    from hual_tpu.config import Config, PathsConfig, TrainConfig
    cfg = Config(task="charades",
                 paths=PathsConfig(feature_path="./data/features/charades_i3d",
                                   glove_path="./data/glove/glove.840B.300d.txt",
                                   train_path="./data/charades_gt/train.json",
                                   test_path="./data/charades_gt/test.json"),
                 train=TrainConfig(epochs=1, batch_size=4))
    cfg.save(base_path)
    _write_fake_predictions(cfg.derive_round(0), "./results/charades/re0.pkl")

    import hual_tpu.cli as cli
    monkeypatch.setattr(cli, "build_trainer", lambda c, **kw: StubTrainer(c))

    from hual_tpu.orchestrate import main
    assert main(["charades", "--rounds", "1", "--config", base_path,
                 "--point-strategy", "dichotomy", "--selection", "all"]) == 0

    r1 = load_json("./data/charades_re1/train.json")
    # selection=all: every record got exactly one point this round
    assert all(len(r[4]["pos_idx"]) + len(r[4]["neg_idx"]) == 1 for r in r1)
    # dichotomy with no prior annotations bisects [0, vlen): point == 7 at T=16
    pts = [(r[4]["pos_idx"] + r[4]["neg_idx"])[0] for r in r1]
    assert pts == [7] * len(r1)


def test_run_rounds_retry_on_transient_failure(tmp_path, monkeypatch):
    """A round that fails once is retried (reference run_*.py aborted the
    whole chain on any nonzero exit)."""
    root = str(tmp_path)
    make_dataset(root, task="charades", n_train=12, n_test=4, vdim=8,
                 max_raw_len=16, seed=5)
    monkeypatch.chdir(root)
    cfg_dir = os.path.join(root, "configs", "charades")
    os.makedirs(cfg_dir)
    base_path = os.path.join(cfg_dir, "SeqPAN.yaml")
    from hual_tpu.config import Config, PathsConfig, TrainConfig
    cfg = Config(task="charades",
                 paths=PathsConfig(feature_path="./data/features/charades_i3d",
                                   glove_path="./data/glove/glove.840B.300d.txt",
                                   train_path="./data/charades_gt/train.json",
                                   test_path="./data/charades_gt/test.json"),
                 train=TrainConfig(epochs=1, batch_size=4))
    cfg.save(base_path)
    _write_fake_predictions(cfg.derive_round(0), "./results/charades/re0.pkl")

    calls = {"n": 0}

    class FlakyTrainer(StubTrainer):
        def train(self):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient device error")
            return super().train()

    import hual_tpu.cli as cli
    monkeypatch.setattr(cli, "build_trainer", lambda c, **kw: FlakyTrainer(c))
    from hual_tpu.orchestrate import run_rounds
    history = run_rounds("charades", rounds=1, base_config_path=base_path,
                         max_retries=1)
    assert len(history) == 1 and calls["n"] == 2


def test_resume_preserves_completed_rounds_in_summary(tmp_path, monkeypatch):
    """run_rounds(start_round=N) must keep rounds < N in rounds_summary.json
    (the file is rewritten wholesale each round; starting from [] destroyed
    the completed rounds' records on resume)."""
    root = str(tmp_path)
    make_dataset(root, task="charades", n_train=12, n_test=4, vdim=8,
                 max_raw_len=16, seed=5)
    monkeypatch.chdir(root)
    cfg_dir = os.path.join(root, "configs", "charades")
    os.makedirs(cfg_dir)
    base_path = os.path.join(cfg_dir, "SeqPAN.yaml")
    from hual_tpu.config import Config, PathsConfig, TrainConfig
    cfg = Config(task="charades",
                 paths=PathsConfig(feature_path="./data/features/charades_i3d",
                                   glove_path="./data/glove/glove.840B.300d.txt",
                                   train_path="./data/charades_gt/train.json",
                                   test_path="./data/charades_gt/test.json"),
                 train=TrainConfig(epochs=1, batch_size=4))
    cfg.save(base_path)
    _write_fake_predictions(cfg.derive_round(0), "./results/charades/re0.pkl")

    import hual_tpu.cli as cli
    monkeypatch.setattr(cli, "build_trainer", lambda c, **kw: StubTrainer(c))
    from hual_tpu.orchestrate import run_rounds

    run_rounds("charades", rounds=1, base_config_path=base_path)
    # "crash" after round 1; resume from round 2
    run_rounds("charades", rounds=2, base_config_path=base_path,
               start_round=2)
    with open("./results/charades/rounds_summary.json") as f:
        summary = json.load(f)
    assert [h["round"] for h in summary] == [1, 2]


def test_retry_keeps_selection_overlap_vs_previous_round(monkeypatch, tmp_path):
    """A failed-then-retried round must compute selection_overlap_prev against
    round I-1's selection, not against its own first attempt (the first
    attempt must not commit shared['prev_selected_idx'])."""
    import hual_tpu.orchestrate as orch
    from hual_tpu.config import Config

    class FakeTrainer:
        fail_next = False

        def __init__(self):
            self.features = None
            self.dataset = None

        def init_state(self):
            pass

        def train(self):
            if FakeTrainer.fail_next:
                FakeTrainer.fail_next = False
                raise RuntimeError("transient device error")
            return {"r1i7": 1.0}

        def restore(self):
            pass

        def infer_trainset(self, save_path=None):
            return {"miou": 1.0}

    selections = {1: [0, 1, 2], 2: [0, 1, 5]}

    def fake_update_labels(task, round_idx, data_root=".", results_root=".",
                           **kw):
        return {"old_miou": 0.5, "new_miou": 0.6,
                "selected_idx": list(selections[round_idx])}

    monkeypatch.setattr("hual_tpu.cli.build_trainer",
                        lambda cfg, **kw: FakeTrainer())
    monkeypatch.setattr(orch, "update_labels", fake_update_labels)

    base = Config()
    logger = __import__("logging").getLogger("t")
    shared: dict = {}
    history: list = []
    args = ("charades", base, str(tmp_path / "c.yaml"), ".", ".", logger,
            history, shared)

    orch._run_one_round(args[0], 1, *args[1:])
    # round 2: first attempt fails after update_labels, retry succeeds
    FakeTrainer.fail_next = True
    with pytest.raises(RuntimeError):
        orch._run_one_round(args[0], 2, *args[1:])
    orch._run_one_round(args[0], 2, *args[1:])
    # overlap({0,1,5}, {0,1,2}) / 3 = 2/3 — NOT 1.0 vs its own first attempt
    assert history[-1]["label_stats"]["selection_overlap_prev"] == \
        pytest.approx(2 / 3, abs=1e-4)


def test_summary_script(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(str(tmp_path))
    os.makedirs("results/charades")
    with open("results/charades/rounds_summary.json", "w") as f:
        json.dump([{"round": 1,
                    "label_stats": {"new_miou": 0.5},
                    "best": {"test_metrics": {"r1i3": 1, "r1i5": 2,
                                              "r1i7": 3, "miou": 4}}}], f)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "scripts"))
    import importlib
    import summary_performance
    importlib.reload(summary_performance)
    monkeypatch.setattr(sys, "argv", ["summary_performance.py", "charades"])
    assert summary_performance.main() == 0
    out = capsys.readouterr().out
    assert "re1" in out and "0.5000" in out


def test_shared_feature_cache_invalidated_on_feature_path_change(monkeypatch, tmp_path):
    """The orchestrator's cross-round feature-table reuse must drop the
    cached table when a round's (feature_path, max_vlen) key changes
    (ADVICE round 1: a same-shape table from a different feature set must
    never be silently reused)."""
    import hual_tpu.orchestrate as orch
    from hual_tpu.config import Config

    calls = {}

    class FakeTrainer:
        def __init__(self):
            self.features = object()
            self._device_features = object()
            self.dataset = {"d": 1}

        def init_state(self):
            pass

        def train(self):
            return {"r1i7": 1.0}

        def restore(self):
            pass

        def infer_trainset(self, save_path=None):
            return {"miou": 1.0}

    def fake_build_trainer(cfg, features=None, device_features=None,
                           base_dataset=None):
        calls.setdefault("seen", []).append((features, device_features))
        return FakeTrainer()

    def fake_update_labels(task, round_idx, data_root=".", results_root=".",
                           **kw):
        return {"old_miou": 0.5, "new_miou": 0.6}

    monkeypatch.setattr("hual_tpu.cli.build_trainer", fake_build_trainer)
    monkeypatch.setattr(orch, "update_labels", fake_update_labels)

    base = Config()
    base.paths.feature_path = "/feat/v1"
    logger = __import__("logging").getLogger("t")
    shared: dict = {}
    history: list = []

    orch._run_one_round("charades", 1, base, str(tmp_path / "c.yaml"),
                        ".", ".", logger, history, shared)
    first_feats = shared["features"]
    assert shared["feat_key"] == ("/feat/v1", base.model.max_vlen)

    # same key -> round 2 reuses the cached objects
    orch._run_one_round("charades", 2, base, str(tmp_path / "c.yaml"),
                        ".", ".", logger, history, shared)
    assert calls["seen"][1][0] is first_feats

    # changed feature path -> cache dropped before building the trainer
    base.paths.feature_path = "/feat/v2"
    orch._run_one_round("charades", 3, base, str(tmp_path / "c.yaml"),
                        ".", ".", logger, history, shared)
    assert calls["seen"][2][0] is None
    assert shared["feat_key"] == ("/feat/v2", base.model.max_vlen)


def test_run_loop_forwards_strategy_axes(tmp_path, monkeypatch):
    """tools/full_loop_demo.run_loop (the shared loop runner behind the
    full-scale, real-records, parity-kit and strategy-ablation tools) must
    forward the ablation axes into orchestrate.run_rounds and stamp them in
    the summary (tools/strategy_ablation_loop.py relies on both)."""
    root = str(tmp_path)
    make_dataset(root, task="charades", n_train=8, n_test=4, vdim=8,
                 max_raw_len=16, seed=3)

    import hual_tpu.cli as cli
    import hual_tpu.orchestrate as orch

    class LoopStubTrainer(StubTrainer):
        features = None
        dataset = None

        def export_device_features(self):
            return None

    monkeypatch.setattr(cli, "build_trainer",
                        lambda c, **kw: LoopStubTrainer(c))
    captured = {}

    def fake_run_rounds(task, rounds=None, base_config_path=None,
                        warm_start=None, point_strategy="uncertainty",
                        selection="half", strategy_seed=12345, **kw):
        captured.update(point_strategy=point_strategy, selection=selection,
                        strategy_seed=strategy_seed)
        return []

    monkeypatch.setattr(orch, "run_rounds", fake_run_rounds)

    from full_loop_demo import run_loop
    cwd0 = os.getcwd()
    try:
        summary_path = os.path.join(root, "summary.json")
        rc = run_loop(root, "charades", epochs=1, rounds=2, max_vlen=16,
                      model_kwargs={"vdim": 8, "dim": 8, "num_heads": 2,
                                    "word_dim": 8, "char_dim": 4},
                      point_strategy="dichotomy", selection="all",
                      strategy_seed=7, summary_name=summary_path)
    finally:
        os.chdir(cwd0)
    assert rc == 0
    assert captured == {"point_strategy": "dichotomy", "selection": "all",
                        "strategy_seed": 7}
    with open(summary_path) as f:
        s = json.load(f)
    assert s["point_strategy"] == "dichotomy"
    assert s["selection"] == "all"


def test_retry_resumes_from_epoch_state(tmp_path, monkeypatch):
    """Epoch-granular retry (VERDICT r4 #4): a crashed attempt that left a
    periodic state save under the round's model_dir is resumed via
    load_state (not retrained from scratch), and the state dir is cleaned
    up once the round completes."""
    root = str(tmp_path)
    make_dataset(root, task="charades", n_train=12, n_test=4, vdim=8,
                 max_raw_len=16, seed=5)
    monkeypatch.chdir(root)
    cfg_dir = os.path.join(root, "configs", "charades")
    os.makedirs(cfg_dir)
    base_path = os.path.join(cfg_dir, "SeqPAN.yaml")
    from hual_tpu.config import Config, PathsConfig, TrainConfig
    cfg = Config(task="charades",
                 paths=PathsConfig(feature_path="./data/features/charades_i3d",
                                   glove_path="./data/glove/glove.840B.300d.txt",
                                   train_path="./data/charades_gt/train.json",
                                   test_path="./data/charades_gt/test.json"),
                 train=TrainConfig(epochs=8, batch_size=4,
                                   save_state_every=1))
    cfg.save(base_path)
    _write_fake_predictions(cfg.derive_round(0), "./results/charades/re0.pkl")

    events = []

    class PreemptedTrainer(StubTrainer):
        """First attempt 'trains 3 epochs', saves state, dies; the retry
        must call load_state with that path and finish."""
        class _State:
            epoch = 3

        state = _State()

        def train(self):
            state_dir = os.path.join(
                os.path.abspath(self.config.model_dir()), "state")
            if not os.path.exists(state_dir):
                os.makedirs(state_dir)
                events.append("preempted")
                raise RuntimeError("preempted at epoch 3")
            events.append("completed")
            return super().train()

        def load_state(self, path):
            events.append(("load_state", os.path.exists(path)))

    import hual_tpu.cli as cli
    monkeypatch.setattr(cli, "build_trainer",
                        lambda c, **kw: PreemptedTrainer(c))
    from hual_tpu.orchestrate import run_rounds
    history = run_rounds("charades", rounds=1, base_config_path=base_path,
                         max_retries=1)
    assert events == ["preempted", ("load_state", True), "completed"], events
    assert len(history) == 1
    # state dir cleaned up after the successful round
    state_dir = os.path.join(
        os.path.abspath(cfg.derive_round(1).model_dir()), "state")
    assert not os.path.exists(state_dir)
