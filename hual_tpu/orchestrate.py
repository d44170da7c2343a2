"""In-process HUAL round orchestrator.

Replaces the reference's os.system subprocess chains
(run_charades.py:9-41 / run_anet.py:9-41): for each round I —
update labels -> train -> infer the train set — as plain function calls,
resumable at round granularity, with per-round config derivation
(reference utils/utils_hual.py:181-192) and no cache-delete hack (the cache
key includes the suffix, so each round caches separately).

    python -m hual_tpu.orchestrate charades            # rounds 1..3
    python -m hual_tpu.orchestrate anet --rounds 4
"""

from __future__ import annotations

import argparse
import os

from hual_tpu.active.engine import update_labels
from hual_tpu.config import Config
from hual_tpu.runtime.logger import get_logger

DEFAULT_ROUNDS = {"charades": 3, "anet": 4}
DEFAULT_CONFIGS = {
    "charades": "./configs/charades/SeqPAN.yaml",
    "anet": "./configs/anet/SeqPAN.yaml",
}


def run_rounds(task: str, rounds: int | None = None,
               base_config_path: str | None = None,
               start_round: int = 1, data_root: str = "./data",
               results_root: str = "./results",
               max_retries: int = 1,
               warm_start: dict | None = None,
               point_strategy: str = "uncertainty",
               selection: str = "half",
               strategy_seed: int = 12345) -> list[dict]:
    """The full HUAL loop; returns per-round stats + metrics.

    ``point_strategy`` / ``selection`` expose the paper's ablation axes
    (uncertainty|random|dichotomy x half|all) end-to-end; the defaults are
    the reference method (reference update_label.py:185,197).
    ``strategy_seed`` seeds the 'random' strategy only.

    Failure handling (reference run_*.py only checked os.system exit codes
    and aborted): each round retries up to `max_retries` times before the
    loop stops; completed rounds persist on disk, so a crashed loop resumes
    with ``start_round=<next>``.  With ``train.save_state_every > 0`` the
    trainer also saves its full state every K epochs and a retry (or a
    fresh process) resumes the round at the last saved epoch instead of
    retraining it — a resumed run replays the uninterrupted trajectory
    exactly (per-epoch shuffle and per-step RNG are functions of the
    restored epoch/step counters).

    ``warm_start``: optionally seed the cross-round reuse state from a
    round-0 trainer, e.g. ``{"features": t.features, "device_features":
    t.export_device_features(), "dataset": t.dataset}`` — round 1 then
    skips the feature reload/upload and the corpus re-tokenization.
    (export_device_features, not the bare ``_device_features``: int8
    tables travel as a (table, scales) pair.)
    """
    rounds = rounds or DEFAULT_ROUNDS.get(task, 3)
    base_config_path = base_config_path or DEFAULT_CONFIGS[task]
    base = Config.load(base_config_path)
    logger = get_logger(f"./logs/{task}", "rounds")
    summary_path = os.path.join(results_root, task, "rounds_summary.json")
    history = []
    if start_round > 1 and os.path.exists(summary_path):
        # resume: keep the completed rounds' records — the summary file is
        # rewritten wholesale below, and starting from [] would destroy them
        import json
        with open(summary_path) as f:
            history = [h for h in json.load(f)
                       if h.get("round", 0) < start_round]
    # the video feature table is round-invariant: load + device-upload once,
    # reuse across every round's trainer (same for the tokenized corpus)
    shared: dict = dict(warm_start) if warm_start else {}

    for round_idx in range(start_round, rounds + 1):
        for attempt in range(max_retries + 1):
            try:
                _run_one_round(task, round_idx, base, base_config_path,
                               data_root, results_root, logger, history,
                               shared, point_strategy=point_strategy,
                               selection=selection, strategy_seed=strategy_seed)
                break
            except Exception:
                logger.exception(f"round re{round_idx} attempt {attempt} failed")
                if attempt == max_retries:
                    raise
        os.makedirs(os.path.dirname(summary_path), exist_ok=True)
        with open(summary_path, "w") as f:
            import json
            json.dump(history, f, indent=2)
    return history


def _run_one_round(task, round_idx, base, base_config_path, data_root,
                   results_root, logger, history, shared=None,
                   point_strategy: str = "uncertainty",
                   selection: str = "half",
                   strategy_seed: int = 12345) -> None:
    from hual_tpu.cli import build_trainer

    shared = {} if shared is None else shared

    logger.info(f"=== round re{round_idx}: update labels "
                f"({point_strategy}/{selection}) ===")
    stats = update_labels(task, round_idx, data_root=data_root,
                          results_root=results_root,
                          point_strategy=point_strategy, selection=selection,
                          seed=strategy_seed)
    logger.info(f"pseudo-label mIoU {stats['old_miou']:.4f} -> "
                f"{stats['new_miou']:.4f}")
    # selection-overlap diagnostic: which fraction of this round's annotated
    # half was also annotated last round (sticky selection re-asks the same
    # videos; churny selection spreads the budget). history keeps only the
    # fraction — the raw 10k+-element index list would bloat every summary.
    selected = stats.pop("selected_idx", None)
    if selected is not None:
        selected = set(selected)
        prev = shared.get("prev_selected_idx")
        if prev is not None and selected:
            stats["selection_overlap_prev"] = round(
                len(selected & prev) / len(selected), 4)
        # committed to `shared` only at the END of the round: if training
        # crashes and the round retries, the retry must still compare its
        # selection against round I-1's, not against its own first attempt

    cfg = base.derive_round(round_idx, data_root=data_root)
    # persist the derived config next to the base one (reference
    # generate_configs writes SeqPAN_re<I>.yaml)
    stem, ext = os.path.splitext(base_config_path)
    cfg.save(f"{stem}_re{round_idx}{ext}")

    logger.info(f"=== round re{round_idx}: train ===")
    # the shared reuse state is only valid for the same feature set and
    # padding bound; key it on (feature_path, max_vlen) and drop stale
    # entries — INCLUDING the tokenized dataset, whose v_len/s_ind/e_ind
    # columns derive from the same key
    feat_key = (cfg.paths.feature_path, cfg.model.max_vlen)
    if shared.get("feat_key") not in (None, feat_key):
        shared.pop("features", None)
        shared.pop("device_features", None)
        shared.pop("dataset", None)
    trainer = build_trainer(cfg, features=shared.get("features"),
                            device_features=shared.get("device_features"),
                            base_dataset=shared.get("dataset"))
    shared["features"] = getattr(trainer, "features", None)
    shared["device_features"] = getattr(
        trainer, "export_device_features", lambda: None)()
    shared["dataset"] = getattr(trainer, "dataset", None)
    shared["feat_key"] = feat_key
    trainer.init_state()
    # epoch-granular resume (train.save_state_every): a preempted/crashed
    # attempt left a periodic full-state save under this round's model_dir;
    # continue from it instead of retraining the round from scratch.  The
    # path is per-suffix (config.model_dir), so it can only ever hold THIS
    # round's state; it is deleted below once the round completes.
    state_path = os.path.join(os.path.abspath(cfg.model_dir()), "state")
    if os.path.exists(state_path):
        trainer.load_state(state_path)
        logger.info(f"resuming re{round_idx} from {state_path} "
                    f"(epoch {trainer.state.epoch})")
    best = trainer.train()
    if os.path.exists(state_path):
        import shutil
        shutil.rmtree(state_path)

    logger.info(f"=== round re{round_idx}: infer train set ===")
    trainer.restore()
    infer_metrics = trainer.infer_trainset(
        save_path=os.path.join(results_root, task, f"re{round_idx}.pkl"))
    getattr(trainer, "close", lambda: None)()

    history.append({"round": round_idx, "label_stats": stats,
                    "best": {k: v for k, v in best.items()
                             if not k.endswith("_line")},
                    "infer": infer_metrics})
    if selected is not None:
        shared["prev_selected_idx"] = selected


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("task", choices=["charades", "anet"])
    parser.add_argument("--rounds", type=int, default=None)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--start-round", type=int, default=1)
    parser.add_argument("--point-strategy", type=str, default="uncertainty",
                        choices=["uncertainty", "random", "dichotomy"],
                        help="ablation axis: which frame to ask the expert about")
    parser.add_argument("--selection", type=str, default="half",
                        choices=["half", "all"],
                        help="ablation axis: annotate the uncertain half "
                             "(reference) or every sample")
    parser.add_argument("--strategy-seed", type=int, default=12345,
                        help="seed for the 'random' point strategy")
    args = parser.parse_args(argv)
    run_rounds(args.task, rounds=args.rounds, base_config_path=args.config,
               start_round=args.start_round,
               point_strategy=args.point_strategy, selection=args.selection,
               strategy_seed=args.strategy_seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
