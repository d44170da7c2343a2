"""Command-line entry point mirroring the reference surface (main.py:14-47).

    python -m hual_tpu.cli --config configs/charades/SeqPAN.yaml \
        --mode {train,test,infer_trainset} [--suffix reI] [--seed 12345]

The reference's --gpu_idx flag is accepted and ignored (device selection is
JAX's job on TPU); --debug limits epochs to 1 for smoke runs.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from hual_tpu.config import Config
from hual_tpu.data.datasets import gen_or_load_dataset
from hual_tpu.data.features import FeatureStore
from hual_tpu.runtime.logger import get_logger
from hual_tpu.runtime.trainer import Trainer


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True, help="config file path")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="checkpoint path to restore")
    parser.add_argument("--mode", type=str, default="train",
                        choices=["train", "test", "infer_trainset"])
    parser.add_argument("--debug", action="store_true", help="1-epoch smoke run")
    parser.add_argument("--suffix", type=str, default="")
    parser.add_argument("--seed", default=12345, type=int)
    parser.add_argument("--gpu_idx", type=str, default="0",
                        help="accepted for reference-CLI compatibility; unused")
    parser.add_argument("--ckpt_dir", type=str, default="")
    return parser.parse_args(argv)


def build_trainer(config: Config, features: "FeatureStore" = None,
                  device_features=None, base_dataset: dict = None) -> Trainer:
    """`features`/`device_features` let a round orchestrator reuse the
    (round-invariant) feature table — host-side and device-resident — instead
    of re-reading GBs from disk and re-uploading them every round;
    `base_dataset` (a previous round's dataset dict) enables the re-span fast
    path (only spans change between AL rounds — skip re-tokenizing)."""
    dataset = gen_or_load_dataset(config, base=base_dataset)
    config.model.num_chars = dataset["n_chars"]
    config.model.num_words = dataset["n_words"]
    if features is None:
        features = FeatureStore.from_dir(config.paths.feature_path,
                                         config.model.max_vlen)
    logger = get_logger(f"./logs/{config.task}", config.suffix or "run")
    logger.info(json.dumps(config.to_dict(), indent=4))
    return Trainer(config, dataset, features, logger=logger,
                   device_features=device_features)


def main(argv=None) -> int:
    args = parse_args(argv)
    np.random.seed(args.seed)
    config = Config.load(args.config)
    config.suffix = args.suffix or config.suffix
    config.train.seed = args.seed
    if args.ckpt_dir:
        config.paths.ckpt_dir = args.ckpt_dir
    if args.debug:
        config.train.epochs = 1

    trainer = build_trainer(config)
    mode = args.mode.lower()
    if mode == "train":
        trainer.init_state(args.seed)
        if args.checkpoint:
            # the reference DECLARED this resume flag but never wired it
            # (main.py:17); here it restores a full save_state checkpoint
            # (params+optimizer+step+epoch) and training continues at the
            # saved epoch on the identical trajectory
            trainer.load_state(args.checkpoint)
        trainer.train()
    elif mode == "test":
        trainer.restore(args.checkpoint)
        m = trainer.test()
        trainer.logger.info(
            "TEST:\t{r1i3:.2f}\t{r1i5:.2f}\t{r1i7:.2f}\t{miou:.2f}\t".format(**m))
    elif mode == "infer_trainset":
        trainer.restore(args.checkpoint)
        trainer.infer_trainset(seed=args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
