"""Console + file logging (reference utils/runner_utils.py:118-137)."""

from __future__ import annotations

import logging
import os
import time


def get_logger(log_dir: str, tag: str) -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S", time.localtime())
    log_file = os.path.join(log_dir, f"{stamp}_{tag}.log")

    logger = logging.getLogger(f"hual_tpu.{tag}.{stamp}")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if not logger.handlers:
        fmt = logging.Formatter("%(levelname)s:%(message)s")
        ch = logging.StreamHandler()
        ch.setFormatter(fmt)
        logger.addHandler(ch)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        fh.setLevel(logging.INFO)
        logger.addHandler(fh)
    return logger
