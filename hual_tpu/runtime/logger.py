"""Console + file logging (reference utils/runner_utils.py:118-137)."""

from __future__ import annotations

import logging
import os
import time


def get_logger(log_dir: str, tag: str) -> logging.Logger:
    """One logger (and one open log file) per (log_dir, tag) per process.

    The logger NAME must not embed the timestamp: a multi-round loop calls
    this every round, and a fresh name each time would defeat the
    ``logger.handlers`` dedup — accumulating unclosed FileHandlers and
    registry entries for the life of the process.  The timestamp stays in
    the FILENAME (reference utils/runner_utils.py:118-137 layout), stamped
    once at the first call."""
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(f"hual_tpu.{tag}.{os.path.abspath(log_dir)}")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if not logger.handlers:
        stamp = time.strftime("%Y%m%d_%H%M%S", time.localtime())
        log_file = os.path.join(log_dir, f"{stamp}_{tag}.log")
        fmt = logging.Formatter("%(levelname)s:%(message)s")
        ch = logging.StreamHandler()
        ch.setFormatter(fmt)
        logger.addHandler(ch)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        fh.setLevel(logging.INFO)
        logger.addHandler(fh)
    return logger
