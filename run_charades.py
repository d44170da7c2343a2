#!/usr/bin/env python
"""Reference-compatible round driver (reference run_charades.py) — runs the
HUAL loop in process instead of via os.system subprocess chains."""
from hual_tpu.orchestrate import run_rounds

if __name__ == "__main__":
    run_rounds("charades", rounds=3)
