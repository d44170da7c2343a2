#!/usr/bin/env python
"""Reference-compatible round driver (reference run_anet.py)."""
from hual_tpu.orchestrate import run_rounds

if __name__ == "__main__":
    run_rounds("anet", rounds=4)
