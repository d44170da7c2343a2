#!/usr/bin/env python
"""Reference-compatible entry point (reference main.py):

    python main.py --config configs/charades/SeqPAN.yaml --mode train
"""
from hual_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
