#!/usr/bin/env python
"""Reference-compatible entry point (reference update_label.py):

    python update_label.py <task> <round>
"""
import sys

from hual_tpu.active.engine import update_labels

if __name__ == "__main__":
    task, round_idx = sys.argv[1], int(sys.argv[2])
    update_labels(task, round_idx)
