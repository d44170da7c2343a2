#!/usr/bin/env python
"""Port a trained reference (renjie-liang/HUAL) TF1 checkpoint to hual_tpu.

The reference saves TF1 Saver checkpoints of its SeqPAN graph
(reference main.py:57,71-75: ``ckpt/<task>_/best_SeqPAN.ckpt-<step>``).
This tool maps every model variable onto the hual_tpu flax param tree
(name map: hual_tpu/utils/tf1_port.py, exhaustiveness + numeric parity
pinned by tests/test_golden_model.py and tests/test_tf1_port.py) and writes
an Orbax checkpoint that ``Trainer.restore`` loads directly, plus the
checkpoint's frozen GloVe matrix as ``<out>_word_vectors.npy``.

    python tools/port_tf1_checkpoint.py ckpt/charades_ /tmp/ported_best
    python main.py --config configs/charades/SeqPAN.yaml --mode test \\
        --checkpoint /tmp/ported_best
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("ckpt", help="TF1 Saver prefix, or a directory with a "
                                 "'checkpoint' pointer file (latest wins)")
    ap.add_argument("out", help="output Orbax checkpoint directory")
    args = ap.parse_args()

    from hual_tpu.utils.tf1_port import port_checkpoint

    params, wv = port_checkpoint(args.ckpt, args.out)

    import jax

    leaves = jax.tree_util.tree_leaves(params)
    n_params = sum(int(np.prod(np.shape(x))) for x in leaves)
    print(f"ported {len(leaves)} tensors / {n_params:,} parameters "
          f"-> {os.path.abspath(args.out)}")
    if wv is not None:
        print(f"word vectors {np.shape(wv)} -> "
              f"{os.path.abspath(args.out)}_word_vectors.npy")
    else:
        print("no word_embs/word_table in the checkpoint (word vectors "
              "must come from the data pipeline)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
