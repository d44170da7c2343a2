"""hual_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-moment-retrieval framework.

Re-implements the full capability surface of renjie-liang/HUAL (CVPR 2023,
"Are Binary Annotations Sufficient? Video Moment Retrieval via Hierarchical
Uncertainty-based Active Learning") as an idiomatic TPU framework:

  * :mod:`hual_tpu.models`   — the SeqPAN span-prediction model (flax.linen,
    fixed shapes, explicit weight sharing; reference ``models/``).
  * :mod:`hual_tpu.data`     — host input pipeline producing fixed-shape
    batches (reference ``utils/data_gen.py``, ``utils/data_loader.py``).
  * :mod:`hual_tpu.runtime`  — jitted, mesh-sharded train / eval / MC-dropout
    inference (reference ``main.py``, ``utils/runner_utils.py``).
  * :mod:`hual_tpu.active`   — the HUAL active-learning engine (reference
    ``update_label.py``, ``utils/utils_hual.py``).
  * :mod:`hual_tpu.parallel` — device-mesh / sharding utilities (no reference
    counterpart: the reference is single-GPU).
  * :mod:`hual_tpu.orchestrate` — in-process round loop (reference
    ``run_charades.py`` / ``run_anet.py`` without os.system).
"""

__version__ = "0.1.0"
