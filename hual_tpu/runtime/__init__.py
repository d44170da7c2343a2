from hual_tpu.runtime.trainer import Trainer, TrainState

__all__ = ["Trainer", "TrainState"]
