from hual_tpu.models.seqpan import SeqPAN
from hual_tpu.models.registry import get_model_class, register_model

__all__ = ["SeqPAN", "get_model_class", "register_model"]
