from hual_tpu.ops.masking import mask_logits, sequence_mask, attention_bias
from hual_tpu.ops.decode import span_decode
from hual_tpu.ops.optim import make_optimizer

__all__ = ["mask_logits", "sequence_mask", "attention_bias", "span_decode",
           "make_optimizer"]
