from hual_tpu.ops.pallas.span_decode import span_decode_pallas

__all__ = ["span_decode_pallas"]
