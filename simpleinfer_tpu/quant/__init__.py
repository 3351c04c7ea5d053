"""Weight-only INT8 quantization subsystem."""
from .tensor import QuantizedTensor, quantize_per_channel, resolve_weight

__all__ = ["QuantizedTensor", "quantize_per_channel", "resolve_weight"]
