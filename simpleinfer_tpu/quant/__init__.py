"""INT8 quantization subsystem (weight-only + static activation)."""
from .calibrate import build_observer_fn, scales_from_stats
from .tensor import (
    QuantizedTensor, quantize_act, quantize_per_channel, resolve_weight,
)

__all__ = [
    "QuantizedTensor",
    "build_observer_fn",
    "quantize_act",
    "quantize_per_channel",
    "resolve_weight",
    "scales_from_stats",
]
