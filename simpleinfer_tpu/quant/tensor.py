"""Weight-only INT8 quantization container.

The TPU-native replacement for the reference's FP32-only weight storage
(reference keeps raw fp32 blobs per layer, /root/reference/src/layer/
conv_2d.cpp:120-180): weights may instead be held as an int8 array plus a
per-output-channel fp32 scale, halving (vs bf16) or quartering (vs f32)
HBM weight traffic. Dequantization happens either lazily in XLA (fused
into the consuming conv/matmul by the compiler) or explicitly inside the
Pallas matmul epilogue (kernels/matmul.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantizedTensor:
    """int8 data + per-channel fp32 scales along `axis`.

    dequant: ``data.astype(f32) * expand(scale, axis)`` reproduces the
    original tensor to within one quantization step (|err| <= scale/2).
    """

    data: jax.Array  # int8, same shape as the original
    scale: jax.Array  # f32, shape = (original.shape[axis],)
    axis: int  # static: which axis the scales index

    def tree_flatten(self):
        return (self.data, self.scale), (self.axis,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scale = children
        return cls(data=data, scale=scale, axis=aux[0])

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        bshape = [1] * self.data.ndim
        bshape[self.axis] = self.data.shape[self.axis]
        return (self.data.astype(jnp.float32)
                * self.scale.reshape(bshape)).astype(dtype)


def quantize_per_channel(w, axis: int) -> QuantizedTensor:
    """Symmetric int8 per-channel quantization (abs-max / 127)."""
    w = np.asarray(w, dtype=np.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    absmax = np.max(np.abs(w), axis=reduce_axes)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    bshape = [1] * w.ndim
    bshape[axis] = w.shape[axis]
    q = np.clip(np.round(w / scale.reshape(bshape)), -127, 127).astype(np.int8)
    return QuantizedTensor(data=jnp.asarray(q), scale=jnp.asarray(scale), axis=axis)


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantizedActivation:
    """An int8 activation flowing between chained static-int8 convs
    (ir/passes.mark_int8_chains): the producer requantized its f32
    epilogue result to the consumer's calibrated scale and wrote 1-byte
    data — half the inter-op HBM traffic of bf16, and the consumer
    skips its quantize pass. Never crosses the jit boundary."""

    data: jax.Array  # int8
    scale: jax.Array  # f32 scalar (the consumer's act_scale)

    def tree_flatten(self):
        return (self.data, self.scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(data=children[0], scale=children[1])

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    def dequantize(self, dtype=jnp.bfloat16):
        return (self.data.astype(jnp.float32) * self.scale).astype(dtype)


def quantize_act(x, scale):
    """Symmetric int8 quantization of an activation tensor at trace
    time. `scale` is a traced f32 scalar (per-tensor) or a vector
    broadcasting over the channel (last) axis (per-channel,
    EngineConfig.act_per_channel — the matching factor is folded into
    the weight); values beyond ±127·scale saturate. Elementwise — XLA
    fuses it into the producer's epilogue / the consumer's prologue."""
    q = jnp.round(x.astype(jnp.float32) * (1.0 / scale))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def resolve_weight(w, dtype=jnp.float32):
    """Return a dense array for `w`, dequantizing if it is quantized."""
    if isinstance(w, QuantizedTensor):
        return w.dequantize(dtype)
    return jnp.asarray(w, dtype) if w.dtype != dtype else w
