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
class Quantized4Tensor:
    """Group-wise symmetric INT4 weight (W4 gG), nibble-packed: the LLM
    decode serving dtype — decode is weight-streaming-bound, so halving
    weight bytes vs int8 is worth the ~|absmax/7| per-group step error
    (the standard W4 accuracy tradeoff; per-channel int4 over long K
    would be far worse, hence group scales).

    Layout (shared with kernels/matmul.matmul_int4w — split-halves per
    group, so the kernel unpacks with NO interleave: two half-K dots
    per group, packed bytes read ONCE):
      packed [K/2, N] int8 — for group g of `group` K-rows, packed rows
        [g*group/2, (g+1)*group/2) hold hi-nibble = logical rows
        [g*group, g*group+group/2), lo-nibble = the second half.
      scale [K/group, N] f32 — per (K-group, out-channel).
    `k` is the LOGICAL (pre-padding) K; axis is the out-channel axis
    (always the last here — 2-D [in, out] weights only).
    """

    packed: jax.Array   # int8 [Kp/2, N]
    scale: jax.Array    # f32 [Kp/group, N]
    group: int          # static
    k: int              # static: logical K (rows beyond are pad)

    def tree_flatten(self):
        return (self.packed, self.scale), (self.group, self.k)

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, scale = children
        return cls(packed=packed, scale=scale, group=aux[0], k=aux[1])

    @property
    def shape(self):
        return (self.k, self.packed.shape[1])

    @property
    def ndim(self):
        return 2

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        p = jnp.asarray(self.packed).astype(jnp.int32)  # i8 shifts are
        kp2, n = p.shape                # not Mosaic-lowerable; i32 is
        g = self.group
        kg = (2 * kp2) // g
        hi = (p >> 4).reshape(kg, g // 2, n)
        lo = ((p << 28) >> 28).reshape(kg, g // 2, n)
        wq = jnp.concatenate([hi, lo], axis=1)          # [kg, g, N]
        s = self.scale.reshape(kg, 1, n)
        return (wq.astype(jnp.float32) * s).reshape(kg * g, n)[
            :self.k].astype(dtype)


def quantize_int4_grouped(w, group: int = 256) -> Quantized4Tensor:
    """Symmetric group-wise int4 (abs-max / 7) of a 2-D [K, N] weight,
    nibble-packed in the split-halves layout above. K is zero-padded to
    a multiple of `group` (pad rows quantize to 0 and are sliced off at
    dequant; the matmul pads x with matching zero columns)."""
    w = np.asarray(w, dtype=np.float32)
    if w.ndim != 2:
        raise ValueError(f"int4 weights must be 2-D, got {w.shape}")
    k, n = w.shape
    kp = -(-k // group) * group
    if kp != k:
        w = np.concatenate([w, np.zeros((kp - k, n), np.float32)])
    kg = kp // group
    wg = w.reshape(kg, group, n)
    absmax = np.abs(wg).max(axis=1)                     # [kg, N]
    scale = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(wg / scale[:, None, :]), -8, 7).astype(np.int8)
    hi, lo = q[:, :group // 2], q[:, group // 2:]
    packed = ((hi.astype(np.uint8) << 4)
              | (lo.astype(np.uint8) & 0xF)).astype(np.int8)
    return Quantized4Tensor(
        packed=jnp.asarray(packed.reshape(kp // 2, n)),
        scale=jnp.asarray(scale), group=group, k=k)


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
    if isinstance(w, (QuantizedTensor, Quantized4Tensor)):
        return w.dequantize(dtype)
    return jnp.asarray(w, dtype) if w.dtype != dtype else w


def proj_nlo(x, w, dt):
    """Decode-path projection: [N, L, I] x weight[I, O] -> [N, L, O]
    f32 accumulation (caller adds bias / casts). THE int4w chokepoint:
    Quantized4Tensor weights on a TPU backend stream their packed
    nibbles through the Pallas w4 matmul (half the weight HBM per
    decode step — the entire point of W4 serving); everything else
    resolves dense and uses the einsum XLA already fuses well."""
    if isinstance(w, Quantized4Tensor):
        from ..kernels.matmul import matmul_int4w, pallas_supported

        if pallas_supported():
            n, l, i = x.shape
            y = matmul_int4w(x.reshape(n * l, i), w,
                             out_dtype=jnp.float32)
            return y.reshape(n, l, -1)
    return jnp.einsum("nli,io->nlo", x, resolve_weight(w, dt),
                      preferred_element_type=jnp.float32)
