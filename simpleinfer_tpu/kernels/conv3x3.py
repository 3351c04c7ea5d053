"""Implicit-GEMM 3x3 stride-1 "same" conv kernel (Pallas, MXU).

Motivation (docs/PERF.md probe table): XLA's conv emitters run the
yolov5 mid-net 3x3 convs at ~47-70% MXU (8x20x20x512: 81 us vs a 38 us
compute floor). This kernel expresses the conv as 9 shifted matmuls
over a flat [H*W, C] image held in VMEM:

    acc[i, :] += (x[i + s_t] * mask_t[i]) @ W_t        t = 0..8

where s_t = (dy-1)*W + (dx-1) is the flat shift of tap t and mask_t
zeroes the rows whose shifted coordinate falls off the image (both the
H border and the W wrap introduced by flattening). The masks are tiny
host-precomputed constants [9, H*W, 1]; the shifts are static
`jnp.roll`s (two-slice concats in VMEM); every tap's MAC volume lands
on the MXU as an [H*W, C] x [C, OC] matmul with f32 accumulation, and
the bias + activation epilogue runs on the VPU before the single bf16
writeback. Grid = batch (one image per step); weights/masks/bias are
grid-invariant blocks that stay resident in VMEM.

The reference's analogous specialization is its Winograd F(2,3) path
for exactly this shape class (/root/reference/src/layer/conv_2d.cpp:
183-186) — on TPU the multiply-saving transform loses (measured,
docs/PERF.md), so the specialization is a layout/residency one instead.

Use `conv3x3_reference` (pure lax) as the parity oracle — the
GemmPack4F32 vs GemmPack4F32Ref discipline (SURVEY.md §4.1).
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul import resolve_activation


# VMEM budget for one grid step: x block + w + acc (bytes, bf16/f32).
# v5e has ~16 MB older guide / 128 MB newer chips; stay conservative.
_VMEM_BUDGET = 12 * 1024 * 1024


def _tap_shifts_masks(h: int, w: int):
    """Static flat shifts and validity masks for the 9 taps."""
    ys, xs = np.divmod(np.arange(h * w), w)
    shifts, masks = [], []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shifts.append(dy * w + dx)
            yy, xx = ys + dy, xs + dx
            valid = (0 <= yy) & (yy < h) & (0 <= xx) & (xx < w)
            masks.append(valid.astype(np.float32))
    return shifts, np.stack(masks)[:, :, None]  # [9, H*W, 1]


def _kernel(x_ref, w_ref, m_ref, b_ref, o_ref, *, shifts, act, has_bias,
            out_dtype):
    xv = x_ref[0]  # [HW, C]
    acc = None
    for t, s in enumerate(shifts):
        shifted = jnp.roll(xv, -s, axis=0) if s else xv
        masked = shifted * m_ref[t].astype(xv.dtype)
        y = jnp.dot(masked, w_ref[t], preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    if has_bias:
        acc = acc + b_ref[:]
    o_ref[0] = resolve_activation(act, kernel=True)(acc).astype(out_dtype)


def conv3x3_vmem_ok(h: int, w: int, c: int, oc: int,
                    dtype_bytes: int = 2) -> bool:
    """Whole-image blocks must fit the per-step VMEM budget. Real
    measurement (40x40x256: 'scoped allocation 20.52M > 16M limit'):
    the [9, H*W, 1] mask blocks pad their lane dim to 128, so they cost
    9*HW*128*4 bytes — the dominant term at larger spatial sizes."""
    hw = h * w
    need = (hw * c * dtype_bytes          # x block
            + 9 * c * oc * dtype_bytes    # weights (resident)
            + hw * oc * 4                 # f32 accumulator
            + hw * oc * dtype_bytes       # output block
            + 9 * hw * 128 * 4)           # masks, lane-padded to 128
    return need <= _VMEM_BUDGET


def conv3x3_s1_same(x, w_hwio, bias=None, activation: Optional[str] = None,
                    interpret: bool = False):
    """NHWC 3x3 stride-1 pad-1 conv with fused bias+activation.

    x: [N, H, W, C] (bf16 on TPU); w_hwio: [3, 3, C, OC]; bias: [OC].
    """
    n, h, w, c = x.shape
    kh, kw, wc, oc = w_hwio.shape
    if (kh, kw) != (3, 3) or wc != c:
        raise ValueError(f"conv3x3 kernel needs [3,3,{c},OC] weights, "
                         f"got {w_hwio.shape}")
    if not interpret and not conv3x3_vmem_ok(h, w, c, oc,
                                             np.dtype(x.dtype).itemsize):
        raise ValueError(
            f"conv3x3 whole-image blocks for {h}x{w}x{c}->{oc} exceed "
            f"the ~16MB scoped-VMEM budget; use the XLA conv path")
    shifts, masks_np = _tap_shifts_masks(h, w)
    hw = h * w
    xf = x.reshape(n, hw, c)
    w9 = jnp.asarray(w_hwio, x.dtype).reshape(9, c, oc)
    masks = jnp.asarray(masks_np)
    has_bias = bias is not None
    b = (jnp.asarray(bias, jnp.float32).reshape(1, oc) if has_bias
         else jnp.zeros((1, oc), jnp.float32))

    kernel = functools.partial(
        _kernel, shifts=tuple(shifts), act=activation,
        has_bias=has_bias, out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, oc), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, hw, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, oc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, oc), x.dtype),
        interpret=interpret,
    )(xf, w9, masks, b)
    return out.reshape(n, h, w, oc)


def conv3x3_reference(x, w_hwio, bias=None, activation=None):
    """lax reference for parity tests (and the XLA baseline to beat)."""
    from jax import lax

    out = lax.conv_general_dilated(
        x, jnp.asarray(w_hwio, x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + jnp.asarray(bias, jnp.float32)
    out = resolve_activation(activation)(out)
    return out.astype(x.dtype)
