"""Pallas space-to-depth stem conv (6x6 stride-2, 3->32, pad 2).

Motivation (docs/PERF.md, 2026-08-19 profile): the yolov5 stem is the
largest single op of the headline program at 269.5 us — XLA's packed
block-Toeplitz form does 22.6 GFLOP where only 7.08 are useful (3.2x
zero MACs), netting 26 TF/s of useful work. This kernel does ONLY the
useful MACs: each block of output rows is im2col'd in VMEM into
K-major patch matrices (K = 6kh*3j*2wl*3c = 108, zero-padded to 128)
and contracted on the MXU against the [128, 32] patch weights, with
bias + activation fused before the bf16 writeback.

Mosaic constraint that shaped the layout (first attempt failed with
"unsupported shape cast"): the minor (lane) dimension of a VMEM vector
cannot be split/merged, so the patch matrix must keep the 320 output-w
positions in LANES end to end. The input is therefore staged
TRANSPOSED, [N, 645, 6, 320] = rows x (w-parity, channel) x m, where
m is the output w position: the 6 W taps of an output become lane
rolls (m-1/m/m+1 at both parities) and the 6 H taps are strided
sublane slices — all layout-preserving ops. The dot is the
lhs-transposed form (k,m)x(k,n) -> (m,n), which the MXU supports
natively. The staging transpose itself is HOST work (see
pack_stem_input; the uint8 native path can absorb it).

Output is the logical [N, 320, 320, 32] NHWC stem output — row-major
byte-identical to the packed jo=4 layout [N, 320, 80, 128] the
downstream packed region consumes (a free bitcast outside the kernel).

Hard ceiling: out_channels = 32 fills 32/128 MXU columns and K fills
108/128 rows -> 21% MXU = 41 TF/s = 172 us ideal at b8. Measured
verdict in docs/PERF.md (scripts/pallas_stem_experiment.py).

Reference analog: the conv stem specialization plays the role of the
reference's Winograd fast path for its hottest conv shape
(/root/reference/src/layer/conv_2d.cpp:183-186); `stem_s2d_reference`
is the lax parity oracle (GemmPack4F32 vs Ref discipline, SURVEY §4.1).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul import resolve_activation

# output rows produced per grid step (320 % RH == 0)
_RH = 16
_K_PAD = 128  # 108 useful patch taps, zero-padded to the MXU lane width
_HP = 645     # 640 + 2 top pad + 3 bottom (2 conv pad + 1 slice slack)


def pack_stem_weights(w_oihw: np.ndarray) -> np.ndarray:
    """OIHW [32, 3, 6, 6] -> patch-matrix weights [128, 32] f32.

    Row order K = kh*18 + j*6 + wl*3 + c, matching the kernel's patch
    build: tap (kh, kw) with kw = 2*j + wl reads input w = 2*(m+j-1)+wl
    — the (m-1, m, m+1) lane neighbours at both W parities."""
    oc, ic, kh_, kw_ = w_oihw.shape
    if (ic, kh_, kw_) != (3, 6, 6):
        raise ValueError(f"stem kernel expects [oc,3,6,6], got {w_oihw.shape}")
    wp = np.zeros((_K_PAD, oc), np.float32)
    for kh in range(6):
        for j in range(3):
            for wl in range(2):
                kw = 2 * j + wl
                for c in range(3):
                    wp[kh * 18 + j * 6 + wl * 3 + c] = w_oihw[:, c, kh, kw]
    return wp


def pack_stem_input(x_nhwc: np.ndarray) -> np.ndarray:
    """[N, 640, 640, 3] image -> the kernel's staged layout
    [N, 645, 6, 320] = H-padded rows x (w-parity*3 + channel) x m.

    HOST-side (numpy): one strided transpose + pad, off the device
    timeline; at the engine boundary this is the stem input transform."""
    n, h, w, c = x_nhwc.shape
    if (h, w, c) != (640, 640, 3):
        raise ValueError(f"expected [N,640,640,3], got {x_nhwc.shape}")
    xk = np.ascontiguousarray(
        x_nhwc.reshape(n, h, w // 2, 2, c).transpose(0, 1, 3, 4, 2)
    ).reshape(n, h, 2 * c, w // 2)
    out = np.zeros((n, _HP, 2 * c, w // 2), x_nhwc.dtype)
    out[:, 2:2 + h] = xk
    return out


def _stem_kernel(x_ref, w_ref, b_ref, o_ref, *, rh: int, activation):
    blk = pl.program_id(1)
    xb = x_ref[0, pl.ds(blk * 2 * rh, 2 * rh + 5)]   # [37, 6, 320]
    m = xb.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    # W taps once at the row level (before the per-kh slicing, so the 2
    # rolls + 3 concats are shared by all 6 kh pieces):
    # y[h, j*6 + (wl,c), m] = xb[h, (wl,c), m + j - 1]
    left = jnp.where(lane >= 1, jnp.roll(xb, 1, axis=-1), 0)
    right = jnp.where(lane < m - 1, jnp.roll(xb, -1, axis=-1), 0)
    y = jnp.concatenate([left.astype(xb.dtype), xb,
                         right.astype(xb.dtype)], axis=1)  # [37, 18, 320]
    pieces = []
    for kh in range(6):
        # rows 2*ohl + kh for ohl in [0, rh): strided sublane slice
        pieces.append(y[kh:kh + 2 * rh].reshape(rh, 2, 18, m)[:, 0])
    pieces.append(jnp.zeros((rh, _K_PAD - 108, m), xb.dtype))
    pt = jnp.concatenate(pieces, axis=1)              # [rh, 128, 320]
    w = w_ref[:]                                      # [128, 32]
    outs = []
    for b in range(rh):                               # (k,m) x (k,n)
        outs.append(jax.lax.dot_general(
            pt[b], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))      # [320, 32]
    out = jnp.stack(outs, axis=0) + b_ref[0][None, None, :]
    if activation is not None:
        out = resolve_activation(activation)(out)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("activation", "interpret"))
def stem_s2d(x_packed, w_packed, bias, activation=None,
             interpret: bool = False):
    """Fused stem conv on the transposed staged input.

    x_packed: [N, 645, 6, 320] (bf16) — pack_stem_input of the image.
    w_packed: [128, 32] — pack_stem_weights of the OIHW stem weight.
    bias:     [32] f32.
    Returns the logical stem output [N, 320, 320, 32] bf16 (row-major
    byte-identical to the packed jo=4 [N, 320, 80, 128] layout)."""
    n = x_packed.shape[0]
    oc = w_packed.shape[1]
    if x_packed.shape[1:] != (_HP, 6, 320):
        raise ValueError(f"expected [N,{_HP},6,320], got {x_packed.shape}")
    x_packed = x_packed.astype(jnp.bfloat16)
    w_packed = w_packed.astype(jnp.bfloat16)
    bias = bias.astype(jnp.float32).reshape(1, oc)
    grid = (n, 320 // _RH)
    kernel = functools.partial(_stem_kernel, rh=_RH, activation=activation)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 320, 320, oc), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _HP, 6, 320), lambda i, b: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K_PAD, oc), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _RH, 320, oc),
                               lambda i, b: (i, b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_packed, w_packed, bias)


def stem_s2d_reference(x_nhwc, w_oihw, bias, activation=None):
    """lax oracle: plain 6x6 s2 p2 conv + bias + act, [N, 320, 320, 32]."""
    from jax import lax

    w_hwio = jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)), x_nhwc.dtype)
    y = lax.conv_general_dilated(
        x_nhwc, w_hwio, window_strides=(2, 2), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + jnp.asarray(bias, jnp.float32)
    if activation is not None:
        y = resolve_activation(activation)(y)
    return y.astype(jnp.bfloat16)
