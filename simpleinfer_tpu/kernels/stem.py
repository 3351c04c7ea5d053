"""Pallas space-to-depth stem conv (6x6 stride-2, 3->32, pad 2).

Motivation (docs/PERF.md, 2026-08-19 profile): the yolov5 stem is the
largest single op of the headline program at 269.5 us — XLA's packed
block-Toeplitz form does 22.6 GFLOP where only 7.08 are useful (3.2x
zero MACs), netting 26 TF/s of useful work. This kernel does ONLY the
useful MACs: each block of output rows is im2col'd in VMEM into a
[RH*320, 128] patch matrix (K = 6kh*3j*2wl*3c = 108, zero-padded to
128 lanes) and hit with one MXU dot against the [128, 32] patch
weights, with bias + activation fused before the bf16 writeback.

Data movement exploits the stem's W-packed staging (ops/conv.py
stem_pack_factor f=8, free host reshape): the packed [H, 80, 24] row
reshapes (contiguously) to [H, 320, 6] = (output-w positions m) x
(w-parity, channel), so the 6 kernel taps along W become just the
m-1/m/m+1 neighbours at both parities — three lane-concats — and the
6 taps along H are strided row slices. The input arrives H-PADDED
([N, 644, 80, 24], two zero rows top/bottom, free at host staging), so
the kernel has no H edge cases.

The output is emitted directly in the packed jo=4 layout
([N, 320, 80, 128]) the downstream packed region consumes.

Hard ceiling: out_channels = 32 fills 32/128 MXU columns and K fills
108/128 rows -> 21% MXU = 41 TF/s = 172 us ideal. Measured verdict in
docs/PERF.md (scripts/pallas_stem_experiment.py).

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


def pack_stem_weights(w_oihw: np.ndarray) -> np.ndarray:
    """OIHW [32, 3, 6, 6] -> patch-matrix weights [128, 32] f32.

    Row order K = kh*18 + j*6 + wl*3 + c, matching the kernel's patch
    build: tap (kh, kw) with kw = 2*j + wl reads input w = 2*(m+j-1)+wl
    — the (m-1, m, m+1) neighbour concat at both W parities."""
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


def pad_stem_input(xp: jax.Array) -> jax.Array:
    """H-pad the W-packed stem input [N, 640, 80, 24] -> [N, 644, 80, 24]
    (pad=2 rows of zeros top/bottom). At the engine boundary this is done
    on the HOST as part of staging (numpy pad, off the device timeline)."""
    return jnp.pad(xp, ((0, 0), (2, 2), (0, 0), (0, 0)))


def _stem_kernel(x_ref, w_ref, b_ref, o_ref, *, rh: int, activation):
    blk = pl.program_id(1)
    nrows = 2 * rh + 4
    xb = x_ref[0, pl.ds(blk * 2 * rh, nrows)]        # [36, 80, 24] bf16
    xb2 = xb.reshape(nrows, 320, 6)                  # m x (wl, c) — contiguous
    zero = jnp.zeros((nrows, 1, 6), xb2.dtype)
    left = jnp.concatenate([zero, xb2[:, :-1]], axis=1)    # m-1 (masked edge)
    right = jnp.concatenate([xb2[:, 1:], zero], axis=1)    # m+1
    y = jnp.concatenate([left, xb2, right], axis=-1)       # [36, 320, 18]
    # P[ohl, m, kh*18:kh*18+18] = y[2*ohl + kh, m]
    pieces = []
    for kh in range(6):
        rows = y[kh:kh + 2 * rh].reshape(rh, 2, 320, 18)[:, 0]
        pieces.append(rows)                                 # [rh, 320, 18]
    pieces.append(jnp.zeros((rh, 320, _K_PAD - 108), y.dtype))
    patch = jnp.concatenate(pieces, axis=-1)                # [rh, 320, 128]
    acc = jnp.dot(patch.reshape(rh * 320, _K_PAD), w_ref[:],
                  preferred_element_type=jnp.float32)       # [rh*320, 32]
    out = acc + b_ref[0][None, :]
    if activation is not None:
        out = resolve_activation(activation)(out)
    oc = out.shape[-1]
    o_ref[0] = out.astype(o_ref.dtype).reshape(rh, 80, 4 * oc)


@functools.partial(jax.jit, static_argnames=("activation",))
def stem_s2d(xp_padded, w_packed, bias, activation=None):
    """Fused stem conv on the W-packed, H-padded input.

    xp_padded: [N, 644, 80, 24] (bf16) — pad_stem_input of the staged
        packed input (pack factor f=8 over a 640x640x3 image).
    w_packed:  [128, 32] — pack_stem_weights of the OIHW stem weight.
    bias:      [32] f32.
    Returns the packed jo=4 stem output [N, 320, 80, 128] bf16."""
    n = xp_padded.shape[0]
    oc = w_packed.shape[1]
    if xp_padded.shape[1:] != (644, 80, 24):
        raise ValueError(f"expected [N,644,80,24], got {xp_padded.shape}")
    xp_padded = xp_padded.astype(jnp.bfloat16)
    w_packed = w_packed.astype(jnp.bfloat16)
    bias = bias.astype(jnp.float32).reshape(1, oc)
    grid = (n, 320 // _RH)
    kernel = functools.partial(_stem_kernel, rh=_RH, activation=activation)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 320, 80, 4 * oc), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 644, 80, 24), lambda i, b: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K_PAD, oc), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _RH, 80, 4 * oc),
                               lambda i, b: (i, b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xp_padded, w_packed, bias)


def stem_s2d_reference(x_nhwc, w_oihw, bias, activation=None):
    """lax oracle: plain 6x6 s2 p2 conv + bias + act, emitted in the
    same packed jo=4 layout ([N, 320, 80, 128])."""
    from jax import lax

    w_hwio = jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)), x_nhwc.dtype)
    y = lax.conv_general_dilated(
        x_nhwc, w_hwio, window_strides=(2, 2), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + jnp.asarray(bias, jnp.float32)
    if activation is not None:
        y = resolve_activation(activation)(y)
    n, oh, ow, oc = y.shape
    return y.astype(jnp.bfloat16).reshape(n, oh, ow // 4, 4 * oc)
