"""Fused C3-block kernel: the whole YOLOv5 C3 stays resident in VMEM.

Motivation (docs/PERF.md round-4 config-4 attribution): 47% of
yolov5l-640-b16 int8 wall time sits in the first ~30 convs at 9-21%
MXU utilization — BANDWIDTH-bound, not compute-bound. The XLA chain
writes and re-reads every intermediate activation of the C3 block
(cv1 -> n x [1x1, 3x3, add] -> cat(cv2) -> cv3: ~11 tensors of
52-105 MB each at b16/160^2) through HBM; this kernel computes the
ENTIRE block per image in one grid step, so HBM sees exactly one read
of the block input and one write of the block output (~6x traffic cut
at the yolov5l C3_1 shape).

Design notes:
- One grid step per batch image (grid=(N,)); the whole [H, W, C]
  input, all weights, and every intermediate live in VMEM. v5e has
  128 MB of VMEM — far above the conservative ~16 MB default scoped
  limit — so the pallas_call raises `vmem_limit_bytes` explicitly
  (c3_vmem_bytes computes the requirement; eligibility is checked at
  dispatch, ops/conv.py-style).
- 1x1 convs are single [H*W, C] x [C, OC] MXU matmuls (the reshape
  merges leading dims — layout-free).
- The 3x3s are 9 shifted matmuls (conv3x3.py's decomposition, but with
  the H shifts as zero-row-padded slices and the W shifts as sublane
  rolls masked by a W-iota — no host-precomputed [9, HW, 1] masks,
  whose lane padding dominated conv3x3_vmem_ok at large maps).
- The channel concat before cv3 never materializes: cv3's weight is
  split into its y1/y2 halves and the two matmuls accumulate into one
  f32 tile (the same trick as ir/passes.fuse_cat_conv1x1).
- bf16 data, f32 accumulation, bias + SiLU epilogues on the VPU —
  bit-comparable to the XLA chain at bf16 tolerances.

The reference's analogous move is its Winograd helper composing
transform+GEMM+transform to keep the hot loop fed
(/root/reference/src/layer/simd/winograd_helper.cpp:145-880); on TPU
the winning composition is residency, not multiply-saving (Winograd
measured negative — docs/PERF.md known-negatives).

`c3_block_reference` is the lax parity oracle (GemmPack4F32 vs Ref
discipline, SURVEY.md §4.1).
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul import resolve_activation

# v5e VMEM is 128 MB; leave headroom for Mosaic's own buffers and the
# double-buffered in/out blocks the pipeline adds.
_VMEM_CAP = 100 * 1024 * 1024


def c3_vmem_bytes(h: int, w: int, c: int, hid: int, oc: int) -> int:
    """Rough per-grid-step VMEM requirement (bytes, bf16 data): the
    double-buffered x/out blocks plus the largest concurrent set of
    intermediates (y1, tap accumulator in f32, cv3 accumulator)."""
    hw = h * w
    return (2 * hw * c * 2          # x block, double-buffered
            + 2 * hw * oc * 2       # out block, double-buffered
            + 2 * hw * hid * 2      # y1 + one 1x1 output (bf16)
            + 2 * hw * hid * 4      # 3x3 f32 accumulator + shifted tap
            + hw * oc * 4           # cv3 f32 accumulator
            + 9 * hid * hid * 2 * 4  # weights (generous)
            + (1 << 20))            # slack


def c3_profitable(h: int, w: int, hid: int, n_btl: int) -> bool:
    """Work-size dispatch gate (measured, scripts/c3_fusion_ab.py
    2026-08-20): the kernel wins 1.73-1.94x at yolov5l C3_1
    (hw*hid*T = 4.9M) and 1.42x at yolov5l C3_2 (4.9M), but LOSES
    (0.90x) at the yolov5s C3_2 class (0.8M) — small blocks can't
    amortize the per-invocation overhead and XLA's chain is already
    sub-0.3 ms there. Threshold between the measured win/loss points;
    SI_C3_MIN_WORK overrides for per-chip retune (read at trace time)."""
    min_work = int(os.environ.get("SI_C3_MIN_WORK", "2000000"))
    return h * w * hid * n_btl >= min_work


def c3_taps_s8_profitable(hid: int) -> bool:
    """s8 taps beat bf16 taps only at narrow hid (measured: 1.94x vs
    1.73x at hid=64, but 1.06x vs 1.42x at hid=128 — full-K bf16
    matmuls leave no MXU headroom for the dynamic-quant overhead)."""
    return hid < 128


def c3_supported(h: int, w: int, c: int, hid: int, oc: int) -> bool:
    """Dispatch eligibility: VMEM fit + MXU-sane channel widths.
    hid >= 64 keeps every matmul at >= 1/4 MXU occupancy; narrower
    blocks (yolov5n/s first C3, hid 16/32) would run the 9-tap dots at
    <= 1/16 occupancy — the stem-kernel lesson (docs/PERF.md round-2:
    no MXU-shaped formulation wins at narrow channels)."""
    return (hid >= 64 and hid % 8 == 0 and c % 8 == 0 and oc % 8 == 0
            and c3_vmem_bytes(h, w, c, hid, oc) <= _VMEM_CAP)


def _act(x_f32, act: str | None, dtype):
    if act is not None:
        x_f32 = resolve_activation(act, kernel=True)(x_f32)
    return x_f32.astype(dtype)


def _conv3x3_taps(a3, w9_t, acc_dtype=jnp.float32):
    """[B, W, C] x [9, C, OC] -> [B*W, OC] accum: 9 shifted MXU matmuls.
    H taps are zero-row-padded slices (rows outside the image are zero
    — 'same' padding); W taps are sublane rolls masked by a W-iota.
    With int8 operands + int32 accum this is the native s8 MXU path
    (2x bf16 peak — the same dot form as kernels/matmul.matmul_s8s8);
    the zero fill is exact there (symmetric quant, zero-point 0)."""
    b, w, c = a3.shape
    zero = jnp.zeros((1, w, c), a3.dtype)
    xpad = jnp.concatenate([zero, a3, zero], axis=0)      # [B+2, W, C]
    wi = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
    # hoist the W shifts: 2 masked sublane rolls shared by all 3 H taps
    # (the stem kernel's v2 lesson — per-tap rolls were 6 full-image
    # materializations; out[w] reads in[w+dx], zero off the image)
    shifted = {0: xpad}
    for dx in (-1, 1):
        shifted[dx] = jnp.where(
            (wi + dx >= 0) & (wi + dx < w),
            jnp.roll(xpad, -dx, axis=1), jnp.zeros((), a3.dtype))
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            xr = shifted[dx][1 + dy:1 + dy + b]           # [B, W, C]
            y = jax.lax.dot_general(
                xr.reshape(b * w, c), w9_t[3 * (dy + 1) + dx + 1],
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
            acc = y if acc is None else acc + y
    return acc


def quantize_taps(btl_b_w: np.ndarray):
    """Host-side per-output-channel symmetric s8 quantization of the
    bottleneck 3x3 tap weights [T, 9, hid, hid] -> (int8, scales
    [T, hid]); load-time prep for the kernel's int8-static path."""
    amax = np.maximum(np.abs(btl_b_w).max(axis=(1, 2)), 1e-8)  # [T,hid]
    scale = (amax / 127.0).astype(np.float32)
    q = np.clip(np.round(btl_b_w / scale[:, None, None, :]),
                -127, 127).astype(np.int8)
    return q, scale


def _quant_dyn(a_f32):
    """Dynamic per-tensor symmetric int8: (q, scale). Round-half-even
    (jnp.round) so the lax oracle reproduces the kernel bit-exactly."""
    amax = jnp.max(jnp.abs(a_f32))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(a_f32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _c3_kernel(*refs, act, n_btl, shortcut, taps_s8, rh, halo):
    """One H-BAND of one image per grid step (grid = (N, H/rh)): the
    whole [H, W, C] input block stays VMEM-resident across the image's
    band steps (its index map is constant in the band dim, so Pallas
    fetches it once per image), while compute walks rh-row bands with
    `halo` extra rows each side (one per sequential 3x3). Band-edge
    rows inside the halo margin compute garbage (the zero-row padding
    in _conv3x3_taps pretends the band edge is the image edge) and are
    discarded; the clamped band start makes the margin real image rows
    except exactly at the true image edges, where zero-padding is the
    correct 'same'-conv semantics. Banding exists because the
    whole-image variant measured SLOWER e2e (docs/PERF.md round-5):
    ~35 sequential ops over 25k-row tensors pipeline poorly."""
    if taps_s8:
        (x_ref, cv1w, cv1b, cv2w, cv2b, cv3w1, cv3w2, cv3b,
         aw, ab, bw, bb, bw_scale_ref, o_ref, *scr) = refs
    else:
        (x_ref, cv1w, cv1b, cv2w, cv2b, cv3w1, cv3w2, cv3b,
         aw, ab, bw, bb, o_ref, *scr) = refs
        bw_scale_ref = None
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    hid = cv1w.shape[1]
    if rh == h:
        b_rows = h                       # single band: whole image
        bstart = 0
        off = 0
    else:
        b_rows = rh + 2 * halo
        i = pl.program_id(1)
        bstart = jnp.clip(i * rh - halo, 0, h - b_rows)
        off = i * rh - bstart            # in {0..2*halo}
    xb = x_ref[0, pl.ds(bstart, b_rows)]                 # [B, W, C]
    xf = xb.reshape(b_rows * w, c)
    dt = xf.dtype
    y1 = _act(jnp.dot(xf, cv1w[:], preferred_element_type=jnp.float32)
              + cv1b[:], act, dt)                        # [B*W, hid]
    for t in range(n_btl):
        af = (jnp.dot(y1, aw[t], preferred_element_type=jnp.float32)
              + ab[t])
        if act is not None:
            af = resolve_activation(act, kernel=True)(af)
        if bw_scale_ref is not None:
            # int8-static path: dynamic per-BAND s8 activation quant
            # feeding native s8xs8 MXU taps (2x bf16 peak) + per-
            # channel weight dequant in the f32 epilogue
            aq, ascale = _quant_dyn(af)
            zi = _conv3x3_taps(aq.reshape(b_rows, w, hid), bw[t],
                               acc_dtype=jnp.int32)
            z = (zi.astype(jnp.float32)
                 * (ascale * bw_scale_ref[t]))
        else:
            a = af.astype(dt)
            z = _conv3x3_taps(a.reshape(b_rows, w, hid), bw[t])
        z = _act(z + bb[t], act, dt)
        y1 = y1 + z if shortcut else z                   # residual
    # cv2/cv3 only need the band's CENTRAL rh rows. Mosaic cannot lower
    # dynamic_slice on VALUES, so the y1 band round-trips through a
    # VMEM scratch ref (pl.ds on refs is supported); xc reads the image
    # ref directly at the band's global start i*rh.
    if rh == h:
        y1c = y1
        xc = xf
    else:
        y1_scr = scr[0]
        y1_scr[:] = y1.reshape(b_rows, w, hid)
        y1c = y1_scr[pl.ds(off, rh)].reshape(rh * w, hid)
        xc = x_ref[0, pl.ds(pl.program_id(1) * rh, rh)].reshape(
            rh * w, c)
    y2 = _act(jnp.dot(xc, cv2w[:], preferred_element_type=jnp.float32)
              + cv2b[:], act, dt)
    out = (jnp.dot(y1c, cv3w1[:], preferred_element_type=jnp.float32)
           + jnp.dot(y2, cv3w2[:], preferred_element_type=jnp.float32)
           + cv3b[:])
    o_ref[0] = _act(out, act, o_ref.dtype).reshape(rh, w, -1)


@functools.partial(jax.jit, static_argnames=("activation", "shortcut",
                                             "band_rows", "interpret"))
def c3_block(x, cv1_w, cv1_b, cv2_w, cv2_b, cv3_w1, cv3_w2, cv3_b,
             btl_a_w, btl_a_b, btl_b_w, btl_b_b, btl_b_scale=None,
             activation: str | None = "silu", shortcut: bool = True,
             band_rows: int = 32, interpret: bool = False):
    """Fused C3 block over NHWC input.

    x:        [N, H, W, C] (bf16 on TPU)
    cv1_w:    [C, hid]   cv1_b: [hid]     (block-input 1x1 + act)
    cv2_w:    [C, hid]   cv2_b: [hid]     (parallel 1x1 + act)
    cv3_w1:   [hid, OC]  cv3_w2: [hid, OC]  cv3_b: [OC]
              (cv3's [2*hid, OC] weight split into its cat halves:
               rows [:hid] multiply the bottleneck branch, [hid:] cv2)
    btl_a_w:  [T, hid, hid]   btl_a_b: [T, hid]    (bottleneck 1x1s)
    btl_b_w:  [T, 9, hid, hid] btl_b_b: [T, hid]   (3x3 taps, HWIO
              flattened h-major: tap = kh*3 + kw)
    shortcut=True adds the residual after every bottleneck (the
    backbone form); False is the PAN-head form (zoo/builders.py c3()).

    btl_b_scale [T, hid] (f32) switches the 3x3 taps to the INT8-STATIC
    path: btl_b_w must then be int8 (per-output-channel quantized, the
    given scales), and each bottleneck's activation is dynamically
    per-image symmetric-s8 quantized in-kernel before native s8xs8 MXU
    taps (2x bf16 peak; the XLA s8 conv emitter runs the unfused chain
    at 95-171 TFLOP/s — docs/PERF.md round-5 per-op attribution — so
    the fused kernel must match it in-kernel to keep its traffic win).
    Returns [N, H, W, OC] in x.dtype.
    """
    n, h, w, c = x.shape
    hid = cv1_w.shape[1]
    oc = cv3_w1.shape[1]
    n_btl = btl_a_w.shape[0]
    dt = x.dtype

    taps_s8 = btl_b_scale is not None
    if taps_s8 and np.dtype(btl_b_w.dtype) != np.int8:
        raise ValueError("btl_b_scale given but btl_b_w is not int8")

    # band-size selection: largest divisor of H at most `band_rows`
    # that still leaves room for the halo (one row per sequential 3x3);
    # no such divisor -> single whole-image band
    halo = n_btl
    rh = h
    for cand in range(min(band_rows, h), 0, -1):
        if h % cand == 0 and (cand == h or h >= cand + 2 * halo):
            rh = cand
            break

    def pw(a):
        return jnp.asarray(a, dt)

    def pb(a, width):
        return jnp.asarray(a, jnp.float32).reshape(1, width)

    args = [x, pw(cv1_w), pb(cv1_b, hid), pw(cv2_w), pb(cv2_b, hid),
            pw(cv3_w1), pw(cv3_w2), pb(cv3_b, oc),
            pw(btl_a_w), jnp.asarray(btl_a_b, jnp.float32)
            .reshape(n_btl, 1, hid),
            btl_b_w if taps_s8 else pw(btl_b_w),
            jnp.asarray(btl_b_b, jnp.float32).reshape(n_btl, 1, hid)]

    kernel = functools.partial(_c3_kernel, act=activation, n_btl=n_btl,
                               shortcut=shortcut, taps_s8=taps_s8,
                               rh=rh, halo=halo)
    flops = 2 * h * w * (2 * c * hid + n_btl * (hid * hid * 10)
                         + 2 * hid * oc)

    def rep2(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        # whole image per batch index; constant in the band dim, so
        # Pallas DMAs it once per image and bands revisit it in VMEM
        pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        rep2((c, hid)), rep2((1, hid)),
        rep2((c, hid)), rep2((1, hid)),
        rep2((hid, oc)), rep2((hid, oc)), rep2((1, oc)),
        rep2((n_btl, hid, hid)), rep2((n_btl, 1, hid)),
        rep2((n_btl, 9, hid, hid)), rep2((n_btl, 1, hid)),
    ]
    if taps_s8:
        args.append(jnp.asarray(btl_b_scale, jnp.float32)
                    .reshape(n_btl, 1, hid))
        in_specs.append(rep2((n_btl, 1, hid)))
    scratch = ([] if rh == h else
               [pltpu.VMEM((rh + 2 * halo, w, hid), dt)])
    return pl.pallas_call(
        kernel,
        grid=(n, h // rh),
        in_specs=in_specs,
        scratch_shapes=scratch,
        out_specs=pl.BlockSpec((1, rh, w, oc),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, oc), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_CAP),
        cost_estimate=pl.CostEstimate(
            flops=n * flops,
            bytes_accessed=n * h * w * (c + oc) * 2,
            transcendentals=n * h * w * (2 * hid + n_btl * 2 * hid + oc)),
        interpret=interpret,
    )(*args)


def c3_block_reference(x, cv1_w, cv1_b, cv2_w, cv2_b, cv3_w1, cv3_w2,
                       cv3_b, btl_a_w, btl_a_b, btl_b_w, btl_b_b,
                       btl_b_scale=None, activation: str | None = "silu",
                       shortcut: bool = True):
    """lax oracle: the same C3 as the unfused op chain (zoo/builders.py
    c3() lowered through ops/conv.py) — conv + bias + act per step.
    With btl_b_scale, mirrors the kernel's int8-static tap math
    (per-image dynamic s8 activations x per-channel s8 weights,
    int32-exact conv, f32 dequant) so parity can be asserted tightly."""
    act = resolve_activation(activation) if activation else (lambda v: v)

    def conv1x1(t, wm, bias, pre_act=None):
        y = jnp.einsum("nhwc,co->nhwo", t, jnp.asarray(wm, t.dtype),
                       preferred_element_type=jnp.float32)
        y = y + jnp.asarray(bias, jnp.float32)
        if pre_act is not None:
            return pre_act(y)
        return act(y).astype(t.dtype)

    def conv3x3(t, w9, bias):
        hwio = jnp.asarray(w9, t.dtype).reshape(3, 3, *w9.shape[1:])
        y = jax.lax.conv_general_dilated(
            t, hwio, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return act(y + jnp.asarray(bias, jnp.float32)).astype(t.dtype)

    def conv3x3_s8(t_f32, wq9, wscale, bias):
        # per-IMAGE dynamic activation quant (the kernel's grid step)
        amax = jnp.max(jnp.abs(t_f32), axis=(1, 2, 3), keepdims=True)
        ascale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(t_f32 / ascale), -127, 127).astype(
            jnp.int8)
        hwio = jnp.asarray(wq9).reshape(3, 3, *wq9.shape[1:])
        zi = jax.lax.conv_general_dilated(
            q, hwio, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = (zi.astype(jnp.float32)
             * (ascale * jnp.asarray(wscale, jnp.float32)))
        return act(y + jnp.asarray(bias, jnp.float32)).astype(x.dtype)

    y1 = conv1x1(x, cv1_w, cv1_b)
    for t in range(btl_a_w.shape[0]):
        if btl_b_scale is not None:
            af = conv1x1(y1, btl_a_w[t], btl_a_b[t],
                         pre_act=lambda v: act(v))
            z = conv3x3_s8(af, btl_b_w[t], btl_b_scale[t], btl_b_b[t])
        else:
            a = conv1x1(y1, btl_a_w[t], btl_a_b[t])
            z = conv3x3(a, btl_b_w[t], btl_b_b[t])
        y1 = z + y1 if shortcut else z
    y2 = conv1x1(x, cv2_w, cv2_b)
    cat = jnp.concatenate([y1, y2], axis=-1)
    w3 = jnp.concatenate([jnp.asarray(cv3_w1), jnp.asarray(cv3_w2)],
                         axis=0)
    return conv1x1(cat, w3, cv3_b)
