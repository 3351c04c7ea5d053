"""Tiled MXU matmul kernels with fused epilogues (Pallas).

The TPU analog of the reference's register-blocked GEMM
(`GemmPack4F32`, /root/reference/src/layer/simd/gemm.cpp:295-385: 4x12
f32 register tiles over 128-bit vectors) and its bias epilogue
(`AddBiasNHWC`, simd/binary.cpp:38-53). Here a tile is 128x128 on the
systolic array, K is streamed through VMEM via the grid pipeline, and
the epilogue — per-output-channel int8 dequant scale, bias add,
activation — runs on the VPU in the same kernel, so quantized weights
are never materialized in HBM at full precision.

Two entry points:
- matmul(x, w, ...)        — dense weights [K, N]
- matmul_int8w(x, wq, scale, ...) — int8 weights + per-column f32 scale
  (per-OUTPUT-channel symmetric quantization, quant/tensor.py); the
  product is computed in the activation dtype on the MXU with f32
  accumulation, and `acc * scale[col]` folds the dequant into the
  epilogue (valid because the scale is constant along K).

Both pad to tile multiples internally (XLA pads are fused/cheap) and
accept any M, N, K.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTIVATIONS: dict = {
    None: lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0),
    "silu": lambda x: x * jax.nn.sigmoid(x),
    "sigmoid": jax.nn.sigmoid,
    "hardsigmoid": lambda x: jnp.clip(x * (1.0 / 6.0) + 0.5, 0.0, 1.0),
    "hardswish": lambda x: x * jnp.clip(x * (1.0 / 6.0) + 0.5, 0.0, 1.0),
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "tanh": jnp.tanh,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


def _erf_as(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7): Mosaic
    has no erf/erfc lowering (probed on-chip 2026-08-18 — erf, erfc and
    expm1 all raise NotImplementedError inside pallas_call; the CPU
    interpreter hides this), so exact-GELU epilogues use this inside
    kernels. 1.5e-7 is below f32 matmul accumulation noise."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


# Mosaic-safe overrides used when the activation runs INSIDE a Pallas
# kernel body (see _erf_as; expm1(x<=0) = exp(x)-1 loses only absolute
# ~1e-7 near 0, negligible in an f32 epilogue)
_KERNEL_OVERRIDES: dict = {
    "gelu": lambda x: 0.5 * x * (1.0 + _erf_as(x * 0.7071067811865476)),
}


def resolve_activation(name, kernel: bool = False):
    """Epilogue-activation lookup; parameterized forms encode their
    argument as `name@value` (e.g. "leaky_relu@0.1", "elu@1.0") so the
    fusion pass (ir/passes.FUSABLE) can carry them in one string param.
    `kernel=True` swaps in Mosaic-lowerable variants for the primitives
    Pallas TPU cannot lower (erf/erfc/expm1)."""
    if kernel and name in _KERNEL_OVERRIDES:
        return _KERNEL_OVERRIDES[name]
    if name in _ACTIVATIONS:
        return _ACTIVATIONS[name]
    base, _, arg = (name or "").partition("@")
    if base == "leaky_relu" and arg:
        s = float(arg)
        return lambda x: jnp.where(x >= 0, x, x * jnp.asarray(s, x.dtype))
    if base == "elu" and arg:
        a = float(arg)
        if kernel:  # Mosaic has no expm1
            return lambda x: jnp.where(
                x > 0, x, jnp.asarray(a, x.dtype)
                * (jnp.exp(jnp.minimum(x, 0.0)) - 1.0))
        return lambda x: jnp.where(x > 0, x,
                                   jnp.asarray(a, x.dtype) * jnp.expm1(x))
    raise KeyError(f"unknown epilogue activation {name!r}")


def pallas_supported() -> bool:
    """True when the default backend can run Mosaic kernels."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _matmul_kernel(x_ref, w_ref, scale_ref, bias_ref, o_ref, acc_ref, *,
                   n_k: int, act: Callable, dequant: bool, has_bias: bool,
                   out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:]
    wb = w_ref[:]
    # f32 operands need multi-pass MXU emulation done BY HAND: the MXU
    # multiplies in bf16, and Mosaic ignores lax precision hints here
    # (caught by the real-chip tests at ~2e-3 relative error; the CPU
    # interpreter is exact and hides it). Split each f32 operand into
    # hi+lo bf16 parts and accumulate the significant cross terms
    # (hi*hi + hi*lo + lo*hi; lo*lo is below f32 ulp). int8 weights are
    # exact in bf16 — no split needed.
    def split(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    if xb.dtype == jnp.float32 and wb.dtype == jnp.float32:
        xh, xl = split(xb)
        wh, wl = split(wb)
        acc_ref[:] += mm(xh, wh) + mm(xh, wl) + mm(xl, wh)
    elif xb.dtype == jnp.float32:
        xh, xl = split(xb)
        wb = wb.astype(jnp.bfloat16)
        acc_ref[:] += mm(xh, wb) + mm(xl, wb)
    else:
        if wb.dtype != xb.dtype:
            wb = wb.astype(xb.dtype)  # int8 -> bf16 for the MXU
        acc_ref[:] += mm(xb, wb)

    @pl.when(k == n_k - 1)
    def _():
        acc = acc_ref[:]
        if dequant:
            acc = acc * scale_ref[:].astype(jnp.float32)  # [1, TN] broadcast
        if has_bias:
            acc = acc + bias_ref[:].astype(jnp.float32)
        o_ref[:] = act(acc).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "block_m", "block_n", "block_k",
                     "out_dtype"))
def _matmul_impl(x, w, scale, bias, *, activation, block_m, block_n,
                 block_k, out_dtype):
    m, k = x.shape
    _, n = w.shape
    mp, kp, np_ = _round_up(m, block_m), _round_up(k, block_k), _round_up(
        n, block_n)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        w = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    dequant = scale is not None
    has_bias = bias is not None
    scale2d = jnp.pad(scale, (0, np_ - n)).reshape(1, np_) if dequant \
        else jnp.zeros((1, np_), jnp.float32)
    bias2d = jnp.pad(bias, (0, np_ - n)).reshape(1, np_) if has_bias \
        else jnp.zeros((1, np_), jnp.float32)

    n_k = kp // block_k
    grid = (mp // block_m, np_ // block_n, n_k)
    kernel = functools.partial(
        _matmul_kernel, n_k=n_k,
        act=resolve_activation(activation, kernel=True),
        dequant=dequant, has_bias=has_bias, out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * x.dtype.itemsize
            + kp * np_ * w.dtype.itemsize + mp * np_ * 4,
            transcendentals=0),
    )(x, w, scale2d, bias2d)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


def _pick_blocks(m, k, n, block_m, block_n, block_k):
    """Clamp tile sizes to the (padded) problem, respecting MXU/VPU
    alignment (sublane 8, lane 128)."""
    bm = min(block_m, _round_up(m, 8))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(k, 128))
    return bm, bn, bk


def matmul(x, w, bias=None, activation: Optional[str] = None, *,
           block_m: int = 256, block_n: int = 256, block_k: int = 512,
           out_dtype=None):
    """out = act(x[M,K] @ w[K,N] + bias[N]); f32 accumulation on the MXU."""
    bm, bn, bk = _pick_blocks(x.shape[0], x.shape[1], w.shape[1],
                              block_m, block_n, block_k)
    return _matmul_impl(x, w, None, bias, activation=activation,
                        block_m=bm, block_n=bn, block_k=bk,
                        out_dtype=out_dtype or x.dtype)


def matmul_int8w(x, w_q, scale, bias=None, activation: Optional[str] = None,
                 *, block_m: int = 256, block_n: int = 256,
                 block_k: int = 512, out_dtype=None):
    """out = act((x @ w_q) * scale + bias) with w_q int8 [K, N], scale
    f32 [N] — weight-only dequant fused into the epilogue."""
    bm, bn, bk = _pick_blocks(x.shape[0], x.shape[1], w_q.shape[1],
                              block_m, block_n, block_k)
    return _matmul_impl(x, w_q, scale, bias, activation=activation,
                        block_m=bm, block_n=bn, block_k=bk,
                        out_dtype=out_dtype or x.dtype)


def _matmul_int4w_kernel(x_ref, p_ref, s_ref, b_ref, o_ref, acc_ref, *,
                         n_k: int, act: Callable, has_bias: bool,
                         out_dtype, half: int):
    """W4 group-wise matmul step: one K-group per grid step. The packed
    [G/2, bn] nibble block is read from HBM ONCE and unpacked in VMEM
    (arithmetic shifts on the VPU) into hi/lo int4 halves; the group's
    scale row dequantizes them to bf16 and two half-K MXU dots
    accumulate — no interleave, no second read (the XLA-level unpack
    measured 15x slower: the stack/reshape interleave materializes,
    and a two-dot XLA form reads the packed bytes twice —
    docs/PERF.md round-5)."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:]
    if xb.dtype == jnp.float32:
        xb = xb.astype(jnp.bfloat16)
    # unpack in i32: Mosaic cannot legalize arith.shrsi on i8 vectors
    # (measured: 'failed to legalize' on the chip); i32 shifts lower
    # fine and the convert is a cheap VPU pass on the VMEM block.
    # `gpb` quant groups stream per grid step (unrolled): one-group
    # blocks were 64 KB DMAs and the kernel pipeline capped at ~160
    # GB/s — far below the chip's ~640 GB/s weight streaming.
    gpb = p_ref.shape[0] // half
    acc = acc_ref[:]
    for gi in range(gpb):
        p32 = p_ref[gi * half:(gi + 1) * half].astype(jnp.int32)
        s = s_ref[gi].astype(jnp.bfloat16)         # [1, bn] (rank-3 in)
        hi = (p32 >> 4).astype(jnp.bfloat16) * s
        lo = ((p32 << 28) >> 28).astype(jnp.bfloat16) * s
        x0 = gi * 2 * half
        acc = (acc
               + jnp.dot(xb[:, x0:x0 + half], hi,
                         preferred_element_type=jnp.float32)
               + jnp.dot(xb[:, x0 + half:x0 + 2 * half], lo,
                         preferred_element_type=jnp.float32))
    acc_ref[:] = acc

    @pl.when(kk == n_k - 1)
    def _():
        out = acc_ref[:]
        if has_bias:
            out = out + b_ref[:].astype(jnp.float32)
        o_ref[:] = act(out).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "k_logical", "activation", "block_m",
                     "block_n", "groups_per_block", "out_dtype"))
def _matmul_int4w_impl(x, packed, gscale, bias, *, group, k_logical,
                       activation, block_m, block_n, groups_per_block,
                       out_dtype):
    m, k = x.shape
    n = packed.shape[1]
    kp = packed.shape[0] * 2                       # group-padded K
    n_groups = kp // group
    gpb = min(groups_per_block, n_groups)
    while n_groups % gpb:
        gpb -= 1
    block_k = gpb * group
    mp, np_ = _round_up(m, block_m), _round_up(n, block_n)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if np_ != n:
        packed = jnp.pad(packed, ((0, 0), (0, np_ - n)))
        gscale = jnp.pad(gscale, ((0, 0), (0, np_ - n)))
    has_bias = bias is not None
    bias2d = jnp.pad(bias, (0, np_ - n)).reshape(1, np_) if has_bias \
        else jnp.zeros((1, np_), jnp.float32)

    n_k = kp // block_k
    grid = (mp // block_m, np_ // block_n, n_k)
    kernel = functools.partial(
        _matmul_int4w_kernel, n_k=n_k,
        act=resolve_activation(activation, kernel=True),
        has_bias=has_bias, out_dtype=out_dtype, half=group // 2)
    # scale rows as rank-3 [n_groups, 1, N]: Mosaic requires the last
    # two block dims divisible by (8, 128) OR equal to the array dims —
    # a [gpb, bn] block of a [n_groups, N] array violates that; of a
    # [n_groups, 1, N] array the (gpb, 1, bn) block matches dim -2
    gscale3 = gscale.reshape(n_groups, 1, np_)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k // 2, block_n),
                         lambda i, j, kk: (kk, j)),
            pl.BlockSpec((gpb, 1, block_n),
                         lambda i, j, kk: (kk, 0, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp * 2 + kp * np_ // 2
                            + kp // group * np_ * 4 + mp * np_ * 4),
            transcendentals=0),
    )(x, packed, gscale3, bias2d)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


def matmul_int4w(x, wq4, bias=None, activation: Optional[str] = None, *,
                 block_m: int = 128, block_n: int = 1024,
                 groups_per_block: int = 8, out_dtype=None):
    """out = act(x[M,K] @ dequant(wq4) + bias[N]) with wq4 a
    Quantized4Tensor (group-wise nibble-packed int4 — see
    quant/tensor.py for the layout contract this kernel shares). Each
    grid step streams `groups_per_block` quant groups (bigger DMAs —
    one-group blocks capped the pipeline at ~160 GB/s)."""
    bm = min(block_m, _round_up(x.shape[0], 8))
    bn = min(block_n, _round_up(wq4.packed.shape[1], 128))
    return _matmul_int4w_impl(
        x, wq4.packed, wq4.scale, bias, group=wq4.group, k_logical=wq4.k,
        activation=activation, block_m=bm, block_n=bn,
        groups_per_block=groups_per_block,
        out_dtype=out_dtype or x.dtype)


def matmul_int4w_ref(x, wq4, bias=None, activation: Optional[str] = None,
                     out_dtype=None):
    """XLA reference: dense-dequant then dot (CPU parity oracle)."""
    w = wq4.dequantize(jnp.float32)
    out = jnp.dot(x.astype(jnp.float32), w,
                  preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    out = resolve_activation(activation)(out)
    return out.astype(out_dtype or x.dtype)


def _matmul_s8s8_kernel(x_ref, w_ref, scale_ref, bias_ref, o_ref, acc_ref,
                        *, n_k: int, act: Callable, has_bias: bool,
                        out_dtype):
    """s8 x s8 -> s32 on the MXU's native int8 path (2x the bf16 MAC
    rate on v5e), f32 dequant/bias/activation epilogue. Correctness is
    exact: int32 accumulation, no rounding until the epilogue."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        out = acc_ref[:].astype(jnp.float32) * scale_ref[:]
        if has_bias:
            out = out + bias_ref[:].astype(jnp.float32)
        o_ref[:] = act(out).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "block_m", "block_n", "block_k",
                     "out_dtype"))
def _matmul_s8s8_impl(x_q, w_q, scale, bias, *, activation, block_m,
                      block_n, block_k, out_dtype):
    m, k = x_q.shape
    _, n = w_q.shape
    mp, kp, np_ = _round_up(m, block_m), _round_up(k, block_k), _round_up(
        n, block_n)
    if (mp, kp) != (m, k):
        x_q = jnp.pad(x_q, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        w_q = jnp.pad(w_q, ((0, kp - k), (0, np_ - n)))
    has_bias = bias is not None
    scale2d = jnp.pad(scale, (0, np_ - n)).reshape(1, np_)
    bias2d = jnp.pad(bias, (0, np_ - n)).reshape(1, np_) if has_bias \
        else jnp.zeros((1, np_), jnp.float32)
    n_k = kp // block_k
    kernel = functools.partial(
        _matmul_s8s8_kernel, n_k=n_k,
        act=resolve_activation(activation, kernel=True),
        has_bias=has_bias, out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_m, np_ // block_n, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_
            + mp * np_ * jnp.dtype(out_dtype).itemsize,
            transcendentals=0),
    )(x_q, w_q, scale2d, bias2d)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


def matmul_s8s8(x_q, w_q, scale, bias=None, activation: Optional[str] = None,
                *, block_m: int = 512, block_n: int = 1024,
                block_k: int = 1024, out_dtype=jnp.bfloat16):
    """out = act((x_q[M,K]s8 @ w_q[K,N]s8).s32 * scale[N] + bias[N]).

    The static-int8 GEMM (quant semantics of ops/conv.int8_epilogue:
    scale = act_scale * w_scale per output channel, f32 epilogue).
    Mosaic lowers the int8 dot to the MXU's native s8 path — verified
    exact vs XLA's s32 dot_general. Default blocks from the probe sweep
    (scripts/s8_matmul_experiment.py); per-shape perf vs XLA is still
    an OPEN measurement (the sequential sweep produced physically
    impossible readings, see docs/PERF.md) — use is opt-in, like the
    other Pallas kernels."""
    bm, bn, bk = _pick_blocks(x_q.shape[0], x_q.shape[1], w_q.shape[1],
                              block_m, block_n, block_k)
    scale = jnp.asarray(scale, jnp.float32)
    if scale.ndim == 0:
        scale = jnp.full((w_q.shape[1],), scale)
    return _matmul_s8s8_impl(x_q, w_q, scale, bias, activation=activation,
                             block_m=bm, block_n=bn, block_k=bk,
                             out_dtype=out_dtype)


# ---- jnp reference implementations (the GemmPack4F32Ref analog) --------
# precision=HIGHEST so the reference is truly f32 on TPU too (the MXU's
# default single bf16 pass would make the oracle as sloppy as the thing
# under test)
def matmul_ref(x, w, bias=None, activation: Optional[str] = None):
    out = jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32),
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return resolve_activation(activation)(out).astype(x.dtype)


def matmul_int8w_ref(x, w_q, scale, bias=None,
                     activation: Optional[str] = None):
    out = jnp.dot(x.astype(jnp.float32), w_q.astype(jnp.float32),
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return resolve_activation(activation)(out).astype(x.dtype)


def matmul_s8s8_ref(x_q, w_q, scale, bias=None,
                    activation: Optional[str] = None,
                    out_dtype=jnp.bfloat16):
    """Exact s32 reference for matmul_s8s8 (XLA dot_general int8 path)."""
    acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    scale = jnp.asarray(scale, jnp.float32)
    out = acc.astype(jnp.float32) * scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return resolve_activation(activation)(out).astype(out_dtype)
