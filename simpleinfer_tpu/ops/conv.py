"""nn.Conv2d lowering — NHWC conv on the MXU.

Capability parity with the reference Conv2d layer
(/root/reference/src/layer/conv_2d.cpp): params padding_mode / padding /
kernel_size / stride / dilation / groups / in_channels / out_channels /
bias, weight OIHW transformed to HWIO at load (conv_2d.cpp:149-150),
zero / replicate / reflect padding modes (the reference parses all three
at conv_2d.cpp:27-39 but its kernels only implement zeros; here all three
work), grouped conv via feature_group_count.

TPU-first design notes: the reference picks between Winograd F(2,3),
im2col GEMM, and grouped im2col at Forward (conv_2d.cpp:108-118). On TPU
there is one canonical path — `lax.conv_general_dilated`, which XLA lowers
to implicit-GEMM on the 128x128 MXU and fuses the bias broadcast and any
following activation into the epilogue. A Winograd variant is deliberately
NOT implemented: F(2,3) trades a 2.25x multiply reduction for extra
transforms; on the MXU multiplies are not the bottleneck (HBM bandwidth
is) and the transforms add bandwidth, so im2col/implicit GEMM wins. The
int8 weight-only path with dequant fused into the matmul epilogue lives in
kernels/matmul.py and is dispatched for 1x1 convs (pointwise convs ARE
matmuls).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

import numpy as np

from ..kernels.matmul import pallas_supported
from ..quant.tensor import QuantizedTensor, resolve_weight
from .registry import OpImpl, register_op, require_attr, require_param
from ..ir.graph import (
    PARAM_AINT, PARAM_BOOL, PARAM_INT, PARAM_STR,
)

_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv2d_nhwc(x, w, bias=None, *, stride=(1, 1), padding=((0, 0), (0, 0)),
                dilation=(1, 1), groups=1, padding_mode="zeros",
                accum_dtype=jnp.float32, activation=None):
    """Functional NHWC conv used by both the engine and the model zoo.

    `w` is HWIO (or a QuantizedTensor of it); `padding` is
    ((top, bottom), (left, right)); `activation` is an optional fused
    epilogue name (kernels/matmul._ACTIVATIONS).
    """
    w = resolve_weight(w, x.dtype)
    if padding_mode == "zeros":
        pad = padding
    else:
        mode = {"replicate": "edge", "reflect": "reflect"}[padding_mode]
        x = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)), mode=mode)
        pad = ((0, 0), (0, 0))
    # fp32 inputs get faithful fp32 accumulation (3-pass bf16 on the MXU) —
    # the bit-parity mode vs the CPU reference; bf16 inputs take the fast
    # single-pass MXU path (the production mode).
    precision = (lax.Precision.HIGHEST if x.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    out = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=_DIMENSION_NUMBERS,
        feature_group_count=groups,
        preferred_element_type=accum_dtype,
        precision=precision,
    )
    if bias is not None:
        out = out + bias.astype(accum_dtype)
    if activation is not None:
        from ..kernels.matmul import _ACTIVATIONS

        out = _ACTIVATIONS[activation](out)
    return out.astype(x.dtype)


def _space_to_depth_weights(w_hwio: np.ndarray) -> np.ndarray:
    """Rearrange an HWIO kernel for a stride-(*,2) conv into its
    W-axis space-to-depth equivalent: [kh,kw,ic,oc] ->
    [kh, ceil(kw/2), 2*ic, oc] (odd kw zero-padded at the tail).

    Why: stride-2 stem convs on 3-channel images run the MXU at ~2%
    (the input-feature dim is 3 of 128 lanes; measured ~30% of a
    YOLOv5s-640-b8 bf16 forward on v5e). Packing W-adjacent pixel pairs
    into channels doubles the input features and makes the W stride 1 —
    same FLOPs, better MXU occupancy. ONLY the W axis is packed: packing
    H too needs a (h,2,w,2,c)->(h,w,2,2,c) transpose that XLA executes
    slower than the bad conv it saves (measured: direct 3.8 ms, full
    2x2 s2d 5.5 ms, W-only 2.4 ms), whereas the W pack is a pure
    row-major reshape — zero data movement.
    """
    kh, kw, ic, oc = w_hwio.shape
    kw2 = -(-kw // 2) * 2
    w2 = np.zeros((kh, kw2, ic, oc), w_hwio.dtype)
    w2[:, :kw] = w_hwio
    # (kh, bw, dx, ic, oc) -> merge (dx, ic): channel index dx*ic + c,
    # matching the input reshape [., w/2, 2*ic] — contiguous, no copy
    return np.ascontiguousarray(w2.reshape(kh, kw2 // 2, 2 * ic, oc))


def _space_to_depth_w_nhwc(x):
    """[N,H,W,C] -> [N,H,W/2,2C] by pure reshape (row-major: channel
    index = dx*C + c)."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


# input-channel threshold under which the space-to-depth stem rewrite
# fires (stem convs: ic=3; beyond ~8 the lane packing is fine already)
_S2D_MAX_IC = 8


@register_op("nn.Conv2d")
def lower_conv2d(op, cfg):
    padding_mode = require_param(op, "padding_mode", PARAM_STR).s
    if padding_mode not in ("zeros", "replicate", "reflect"):
        raise ValueError(f"Conv2d {op.name}: unsupported padding_mode "
                         f"{padding_mode!r}")
    padding = require_param(op, "padding", PARAM_AINT).ai
    kernel = require_param(op, "kernel_size", PARAM_AINT).ai
    stride = require_param(op, "stride", PARAM_AINT).ai
    dilation = require_param(op, "dilation", PARAM_AINT).ai
    groups = require_param(op, "groups", PARAM_INT).i
    in_channels = require_param(op, "in_channels", PARAM_INT).i
    out_channels = require_param(op, "out_channels", PARAM_INT).i
    use_bias = require_param(op, "bias", PARAM_BOOL).b

    w = require_attr(op, "weight", 1).array()  # OIHW fp32
    if list(w.shape) != [out_channels, in_channels // groups, *kernel]:
        raise ValueError(f"Conv2d {op.name}: weight shape {w.shape} does not "
                         f"match params")
    # OIHW -> HWIO, like conv_2d.cpp:149-150
    w_hwio = np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))

    weights = {"weight": w_hwio.astype(np.float32)}
    if use_bias:
        b = require_attr(op, "bias", 1).array()
        weights["bias"] = b.astype(np.float32)

    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    stride_t, dilation_t = tuple(stride), tuple(dilation)
    fused_act = (op.params["si_fused_act"].s
                 if op.has_param("si_fused_act") else None)

    # W-stride-2 small-ic stem: pre-build the space-to-depth kernel
    s2d_eligible = (stride_t[1] == 2 and dilation_t == (1, 1)
                    and groups == 1 and padding_mode == "zeros"
                    and in_channels <= _S2D_MAX_IC)
    weights_s2d = _space_to_depth_weights(w_hwio) if s2d_eligible else None
    if weights_s2d is not None:
        weights["weight_s2d"] = weights_s2d.astype(np.float32)

    # Pallas int8 dispatch: pointwise (1x1 s1 p0 g1) convs ARE matmuls —
    # the int8 weight stream + dequant/bias/act epilogue runs in one
    # kernel. Opt-in (see EngineConfig.use_pallas: XLA currently wins
    # e2e); never under a mesh (GSPMD cannot partition the custom call).
    pointwise = (tuple(kernel) == (1, 1) and stride_t == (1, 1)
                 and pad == ((0, 0), (0, 0)) and dilation_t == (1, 1)
                 and groups == 1)
    allow_pallas = bool(cfg.use_pallas) and cfg.mesh is None

    def apply(weights, x):
        w, bias = weights["weight"], weights.get("bias")
        if "weight_s2d" in weights:
            n, h, wd, c = x.shape
            pl = pad[1][0]
            if (wd + 2 * pl) % 2 == 0:
                ws = resolve_weight(weights["weight_s2d"], x.dtype)
                xp = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
                out = lax.conv_general_dilated(
                    _space_to_depth_w_nhwc(xp), ws,
                    window_strides=(stride_t[0], 1), padding="VALID",
                    dimension_numbers=_DIMENSION_NUMBERS,
                    preferred_element_type=jnp.float32,
                    precision=(lax.Precision.HIGHEST
                               if x.dtype == jnp.float32
                               else lax.Precision.DEFAULT))
                if bias is not None:
                    out = out + bias.astype(jnp.float32)
                if fused_act is not None:
                    from ..kernels.matmul import _ACTIVATIONS

                    out = _ACTIVATIONS[fused_act](out)
                return out.astype(x.dtype)
        if (pointwise and allow_pallas and isinstance(w, QuantizedTensor)
                and pallas_supported()):
            from ..kernels.matmul import matmul_int8w

            n, h, wd, c = x.shape
            out = matmul_int8w(
                x.reshape(n * h * wd, c),
                w.data.reshape(c, out_channels),  # HWIO 1x1 -> [K, N]
                w.scale, bias, fused_act)
            return out.reshape(n, h, wd, out_channels)
        return conv2d_nhwc(
            x, w, bias,
            stride=stride_t, padding=pad, dilation=dilation_t,
            groups=groups, padding_mode=padding_mode,
            activation=fused_act)

    # flops at batch 1: 2 * OH*OW * OC * (IC/g) * KH*KW; the executor
    # multiplies the per-pixel term by OH*OW after shape inference
    per_pixel = 2 * out_channels * (in_channels // groups) * kernel[0] * kernel[1]

    quantizable = {"weight": 3}  # HWIO: out channels on axis 3
    if weights_s2d is not None:
        quantizable["weight_s2d"] = 3
    return OpImpl(
        name=op.name, type=op.type, apply=apply, weights=weights,
        quantizable=quantizable,
        shard_hints={"weight": (None, None, None, "model"),
                     "bias": ("model",),
                     "weight_s2d": (None, None, None, "model")},
        flops_per_pixel=per_pixel,
    )
