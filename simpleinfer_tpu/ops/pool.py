"""Pooling lowerings: nn.MaxPool2d, nn.AdaptiveAvgPool2d.

Parity targets:
- MaxPool2d (/root/reference/src/layer/max_pool_2d.cpp): window max with
  explicit (t,b,l,r) padding filled with -inf (the reference pads
  extract_image_patches with float lowest, :102-118). The reference parses
  but ignores ceil_mode (:17-19); here ceil_mode=True is actually honored
  by extending the bottom/right padding so the last partial window is
  included — a superset of reference behavior that matches PyTorch.
- AdaptiveAvgPool2d (/root/reference/src/layer/adaptive_avg_pool_2d.cpp):
  requires divisible input/output spatial dims (:71-76), global-pool fast
  path (:90-93).

Both lower to `lax.reduce_window`, which XLA maps to the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from .registry import OpImpl, register_op, require_param
from ..ir.graph import PARAM_AINT, PARAM_BOOL


def _pool_out_dim(in_dim, k, s, pad, dil, ceil_mode):
    eff_k = dil * (k - 1) + 1
    num = in_dim + 2 * pad - eff_k
    if ceil_mode:
        out = -(-num // s) + 1
        # torch: the last window must start inside the (padded) input
        if (out - 1) * s >= in_dim + pad:
            out -= 1
        return out
    return num // s + 1


def max_pool_2d(x, kernel, stride, padding, dilation=(1, 1),
                ceil_mode=False):
    """NHWC max pool; padding is (pad_h, pad_w) symmetric like torch."""
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    h, w = x.shape[1], x.shape[2]
    oh = _pool_out_dim(h, kh, sh, ph, dh, ceil_mode)
    ow = _pool_out_dim(w, kw, sw, pw, dw, ceil_mode)
    # bottom/right padding large enough for the last window in ceil mode
    pad_b = max((oh - 1) * sh + dh * (kh - 1) + 1 - h - ph, ph)
    pad_r = max((ow - 1) * sw + dw * (kw - 1) + 1 - w - pw, pw)
    neg_inf = (jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
               else jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, neg_inf, lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, pad_b), (pw, pad_r), (0, 0)),
        window_dilation=(1, dh, dw, 1),
    )


def adaptive_avg_pool_2d(x, output_size):
    """NHWC adaptive average pool; in/out spatial dims must divide."""
    oh, ow = output_size
    n, h, w, c = x.shape
    if oh == 1 and ow == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if h % oh != 0 or w % ow != 0:
        raise ValueError(
            f"AdaptiveAvgPool2d: input spatial ({h},{w}) not divisible by "
            f"output ({oh},{ow})")
    kh, kw = h // oh, w // ow
    summed = lax.reduce_window(
        x, jnp.zeros((), x.dtype), lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, kh, kw, 1),
        padding="VALID",
    )
    return summed / jnp.asarray(kh * kw, x.dtype)


@register_op("nn.MaxPool2d")
def lower_max_pool_2d(op, cfg):
    ceil_mode = require_param(op, "ceil_mode", PARAM_BOOL).b
    require_param(op, "return_indices", PARAM_BOOL)
    padding = tuple(require_param(op, "padding", PARAM_AINT).ai)
    kernel = tuple(require_param(op, "kernel_size", PARAM_AINT).ai)
    stride = tuple(require_param(op, "stride", PARAM_AINT).ai)
    dilation = tuple(require_param(op, "dilation", PARAM_AINT).ai)

    def apply(weights, x):
        return max_pool_2d(x, kernel, stride, padding, dilation, ceil_mode)

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("nn.AdaptiveAvgPool2d")
def lower_adaptive_avg_pool_2d(op, cfg):
    output_size = tuple(require_param(op, "output_size", PARAM_AINT).ai)

    def apply(weights, x):
        return adaptive_avg_pool_2d(x, output_size)

    return OpImpl(name=op.name, type=op.type, apply=apply)
