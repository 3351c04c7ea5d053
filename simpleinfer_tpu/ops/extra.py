"""Extended op coverage beyond the reference's 15 layers.

The reference registry stops at what YOLOv5/ResNet/MobileNet need
(/root/reference/src/layer_registry.cpp:33-49). Real pnnx exports of
nearby models also use these; all follow the same NHWC storage with
NCHW-logical dim/shape arguments remapped at the boundary (see
ops/shape.py docstring).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ir.graph import (PARAM_AINT, PARAM_BOOL, PARAM_FLOAT, PARAM_INT,
                        PARAM_STR)
from .registry import OpImpl, register_op, require_attr, require_param

_NCHW_TO_NHWC_DIM = {0: 0, 1: 3, 2: 1, 3: 2}


def _to_logical(x):
    """Physical NHWC -> logical NCHW for rank-4 (no-op otherwise)."""
    return jnp.transpose(x, (0, 3, 1, 2)) if x.ndim == 4 else x


def _to_physical(x):
    return jnp.transpose(x, (0, 2, 3, 1)) if x.ndim == 4 else x


# ------------------------------------------------------------- avg pool
def avg_pool_2d(x, kernel, stride, padding, ceil_mode=False,
                count_include_pad=True):
    """NHWC average pool with torch semantics."""
    from .pool import _pool_out_dim

    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    h, w = x.shape[1], x.shape[2]
    oh = _pool_out_dim(h, kh, sh, ph, 1, ceil_mode)
    ow = _pool_out_dim(w, kw, sw, pw, 1, ceil_mode)
    pad_b = max((oh - 1) * sh + kh - h - ph, ph)
    pad_r = max((ow - 1) * sw + kw - w - pw, pw)
    summed = lax.reduce_window(
        x, jnp.zeros((), x.dtype), lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, pad_b), (pw, pad_r), (0, 0)))
    if count_include_pad and not ceil_mode:
        return summed / jnp.asarray(kh * kw, x.dtype)
    if count_include_pad:
        # torch counts the symmetric padding in the divisor but CLIPS
        # ceil-mode overhang (the window area beyond the padded input):
        # count over ones of the PADDED extent, zero-extending only the
        # ceil extra (pad_b - ph / pad_r - pw)
        ones = jnp.ones((1, h + 2 * ph, w + 2 * pw, 1), x.dtype)
        pad_cfg = ((0, 0), (0, pad_b - ph), (0, pad_r - pw), (0, 0))
    else:
        ones = jnp.ones((1, h, w, 1), x.dtype)
        pad_cfg = ((0, 0), (ph, pad_b), (pw, pad_r), (0, 0))
    counts = lax.reduce_window(
        ones, jnp.zeros((), x.dtype), lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=pad_cfg)
    return summed / counts


@register_op("nn.AvgPool2d")
def lower_avg_pool_2d(op, cfg):
    kernel = tuple(require_param(op, "kernel_size", PARAM_AINT).ai)
    stride = tuple(op.params["stride"].ai) if op.has_param(
        "stride", PARAM_AINT) else kernel
    padding = tuple(op.params["padding"].ai) if op.has_param(
        "padding", PARAM_AINT) else (0, 0)
    ceil_mode = (op.params["ceil_mode"].b
                 if op.has_param("ceil_mode", PARAM_BOOL) else False)
    cip = (op.params["count_include_pad"].b
           if op.has_param("count_include_pad", PARAM_BOOL) else True)

    def apply(weights, x):
        return avg_pool_2d(x, kernel, stride, padding, ceil_mode, cip)

    return OpImpl(name=op.name, type=op.type, apply=apply)


# -------------------------------------------------------- chunk / split
@register_op("torch.chunk")
def lower_chunk(op, cfg):
    chunks = require_param(op, "chunks", PARAM_INT).i
    dim = require_param(op, "dim", PARAM_INT).i

    n_declared = len(op.outputs) or chunks

    def apply(weights, x):
        d = dim + x.ndim if dim < 0 else dim
        if x.ndim == 4:
            d = _NCHW_TO_NHWC_DIM[d]
        size = x.shape[d]
        per = -(-size // chunks)  # torch: ceil split
        n_eff = -(-size // per)   # torch returns FEWER chunks when the
        if n_eff != n_declared:   # ceil split exhausts the dim early
            raise ValueError(
                f"chunk {op.name}: dim size {size} yields {n_eff} chunks "
                f"of {per}, but the graph declares {n_declared} outputs")
        return tuple(
            lax.slice_in_dim(x, i * per, min((i + 1) * per, size), axis=d)
            for i in range(n_eff))

    return OpImpl(name=op.name, type=op.type, apply=apply,
                  n_outputs=n_declared)


@register_op("torch.split")
def lower_split(op, cfg):
    dim = require_param(op, "dim", PARAM_INT).i
    p = op.params.get("split_size_or_sections")
    if p is None:
        raise ValueError(f"split {op.name}: missing split_size_or_sections")
    sections = p.ai if p.type == 5 else p.i

    def apply(weights, x):
        d = dim + x.ndim if dim < 0 else dim
        if x.ndim == 4:
            d = _NCHW_TO_NHWC_DIM[d]
        size = x.shape[d]
        if isinstance(sections, int):
            bounds = list(range(sections, size, sections))
        else:
            bounds = np.cumsum(sections)[:-1].tolist()
        starts = [0] + bounds
        ends = bounds + [size]
        return tuple(lax.slice_in_dim(x, s, e, axis=d)
                     for s, e in zip(starts, ends))

    return OpImpl(name=op.name, type=op.type, apply=apply,
                  n_outputs=len(op.outputs))


# ----------------------------------------------------- permute / reshape
@register_op("torch.permute")
def lower_permute(op, cfg):
    dims = tuple(require_param(op, "dims", PARAM_AINT).ai)

    def apply(weights, x):
        y = jnp.transpose(_to_logical(x), dims)
        return _to_physical(y)

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("torch.transpose")
def lower_transpose(op, cfg):
    d0 = require_param(op, "dim0", PARAM_INT).i
    d1 = require_param(op, "dim1", PARAM_INT).i

    def apply(weights, x):
        y = _to_logical(x)
        perm = list(range(y.ndim))
        a = d0 + y.ndim if d0 < 0 else d0
        b = d1 + y.ndim if d1 < 0 else d1
        perm[a], perm[b] = perm[b], perm[a]
        return _to_physical(jnp.transpose(y, perm))

    return OpImpl(name=op.name, type=op.type, apply=apply)


def _reshape_logical(x, shape):
    y = _to_logical(x)
    shape = [int(s) for s in shape]
    y = jnp.reshape(y, shape)
    return _to_physical(y)


for _t in ("torch.reshape", "Tensor.reshape", "Tensor.view"):
    @register_op(_t)
    def lower_reshape(op, cfg, _t=_t):
        shape = require_param(op, "shape", PARAM_AINT).ai

        def apply(weights, x):
            return _reshape_logical(x, shape)

        return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("torch.unsqueeze")
def lower_unsqueeze(op, cfg):
    dim = require_param(op, "dim", PARAM_INT).i

    def apply(weights, x):
        y = jnp.expand_dims(_to_logical(x), dim)
        return _to_physical(y)

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("torch.squeeze")
def lower_squeeze(op, cfg):
    def apply(weights, x):
        y = _to_logical(x)
        if op.has_param("dim", PARAM_INT):
            y = jnp.squeeze(y, op.params["dim"].i)
        else:
            y = jnp.squeeze(y)
        return _to_physical(y)

    return OpImpl(name=op.name, type=op.type, apply=apply)


# ------------------------------------------------------- more activations
@register_op("nn.LeakyReLU")
def lower_leaky_relu(op, cfg):
    slope = (op.params["negative_slope"].f
             if op.has_param("negative_slope", PARAM_FLOAT) else 0.01)

    def apply(weights, x):
        return jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("nn.ELU")
def lower_elu(op, cfg):
    alpha = (op.params["alpha"].f
             if op.has_param("alpha", PARAM_FLOAT) else 1.0)

    def apply(weights, x):
        return jnp.where(x > 0, x,
                         jnp.asarray(alpha, x.dtype) * jnp.expm1(x))

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("nn.GELU")
def lower_gelu(op, cfg):
    # pnnx/torch `approximate` param: "none" (exact, default) or "tanh"
    approx = (op.params["approximate"].s
              if op.has_param("approximate") else "none") == "tanh"

    def apply(weights, x):
        return jax.nn.gelu(x, approximate=approx)

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("nn.Tanh")
def lower_tanh(op, cfg):
    def apply(weights, x):
        return jnp.tanh(x)

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("nn.PReLU")
def lower_prelu(op, cfg):
    require_param(op, "num_parameters", PARAM_INT)
    w = require_attr(op, "weight", 1).array().astype(np.float32)

    def apply(weights, x):
        a = weights["slope"].astype(x.dtype)  # [C] broadcast on NHWC last
        return jnp.where(x >= 0, x, x * a)

    return OpImpl(name=op.name, type=op.type, apply=apply,
                  weights={"slope": w})


# -------------------------------------------------------- conv transpose
@register_op("nn.ConvTranspose2d")
def lower_conv_transpose_2d(op, cfg):
    in_channels = require_param(op, "in_channels", PARAM_INT).i
    out_channels = require_param(op, "out_channels", PARAM_INT).i
    kernel = require_param(op, "kernel_size", PARAM_AINT).ai
    stride = tuple(require_param(op, "stride", PARAM_AINT).ai)
    padding = require_param(op, "padding", PARAM_AINT).ai
    output_padding = (op.params["output_padding"].ai
                      if op.has_param("output_padding", PARAM_AINT)
                      else [0, 0])
    dilation = tuple(op.params["dilation"].ai
                     if op.has_param("dilation", PARAM_AINT) else (1, 1))
    groups = require_param(op, "groups", PARAM_INT).i
    use_bias = require_param(op, "bias", PARAM_BOOL).b
    if groups != 1:
        raise ValueError(f"ConvTranspose2d {op.name}: groups>1 unsupported")

    w = require_attr(op, "weight", 1).array()  # IOHW [ic, oc, kh, kw]
    if list(w.shape) != [in_channels, out_channels, *kernel]:
        raise ValueError(f"ConvTranspose2d {op.name}: weight shape "
                         f"{w.shape} does not match params")
    # flip spatially, to HWIO with the transpose-conv channel swap
    w_t = np.ascontiguousarray(
        np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))).astype(np.float32)

    weights = {"weight": w_t}
    if use_bias:
        weights["bias"] = require_attr(op, "bias", 1).array().astype(
            np.float32)

    kh, kw = kernel
    dh, dw = dilation
    pads = tuple(
        (d * (k - 1) - p, d * (k - 1) - p + opad)
        for k, p, opad, d in zip(kernel, padding, output_padding, dilation))

    def apply(weights, x):
        from ..quant.tensor import resolve_weight

        wt = resolve_weight(weights["weight"], x.dtype)
        out = lax.conv_general_dilated(
            x, wt, window_strides=(1, 1), padding=pads,
            lhs_dilation=stride, rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        bias = weights.get("bias")
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)

    return OpImpl(name=op.name, type=op.type, apply=apply, weights=weights,
                  quantizable={"weight": 3},  # HWIO: oc on axis 3
                  shard_hints={"weight": (None, None, None, "model"),
                               "bias": ("model",)},
                  flops_per_pixel=2 * in_channels * out_channels * kh * kw)


# ------------------------------------------------------------- constants
@register_op("pnnx.Attribute")
def lower_pnnx_attribute(op, cfg):
    """Constant-tensor operator (real pnnx exports emit these for
    weights shared by several consumers). The single attr holds the
    data; rank-4 constants are stored NCHW on disk like operands and
    transposed to NHWC here."""
    if len(op.attrs) != 1:
        raise ValueError(f"pnnx.Attribute {op.name}: expected exactly one "
                         f"attr, got {list(op.attrs)}")
    (arr,) = [a.array() for a in op.attrs.values()]
    if arr.ndim == 4:
        arr = np.transpose(arr, (0, 2, 3, 1))
    arr = np.ascontiguousarray(arr)

    def apply(weights, *unused):
        return jnp.asarray(weights["value"])

    return OpImpl(name=op.name, type=op.type, apply=apply,
                  weights={"value": arr})


# ------------------------------------------------------ reductions/stack
# physical NHWC axis -> logical NCHW dim (inverse of _NCHW_TO_NHWC_DIM)
_NHWC_TO_NCHW_DIM = {0: 0, 1: 2, 2: 3, 3: 1}


def _reduce_nchw(x, dims_logical, keepdim, reducer):
    """Reduce over LOGICAL NCHW dims on physical-NHWC rank-4 storage.

    With keepdim=False the surviving axes must come out in logical
    order: e.g. mean over dim=2 (H) of a logical [N,C,H,W] is [N,C,W] —
    but reducing physical axis 1 of NHWC leaves [N,W,C]. Reorder the
    survivors by their logical ids (a no-op for rank<4, full reduces,
    and channel/spatial-pair reduces, where both orders coincide)."""
    ds = [d + x.ndim if d < 0 else d for d in dims_logical]
    if x.ndim != 4:
        out = reducer(x, tuple(ds), keepdim)
        if out.ndim == 4:
            # rank transition (e.g. 5-D logical -> 4-D): rank-4 operands
            # are physical NHWC by convention
            out = jnp.transpose(out, (0, 2, 3, 1))
        return out
    phys = [_NCHW_TO_NHWC_DIM[d] for d in ds]
    out = reducer(x, tuple(phys), keepdim)
    if keepdim:
        return out  # still rank-4 physical NHWC
    survivors = [a for a in range(4) if a not in phys]
    logical = [_NHWC_TO_NCHW_DIM[a] for a in survivors]
    perm = sorted(range(len(logical)), key=lambda i: logical[i])
    if perm != list(range(len(perm))):
        out = jnp.transpose(out, perm)
    return out


@register_op("torch.mean")
def lower_mean(op, cfg):
    dims = require_param(op, "dim", PARAM_AINT).ai
    keepdim = (op.params["keepdim"].b
               if op.has_param("keepdim", PARAM_BOOL) else False)

    def apply(weights, x):
        return _reduce_nchw(x, dims, keepdim,
                            lambda v, ax, kd: jnp.mean(v, axis=ax,
                                                       keepdims=kd))

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("torch.sum")
def lower_sum(op, cfg):
    dims = require_param(op, "dim", PARAM_AINT).ai
    keepdim = (op.params["keepdim"].b
               if op.has_param("keepdim", PARAM_BOOL) else False)

    def apply(weights, x):
        return _reduce_nchw(x, dims, keepdim,
                            lambda v, ax, kd: jnp.sum(v, axis=ax,
                                                      keepdims=kd))

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("torch.amax")
def lower_amax(op, cfg):
    dims = require_param(op, "dim", PARAM_AINT).ai
    keepdim = (op.params["keepdim"].b
               if op.has_param("keepdim", PARAM_BOOL) else False)

    def apply(weights, x):
        return _reduce_nchw(x, dims, keepdim,
                            lambda v, ax, kd: jnp.max(v, axis=ax,
                                                      keepdims=kd))

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("torch.stack")
def lower_stack(op, cfg):
    dim = require_param(op, "dim", PARAM_INT).i

    def apply(weights, *inputs):
        xs = list(inputs)
        out_rank = xs[0].ndim + 1
        d = dim + out_rank if dim < 0 else dim
        if xs[0].ndim == 4:
            # physical NHWC inputs -> logical for the stack; the 5-D
            # result stays logical (only rank-4 operands are physical)
            xs = [jnp.transpose(x, (0, 3, 1, 2)) for x in xs]
            return jnp.stack(xs, axis=d)
        out = jnp.stack(xs, axis=d)
        if out.ndim == 4:
            # rank-4 operands are stored physical NHWC by convention
            out = jnp.transpose(out, (0, 2, 3, 1))
        return out

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("nn.Softmax")
def lower_softmax(op, cfg):
    """Softmax over a LOGICAL dim (rank-4 operands are physical NHWC)."""
    dim = require_param(op, "dim", PARAM_INT).i

    def apply(weights, x):
        d = dim + x.ndim if dim < 0 else dim
        if x.ndim == 4:
            d = _NCHW_TO_NHWC_DIM[d]
        return jax.nn.softmax(x, axis=d)

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("F.softmax")
def lower_f_softmax(op, cfg):
    return lower_softmax(op, cfg)


def _opt_float(op, key):
    """Optional numeric param: float or int value, None/absent -> None
    (pnnx writes unset optionals as `key=None`, parsed as PARAM_NULL —
    an untyped has_param() check would match it and crash on .f)."""
    if op.has_param(key, PARAM_FLOAT):
        return op.params[key].f
    if op.has_param(key, PARAM_INT):
        return float(op.params[key].i)
    return None


@register_op("torch.clamp")
def lower_clamp(op, cfg):
    lo = _opt_float(op, "min")
    hi = _opt_float(op, "max")

    def apply(weights, x):
        return jnp.clip(x, lo, hi)

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("nn.ZeroPad2d")
def lower_zero_pad_2d(op, cfg):
    """padding = [left, right, top, bottom] (torch order); input is
    physical NHWC so pads land on dims 2 (W) and 1 (H)."""
    pad = require_param(op, "padding", PARAM_AINT).ai
    left, right, top, bottom = (int(v) for v in pad)

    def apply(weights, x):
        return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)))

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("F.pad")
def lower_f_pad(op, cfg):
    """Constant/replicate/reflect pad; `pad` pairs run from the LAST
    logical dim inward (torch semantics)."""
    pad = require_param(op, "pad", PARAM_AINT).ai
    mode = (op.params["mode"].s if op.has_param("mode", PARAM_STR)
            else "constant")
    value = _opt_float(op, "value") or 0.0
    jmode = {"constant": "constant", "replicate": "edge",
             "reflect": "reflect"}.get(mode)
    if jmode is None:
        raise ValueError(f"F.pad {op.name}: unsupported mode {mode!r}")

    def apply(weights, x):
        y = _to_logical(x)
        cfg_pairs = [(0, 0)] * y.ndim
        for i in range(len(pad) // 2):
            cfg_pairs[y.ndim - 1 - i] = (int(pad[2 * i]),
                                         int(pad[2 * i + 1]))
        kw = {"constant_values": value} if jmode == "constant" else {}
        return _to_physical(jnp.pad(y, cfg_pairs, mode=jmode, **kw))

    return OpImpl(name=op.name, type=op.type, apply=apply)
