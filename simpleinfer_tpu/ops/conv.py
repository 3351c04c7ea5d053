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

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

import numpy as np

from ..kernels.matmul import pallas_supported
from ..quant.tensor import (
    QuantizedActivation, QuantizedTensor, quantize_act, resolve_weight,
)
from .registry import OpImpl, register_op, require_attr, require_param
from ..ir.graph import (
    PARAM_AINT, PARAM_BOOL, PARAM_INT, PARAM_STR,
)

_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def _finish(out_f32, out_dtype, out_quant_scale):
    """Close a conv epilogue: cast to the activation dtype, or — for a
    marked int8 chain (ir/passes.mark_int8_chains) — requantize the f32
    result to the consumer's scale and ship 1-byte data."""
    if out_quant_scale is not None:
        return QuantizedActivation(
            data=quantize_act(out_f32, out_quant_scale),
            scale=out_quant_scale)
    return out_f32.astype(out_dtype)


def conv2d_nhwc(x, w, bias=None, *, stride=(1, 1), padding=((0, 0), (0, 0)),
                dilation=(1, 1), groups=1, padding_mode="zeros",
                accum_dtype=jnp.float32, activation=None,
                out_quant_scale=None):
    """Functional NHWC conv used by both the engine and the model zoo.

    `w` is HWIO (or a QuantizedTensor of it); `padding` is
    ((top, bottom), (left, right)); `activation` is an optional fused
    epilogue name (kernels/matmul.resolve_activation); `out_quant_scale`
    requantizes the epilogue result to int8 (see `_finish`).
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
        from ..kernels.matmul import resolve_activation

        out = resolve_activation(activation)(out)
    return _finish(out, x.dtype, out_quant_scale)


def int8_conv_eligible(kernel_area: int, in_channels: int,
                       min_channels: int, pointwise_ok: bool) -> bool:
    """The static-int8 dispatch gate — single source of truth for the
    conv lowering AND ir/passes.mark_int8_chains. v5e-measured
    (docs/PERF.md): s8×s8 wins only on k>1 convs with wide input."""
    return (in_channels >= min_channels
            and (kernel_area > 1 or pointwise_ok))


def int8_epilogue(acc, act_scale, w_scale, bias, activation, out_dtype,
                  out_quant_scale=None):
    """Shared s32→f32 dequant + bias + activation epilogue for every
    static-int8 matmul/conv site (conv, cat-split conv, linear) — one
    place to change the int8 numerics.

    A rank-1 `act_scale` means per-CHANNEL activation scales, which were
    FOLDED into the quantized weight at install time
    (engine._install_act_scales, see OpImpl.act_fold): the epilogue
    dequant is then `w_scale` alone — the act factor is already inside
    the weight's per-out-channel scale."""
    if getattr(act_scale, "ndim", 0):
        out = acc.astype(jnp.float32) * w_scale
    else:
        out = acc.astype(jnp.float32) * (act_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if activation is not None:
        from ..kernels.matmul import resolve_activation

        out = resolve_activation(activation)(out)
    return _finish(out, out_dtype, out_quant_scale)


def conv2d_int8_static(x, wq: QuantizedTensor, act_scale, bias=None, *,
                       stride=(1, 1), padding=((0, 0), (0, 0)),
                       dilation=(1, 1), groups=1, padding_mode="zeros",
                       activation=None, out_quant_scale=None,
                       out_dtype=None):
    """Static full-int8 NHWC conv: quantize the activation per-tensor
    (scale from Engine.calibrate), run s8×s8→s32 on the MXU int8 path
    (2× the bf16 MAC rate on v5e), dequantize by act_scale·w_scale[oc]
    in the epilogue, then bias + activation in f32. Symmetric quant
    means zero-padding is exact in the quantized domain (0 ↔ 0.0);
    replicate/reflect pad the int8 tensor directly (1-byte traffic).

    `x` may be a QuantizedActivation from a chained producer (its own
    quantize pass is then skipped and its 1-byte data convolved
    directly); `out_quant_scale` requantizes the result for the next
    chained consumer (see `_finish`)."""
    if isinstance(x, QuantizedActivation):
        q, act_scale = x.data, x.scale
        out_dtype = out_dtype or jnp.bfloat16
    else:
        q = quantize_act(x, act_scale)
        out_dtype = out_dtype or x.dtype
    if padding_mode == "zeros":
        pad = padding
    else:
        mode = {"replicate": "edge", "reflect": "reflect"}[padding_mode]
        q = jnp.pad(q, ((0, 0), padding[0], padding[1], (0, 0)), mode=mode)
        pad = ((0, 0), (0, 0))
    acc = lax.conv_general_dilated(
        q, wq.data,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=_DIMENSION_NUMBERS,
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    return int8_epilogue(acc, act_scale, wq.scale, bias, activation,
                         out_dtype, out_quant_scale)


# Stem W-packing factors tried largest-first at trace time (the input
# width must divide into blocks and the output width into jo=f/2 groups)
_STEM_PACK_FACTORS = (8, 4, 2)


@jax.tree_util.register_pytree_node_class
@dataclass
class PackedW:
    """A W-packed activation flowing between chained packed convs:
    data [N, H, OW/jo, jo*C] holds `jo` W-adjacent pixels folded into
    channels (pixel-major: channel index = j*C + c). Only travels
    between ops marked by ir/passes.mark_packed_conv_chains — never
    crosses the jit boundary."""

    data: object
    jo: int
    ow: int

    def tree_flatten(self):
        return (self.data,), (self.jo, self.ow)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(data=children[0], jo=aux[0], ow=aux[1])

    @property
    def shape(self):
        """Logical (unpacked) NHWC shape."""
        n, h, _, cjo = self.data.shape
        return (n, h, self.ow, cjo // self.jo)

    def unpack(self):
        n, h, _, cjo = self.data.shape
        return self.data.reshape(n, h, self.ow, cjo // self.jo)


def stem_pack_factor(wd: int, kw: int, sw: int, pl: int):
    """Largest viable W-pack block factor for a stem conv on input width
    `wd` — the single source of truth for the trace-time choice in
    `lower_conv2d.apply` AND the engine's pre-packed input staging
    (executor._stem_input_transforms). Replicates _apply_packed_in's
    viability checks (divisibility, stride<=g, over-padded kernels) so
    the two sites can never drift. Returns f or None."""
    ow = (wd + 2 * pl - kw) // sw + 1
    for f in _STEM_PACK_FACTORS:
        if sw > f or wd % f or ow % (f // sw):
            continue
        jo2, pad_blocks, taps = _bt_geometry(f, sw, kw, pl)
        if jo2 == 0 or ow % jo2:
            continue
        blocks_needed = ow // jo2 + taps - 1
        if pad_blocks + wd // f > blocks_needed:
            continue  # over-padded (pl >= kw): packed path would bail
        return f
    return None


def _bt_geometry(g: int, sw: int, kw: int, pad_w: int):
    """Shared tap geometry for block-Toeplitz convs over g-pixel input
    blocks: returns (jo_out, pad_blocks, taps)."""
    jo = g // sw
    offs = [sw * j + kx - pad_w for j in range(jo) for kx in range(kw)]
    lo = min(offs)
    pad_blocks = (-lo + g - 1) // g if lo < 0 else 0
    taps = (max(offs) + pad_blocks * g) // g + 1
    return jo, pad_blocks, taps


def _block_toeplitz_weights(w_hwio: np.ndarray, g: int, sw: int,
                            pad_w: int) -> np.ndarray:
    """Repack an HWIO kernel to consume g-pixel W-packed input blocks
    (channel index d*ic + c) and produce (g//sw)-pixel packed output
    blocks (channel index j*oc + o), with the W padding folded into the
    tap offsets (the consumer supplies `pad_blocks` left zero blocks via
    the conv's own padding config — no materialized pads).

    Why: stem convs on 3-channel images run the MXU at ~2% (the input-
    feature dim is 3 of 128 lanes; measured ~30% of a YOLOv5s-640-b8
    bf16 forward on v5e). A full 2x2 space-to-depth needs an
    interleaving transpose XLA executes SLOWER than the bad conv it
    saves (direct 3.8 ms, 2x2-s2d 5.5 ms); W-only blocking is a
    zero-cost row-major reshape. g=8 turns the yolov5 stem into a
    K=kh*taps*g*ic=288, N=(g/2)*oc=128 implicit-im2col matmul at the
    price of ~2.7x zero-padded FLOPs (free: the op is bandwidth-bound).
    The same repack relays packed tensors between chained convs
    (ir/passes.mark_packed_conv_chains), skipping unpack/repack layout
    copies."""
    kh, kw, ic, oc = w_hwio.shape
    jo, pad_blocks, taps = _bt_geometry(g, sw, kw, pad_w)
    shift = pad_blocks * g
    w_pack = np.zeros((kh, taps, g * ic, jo * oc), w_hwio.dtype)
    for j in range(jo):
        for kx in range(kw):
            b, d = divmod(sw * j + kx - pad_w + shift, g)
            w_pack[:, b, d * ic:(d + 1) * ic,
                   j * oc:(j + 1) * oc] = w_hwio[:, kx]
    return np.ascontiguousarray(w_pack)


# input-block sizes a packed-input conv prepares weights for (the
# producer picks f∈{8,4,2} at trace time → emits jo=f/2∈{4,2,1} blocks)
_BT_IN_BLOCKS = (4, 2)

# debug/A-B switch: keep cat-split 1x1 convs in the packed domain
# (measured on-chip before enabling; scripts/packed_cat_experiment.py)
_PACKED_CAT_SPLIT = True
# force the pre-2026-08-19 f32 partial carry in _apply_split_packed
# (measurement control for scripts/stem_factor_experiment.py only)
_PACKED_SPLIT_CARRY_F32 = False


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
    # int8-chain producer marker (ir/passes.mark_int8_chains): the name
    # of the consumer whose calibrated act_scale this conv requantizes
    # its output to (Engine.calibrate installs `out_scale`)
    q_consumer = (op.params["si_q_out"].s
                  if op.has_param("si_q_out") else None)

    # W-stride-2 small-ic stem: the graph input reshapes (free) into
    # f-pixel blocks and runs the same packed path as chained convs
    s2d_eligible = (stride_t[1] == 2 and dilation_t == (1, 1)
                    and groups == 1 and padding_mode == "zeros"
                    and in_channels <= _S2D_MAX_IC)
    # chain markers from ir/passes.mark_packed_conv_chains
    pack_out = op.has_param("si_pack_out")
    pack_in = op.has_param("si_pack_in")
    packed_gs = (_STEM_PACK_FACTORS if s2d_eligible
                 else _BT_IN_BLOCKS if pack_in else ())
    for g in packed_gs:
        weights[f"bt_in{g}"] = _block_toeplitz_weights(
            w_hwio, g, stride_t[1], padding[1]).astype(np.float32)

    # Pallas int8 dispatch: pointwise (1x1 s1 p0 g1) convs ARE matmuls —
    # the int8 weight stream + dequant/bias/act epilogue runs in one
    # kernel. Opt-in (see EngineConfig.use_pallas: XLA currently wins
    # e2e); never under a mesh (GSPMD cannot partition the custom call).
    pointwise = (tuple(kernel) == (1, 1) and stride_t == (1, 1)
                 and pad == ((0, 0), (0, 0)) and dilation_t == (1, 1)
                 and groups == 1)
    allow_pallas = bool(cfg.use_pallas) and cfg.mesh is None

    def _epilogue_packed(out, bias, jo_count, dtype):
        """bias + activation in the packed domain (bias tiled per
        output-pixel slot) so they fuse into the conv epilogue."""
        if bias is not None:
            out = out + jnp.tile(bias.astype(jnp.float32), jo_count)
        if fused_act is not None:
            from ..kernels.matmul import resolve_activation

            out = resolve_activation(fused_act)(out)
        return out.astype(dtype)

    def _apply_packed_in(weights, xp: PackedW, bias):
        """Convolve a g-pixel W-packed tensor with the block-Toeplitz
        kernel. Both paddings ride the conv's own padding config (no
        materialized pad copies); the left W padding is folded into the
        tap offsets at weight-build time."""
        g = xp.jo
        key = f"bt_in{g}"
        if key not in weights or stride_t[1] > g:
            return None
        kh_, kw_ = kernel
        pt, pl = pad[0][0], pad[1][0]
        jo2, pad_blocks, taps = _bt_geometry(g, stride_t[1], kw_, pl)
        ow2 = (xp.ow + 2 * pl - kw_) // stride_t[1] + 1
        if jo2 == 0 or ow2 % jo2:
            return None
        d = xp.data
        blocks_needed = ow2 // jo2 + taps - 1
        if pad_blocks + d.shape[2] > blocks_needed:
            # over-padded conv (pl >= kw): surplus blocks would widen
            # the output; fall back to the dense path
            return None
        right = blocks_needed - (pad_blocks + d.shape[2])
        wpk = resolve_weight(weights[key], d.dtype)
        out = lax.conv_general_dilated(
            d, wpk, window_strides=(stride_t[0], 1),
            padding=((pt, pt), (pad_blocks, right)),
            dimension_numbers=_DIMENSION_NUMBERS,
            preferred_element_type=jnp.float32,
            precision=(lax.Precision.HIGHEST if d.dtype == jnp.float32
                       else lax.Precision.DEFAULT))
        out = _epilogue_packed(out, bias, jo2, d.dtype)
        n, oh2 = out.shape[0], out.shape[1]
        if pack_out and jo2 > 1:
            return PackedW(data=out, jo=jo2, ow=ow2)
        return out.reshape(n, oh2, ow2, out_channels)

    # static-int8 dispatch gate (see EngineConfig.int8_min_channels)
    int8_profitable = int8_conv_eligible(
        kernel[0] * kernel[1], in_channels,
        cfg.int8_min_channels, cfg.int8_pointwise)

    cat_inputs = op.has_param("si_cat_inputs")
    # snapshot at LOWERING time: measure_device_time re-traces apply
    # later, when the experiment script has already restored the flag
    force_split_carry_f32 = _PACKED_SPLIT_CARRY_F32

    def _apply_split_packed(weights, xs, bias):
        """Cat-split 1x1 over W-PACKED sources: slice the block-diagonal
        bt_in{g} weight per source along the logical input-channel axis
        and sum the packed partial convs — the whole packed region flows
        through the cat junction with no unpack/repack copies (measured
        2x ~0.1 ms relayouts per C3 block on yolov5s-640-b8, the
        'boundary copies' in docs/PERF.md). Returns None to fall back."""
        if not _PACKED_CAT_SPLIT:
            return None
        if tuple(kernel) != (1, 1) or stride_t != (1, 1):
            return None
        if not all(isinstance(x, PackedW) for x in xs):
            return None
        g, ow = xs[0].jo, xs[0].ow
        key = f"bt_in{g}"
        if key not in weights:
            return None
        if any(x.jo != g or x.ow != ow for x in xs[1:]):
            return None
        chans = [int(x.shape[-1]) for x in xs]
        if sum(chans) != in_channels:
            return None
        wfull = resolve_weight(weights[key], xs[0].data.dtype)
        # [1,1,g*ic,g*oc] block-diagonal, input index d*ic + c: expose
        # the logical channel axis so each source slices its rows
        w5 = wfull.reshape(1, 1, g, in_channels, g * out_channels)
        precision = (lax.Precision.HIGHEST
                     if xs[0].data.dtype == jnp.float32
                     else lax.Precision.DEFAULT)
        # partial sums materialize between the per-source conv kernels
        # (XLA cannot fuse two convs); carry them at the compute dtype
        # in bf16 mode to halve that traffic, like the dense split path
        # (each conv still accumulates its own K in f32 internally).
        # Measured: the f32 carry was fusion.8 = f32[8,160,80,128] at
        # 114 us/iter in the b8 headline profile (docs/PERF.md).
        # _PACKED_SPLIT_CARRY_F32 is the A/B control knob only.
        carry_f32 = (force_split_carry_f32
                     or xs[0].data.dtype == jnp.float32)
        acc, ofs = None, 0
        for i, (x, c) in enumerate(zip(xs, chans)):
            wi = lax.slice_in_dim(w5, ofs, ofs + c, axis=3)
            wi = wi.reshape(1, 1, g * c, g * out_channels)
            last = i == len(xs) - 1
            y = lax.conv_general_dilated(
                x.data, wi, window_strides=(1, 1), padding="VALID",
                dimension_numbers=_DIMENSION_NUMBERS,
                preferred_element_type=jnp.float32, precision=precision)
            if not carry_f32 and not last:
                y = y.astype(x.data.dtype)  # intermediate partial: bf16
            if acc is None:
                acc = y
            elif last:
                acc = acc.astype(jnp.float32) + y  # final sum in f32
            else:
                acc = acc + y
            ofs += c
        out = _epilogue_packed(acc, bias, g, xs[0].data.dtype)
        if pack_out and g > 1:
            return PackedW(data=out, jo=g, ow=ow)
        n, oh = out.shape[0], out.shape[1]
        return out.reshape(n, oh, ow, out_channels)

    def _apply_split(weights, xs):
        """conv1x1 over a (never materialized) channel concat: slice the
        weight per source at trace time and sum the partial convs (XLA
        fuses the adds into the conv epilogues).
        See ir/passes.fuse_cat_conv1x1."""
        w, bias = weights["weight"], weights.get("bias")
        act_scale_ = weights.get("act_scale")
        use_int8 = (act_scale_ is not None
                    and isinstance(w, QuantizedTensor)
                    and int8_conv_eligible(1, in_channels,
                                           cfg.int8_min_channels,
                                           cfg.int8_pointwise))
        if not use_int8:
            out = _apply_split_packed(weights, xs, bias)
            if out is not None:
                return out
        xs = [x.unpack() if isinstance(x, PackedW) else x for x in xs]
        if isinstance(w, QuantizedTensor):
            # IC slicing leaves the per-OUT-channel scales untouched
            parts, ofs = [], 0
            for x in xs:
                c = x.shape[-1]
                parts.append(QuantizedTensor(
                    data=lax.slice_in_dim(w.data, ofs, ofs + c, axis=2),
                    scale=w.scale, axis=w.axis))
                ofs += c
        else:
            parts, ofs = [], 0
            for x in xs:
                c = x.shape[-1]
                parts.append(lax.slice_in_dim(w, ofs, ofs + c, axis=2))
                ofs += c
        act_scale = act_scale_
        if use_int8:
            # static int8: every source shares the cat's per-tensor
            # scale, so the per-source s32 partial convs sum EXACTLY
            # (no f32 carry compromise) and dequantize once at the end
            acc = None
            for x, wi in zip(xs, parts):
                q = quantize_act(x, act_scale)
                y = lax.conv_general_dilated(
                    q, wi.data, window_strides=(1, 1), padding="VALID",
                    dimension_numbers=_DIMENSION_NUMBERS,
                    preferred_element_type=jnp.int32)
                acc = y if acc is None else acc + y
            return int8_epilogue(acc, act_scale, w.scale, bias, fused_act,
                                 xs[0].dtype)
        # partial sums materialize between the per-source conv kernels
        # (XLA cannot fuse two convs); carry them at the compute dtype
        # in bf16 mode to halve that traffic (each conv still
        # accumulates its own K in f32 internally)
        carry_f32 = xs[0].dtype == jnp.float32
        acc = None
        for i, (x, wi) in enumerate(zip(xs, parts)):
            wi = resolve_weight(wi, x.dtype)
            last = i == len(parts) - 1
            y = lax.conv_general_dilated(
                x, wi, window_strides=(1, 1), padding="VALID",
                dimension_numbers=_DIMENSION_NUMBERS,
                preferred_element_type=jnp.float32,
                precision=(lax.Precision.HIGHEST
                           if x.dtype == jnp.float32
                           else lax.Precision.DEFAULT))
            if not carry_f32 and not last:
                y = y.astype(x.dtype)  # intermediate partial: bf16
            if acc is None:
                acc = y
            elif last:
                acc = acc.astype(jnp.float32) + y  # final sum in f32
            else:
                acc = acc + y
        if bias is not None:
            acc = acc + bias.astype(jnp.float32)
        if fused_act is not None:
            from ..kernels.matmul import resolve_activation

            acc = resolve_activation(fused_act)(acc)
        return acc.astype(xs[0].dtype)

    def apply(weights, *xs):
        if cat_inputs and len(xs) > 1:
            return _apply_split(weights, list(xs))
        (x,) = xs
        w, bias = weights["weight"], weights.get("bias")
        # requant target for a marked int8 chain (ir/passes.FUSED_Q_OUT);
        # installed by Engine.calibrate alongside act_scale
        out_scale = weights.get("out_scale")
        if isinstance(x, QuantizedActivation):
            if not isinstance(w, QuantizedTensor):  # defensive
                x = x.dequantize()
            else:
                return conv2d_int8_static(
                    x, w, None, bias,
                    stride=stride_t, padding=pad, dilation=dilation_t,
                    groups=groups, padding_mode=padding_mode,
                    activation=fused_act, out_quant_scale=out_scale,
                    out_dtype=cfg.compute_jnp_dtype)
        if isinstance(x, PackedW):
            out = _apply_packed_in(weights, x, bias)
            if out is not None:
                return out
            x = x.unpack()
        elif s2d_eligible and x.ndim == 4:
            # stem: block the input by pure reshape and take the same
            # packed path (stem_pack_factor = the shared f choice)
            n, h, wd, c = x.shape
            f = stem_pack_factor(wd, kernel[1], stride_t[1], pad[1][0])
            if f is not None:
                xp = PackedW(data=x.reshape(n, h, wd // f, f * c),
                             jo=f, ow=wd)
                out = _apply_packed_in(weights, xp, bias)
                if out is not None:
                    return out
        act_scale = weights.get("act_scale")
        if (act_scale is not None and isinstance(w, QuantizedTensor)
                and int8_profitable):
            return conv2d_int8_static(
                x, w, act_scale, bias,
                stride=stride_t, padding=pad, dilation=dilation_t,
                groups=groups, padding_mode=padding_mode,
                activation=fused_act, out_quant_scale=out_scale)
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
            activation=fused_act, out_quant_scale=out_scale)

    # flops at batch 1: 2 * OH*OW * OC * (IC/g) * KH*KW; the executor
    # multiplies the per-pixel term by OH*OW after shape inference
    per_pixel = 2 * out_channels * (in_channels // groups) * kernel[0] * kernel[1]

    # stem packs are not quantized: stems hold <0.1% of model weight
    # bytes, and the packed layout interleaves output pixels with
    # channels (per-channel scales would not broadcast)
    return OpImpl(
        name=op.name, type=op.type, apply=apply, weights=weights,
        quantizable={"weight": 3},  # HWIO: out channels on axis 3
        shard_hints={"weight": (None, None, None, "model"),
                     "bias": ("model",)},
        flops_per_pixel=per_pixel,
        fp32_keys=("act_scale", "out_scale"),  # quant scales never downcast
        act_quant=True,
        # per-channel act scales fold into HWIO axis 2 (input channels);
        # only when the int8 branch is STATICALLY guaranteed — a folded
        # weight is wrong on every other path (packed/fp/cat-split)
        act_fold=((-1, 2) if (groups == 1 and not cat_inputs
                              and not pack_in and not s2d_eligible
                              and int8_profitable) else None),
        q_out_consumer=q_consumer,
        # stem convs advertise their W-pack geometry so the executor can
        # stage the graph INPUT pre-packed (executor.stem_pack_factor):
        # the reshape is free on the host, and XLA's input relayout +
        # pack copies (%copy.4/%copy.5 in the yolov5s trace) disappear
        stem_pack_info=((kernel[1], stride_t[1], padding[1])
                        if s2d_eligible else None),
    )
