"""nn.Linear lowering.

Parity with the reference Linear layer (/root/reference/src/layer/
linear.cpp): weight stays [out, in] (the reference contracts input dim 1
with weight dim 1, linear.cpp Forward), bias required when bias=True.
Lowered to an einsum over the last input dim so leading batch dims are
free; XLA maps it onto the MXU directly.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax
import numpy as np

from ..quant.tensor import resolve_weight
from .registry import OpImpl, register_op, require_attr, require_param
from ..ir.graph import PARAM_BOOL, PARAM_INT


def linear(x, w, bias=None, accum_dtype=jnp.float32, activation=None):
    """x [..., in] @ w [in, out] (or QuantizedTensor) + bias [out].

    The pnnx weight is [out, in]; the lowering transposes it once at load
    so both the einsum and the int8 kernel stream it in [K, N] order.
    """
    w = resolve_weight(w, x.dtype)

    precision = (lax.Precision.HIGHEST if x.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    out = jnp.einsum("...i,io->...o", x, w,
                     preferred_element_type=accum_dtype,
                     precision=precision)
    if bias is not None:
        out = out + bias.astype(accum_dtype)
    if activation is not None:
        from ..kernels.matmul import resolve_activation

        out = resolve_activation(activation)(out)
    return out.astype(x.dtype)


def _linear_act_fold(op):
    """(act_axis, weight_ic_axis) for per-channel activation scales
    (OpImpl.act_fold). The contracted dim is the logical last dim; for
    rank-4 inputs the physical layout is NHWC of the logical NCHW shape
    (ops/shape.py), so logical dim 3 sits at physical axis 2. Unknown
    ranks get no per-channel support (per-tensor fallback)."""
    shape = op.inputs[0].shape if op.inputs else None
    if not shape:
        return None
    rank = len(shape)
    if rank == 4:
        return (2, 0)
    if rank in (2, 3):
        return (-1, 0)
    return None


@register_op("nn.Linear")
def lower_linear(op, cfg):
    in_features = require_param(op, "in_features", PARAM_INT).i
    out_features = require_param(op, "out_features", PARAM_INT).i
    use_bias = require_param(op, "bias", PARAM_BOOL).b

    w = require_attr(op, "weight", 1).array()
    if list(w.shape) != [out_features, in_features]:
        raise ValueError(f"Linear {op.name}: weight shape {w.shape} does not "
                         f"match params")
    # [out, in] -> [in, out] at load (see `linear`)
    weights = {"weight": np.ascontiguousarray(w.T).astype(np.float32)}
    if use_bias:
        weights["bias"] = require_attr(op, "bias", 1).array().astype(np.float32)

    fused_act = (op.params["si_fused_act"].s
                 if op.has_param("si_fused_act") else None)
    # opt-in, like conv (see EngineConfig.use_pallas)
    allow_pallas = bool(cfg.use_pallas) and cfg.mesh is None

    def apply(weights, x):
        from ..kernels.matmul import pallas_supported
        from ..quant.tensor import QuantizedTensor, quantize_act

        phys4 = x.ndim == 4
        if phys4:
            # rank-4 operands are stored physically NHWC of their
            # LOGICAL shape (ops/shape.py); Linear contracts the logical
            # last dim (e.g. ConvNeXt channels-last MLPs on [N,H,W,C]),
            # so round-trip through the logical layout
            x = jnp.transpose(x, (0, 3, 1, 2))

        def back(y):
            return jnp.transpose(y, (0, 2, 3, 1)) if phys4 else y

        w, bias = weights["weight"], weights.get("bias")
        act_scale = weights.get("act_scale")
        if act_scale is not None and isinstance(w, QuantizedTensor):
            # static full int8: s8 x s8 -> s32 dot on the MXU int8 path,
            # dequant by act_scale * w_scale[out] in the epilogue
            from .conv import int8_epilogue

            q = quantize_act(x, act_scale)
            lead = x.shape[:-1]
            m = int(np.prod(lead)) if lead else 1
            # rank-1 act_scale = per-channel, already folded into the
            # weight (engine._install_act_scales): dequant by w.scale
            epi_scale = (w.scale if getattr(act_scale, "ndim", 0)
                         else act_scale * w.scale)
            if (allow_pallas and pallas_supported()
                    and min(m, in_features, out_features) >= 256):
                # native s8xs8 Pallas GEMM: measured 264 vs 218 T/s
                # XLA-s8 at 4096^3 (docs/PERF.md); requant fused in the
                # kernel epilogue. Gated to MXU-sized operands.
                from ..kernels.matmul import matmul_s8s8

                out = matmul_s8s8(q.reshape(-1, in_features), w.data,
                                  epi_scale, bias, fused_act,
                                  out_dtype=x.dtype)
                return back(out.reshape(*lead, out_features))
            acc = jnp.einsum("...i,io->...o", q, w.data,
                             preferred_element_type=jnp.int32)
            return back(int8_epilogue(acc, act_scale, w.scale, bias,
                                      fused_act, x.dtype))
        from ..quant.tensor import Quantized4Tensor

        if isinstance(w, Quantized4Tensor) and pallas_supported():
            # int4w is AUTO (no use_pallas opt-in): the whole point of
            # the format is the packed-nibble streaming kernel — the
            # XLA fallback would dense-dequantize per call (measured
            # 15x slower than the kernel at decode shapes)
            from ..kernels.matmul import matmul_int4w

            lead = x.shape[:-1]
            out = matmul_int4w(x.reshape(-1, in_features), w, bias,
                               fused_act, out_dtype=x.dtype)
            return back(out.reshape(*lead, out_features))
        if (allow_pallas and isinstance(w, QuantizedTensor)
                and pallas_supported()):
            from ..kernels.matmul import matmul_int8w

            lead = x.shape[:-1]
            out = matmul_int8w(x.reshape(-1, in_features), w.data, w.scale,
                               bias, fused_act)
            return back(out.reshape(*lead, out_features))
        return back(linear(x, w, bias, activation=fused_act))

    return OpImpl(
        name=op.name, type=op.type, apply=apply, weights=weights,
        quantizable={"weight": 1},  # [in, out]: out channels on axis 1
        shard_hints={"weight": (None, "model"), "bias": ("model",)},
        flops_per_item=2 * in_features * out_features,
        fp32_keys=("act_scale",),
        act_quant=True,
        act_fold=_linear_act_fold(op),
    )
