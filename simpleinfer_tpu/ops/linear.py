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


def linear(x, w, bias=None, accum_dtype=jnp.float32):
    """x [..., in] @ w [out, in] (or QuantizedTensor) + bias [out]."""
    w = resolve_weight(w, x.dtype)

    precision = (lax.Precision.HIGHEST if x.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    out = jnp.einsum("...i,oi->...o", x, w,
                     preferred_element_type=accum_dtype,
                     precision=precision)
    if bias is not None:
        out = out + bias.astype(accum_dtype)
    return out.astype(x.dtype)


@register_op("nn.Linear")
def lower_linear(op, cfg):
    in_features = require_param(op, "in_features", PARAM_INT).i
    out_features = require_param(op, "out_features", PARAM_INT).i
    use_bias = require_param(op, "bias", PARAM_BOOL).b

    w = require_attr(op, "weight", 1).array()
    if list(w.shape) != [out_features, in_features]:
        raise ValueError(f"Linear {op.name}: weight shape {w.shape} does not "
                         f"match params")
    weights = {"weight": w.astype(np.float32)}
    if use_bias:
        weights["bias"] = require_attr(op, "bias", 1).array().astype(np.float32)

    def apply(weights, x):
        return linear(x, weights["weight"], weights.get("bias"))

    return OpImpl(
        name=op.name, type=op.type, apply=apply, weights=weights,
        quantizable={"weight": 0},  # [out, in]: out channels on axis 0
        shard_hints={"weight": ("model", None), "bias": ("model",)},
        flops_per_item=2 * in_features * out_features,
    )
