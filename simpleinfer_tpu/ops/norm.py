"""nn.BatchNorm2d lowering (inference form).

Parity with /root/reference/src/layer/batch_norm_2d.cpp:116-134:
``y = (x - running_mean) * rsqrt(running_var + eps) * gamma + beta``
broadcast over the channel (last, NHWC) dim. The four per-channel vectors
are pre-folded at load into a single scale+shift pair — one fused
multiply-add in the XLA graph, which the compiler then folds into the
preceding conv's epilogue.
"""
from __future__ import annotations

import numpy as np

from .registry import OpImpl, register_op, require_attr, require_param
from ..ir.graph import PARAM_BOOL, PARAM_FLOAT, PARAM_INT


@register_op("nn.BatchNorm2d")
def lower_batch_norm_2d(op, cfg):
    eps = require_param(op, "eps", PARAM_FLOAT).f
    num_features = require_param(op, "num_features", PARAM_INT).i
    require_param(op, "affine", PARAM_BOOL)

    mean = require_attr(op, "running_mean", 1).array().astype(np.float64)
    var = require_attr(op, "running_var", 1).array().astype(np.float64)
    gamma = require_attr(op, "weight", 1).array().astype(np.float64)
    beta = require_attr(op, "bias", 1).array().astype(np.float64)
    for name, v in (("running_mean", mean), ("running_var", var),
                    ("weight", gamma), ("bias", beta)):
        if v.shape != (num_features,):
            raise ValueError(f"BatchNorm2d {op.name}: {name} shape {v.shape} "
                             f"!= ({num_features},)")

    # fold to y = x * scale + shift (in f64 for fidelity, stored f32)
    scale = gamma / np.sqrt(var + eps)
    shift = beta - mean * scale
    weights = {"scale": scale.astype(np.float32),
               "shift": shift.astype(np.float32)}

    def apply(weights, x):
        return (x * weights["scale"].astype(x.dtype)
                + weights["shift"].astype(x.dtype))

    return OpImpl(name=op.name, type=op.type, apply=apply, weights=weights)
