"""Normalization lowerings (inference form).

BatchNorm2d has parity with
/root/reference/src/layer/batch_norm_2d.cpp:116-134:
``y = (x - running_mean) * rsqrt(running_var + eps) * gamma + beta``
broadcast over the channel (last, NHWC) dim. The four per-channel vectors
are pre-folded at load into a single scale+shift pair — one fused
multiply-add in the XLA graph, which the compiler then folds into the
preceding conv's epilogue.

LayerNorm/GroupNorm/InstanceNorm2d are superset ops (the reference's
registry stops at BatchNorm2d, /root/reference/src/layer_registry.cpp:
33-49) — they appear in modern CNN/ConvNeXt-style pnnx exports. All are
batch-statistics-free at inference, so they lower to pure jnp
reductions XLA fuses; statistics accumulate in f32 even under bf16
compute (a bf16 mean over thousands of elements loses ~2 decimal
digits).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .registry import OpImpl, register_op, require_attr, require_param
from ..ir.graph import PARAM_AINT, PARAM_BOOL, PARAM_FLOAT, PARAM_INT


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


def _normalize(x, axes, eps):
    """(x - mean) * rsqrt(var + eps) over `axes`, stats in f32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    return ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


def _affine_weights(op, affine, expect_shape):
    if not affine:
        return {}
    gamma = require_attr(op, "weight").array().astype(np.float32)
    beta = require_attr(op, "bias").array().astype(np.float32)
    for name, v in (("weight", gamma), ("bias", beta)):
        if v.shape != expect_shape:
            raise ValueError(f"{op.type} {op.name}: {name} shape "
                             f"{v.shape} != {expect_shape}")
    return {"gamma": gamma, "beta": beta}


@register_op("nn.LayerNorm")
def lower_layer_norm(op, cfg):
    """Normalize over the trailing `normalized_shape` LOGICAL dims.
    Rank-4 operands are physically NHWC, so the input round-trips
    through NCHW; other ranks (transformer-style [N,T,C]) apply
    directly."""
    shape = tuple(require_param(op, "normalized_shape", PARAM_AINT).ai)
    eps = require_param(op, "eps", PARAM_FLOAT).f
    affine = require_param(op, "elementwise_affine", PARAM_BOOL).b
    weights = _affine_weights(op, affine, shape)
    nd = len(shape)

    def apply(weights, x):
        phys4 = x.ndim == 4
        if phys4:
            x = jnp.transpose(x, (0, 3, 1, 2))
        if tuple(x.shape[-nd:]) != shape:
            raise ValueError(
                f"LayerNorm {op.name}: input trailing dims "
                f"{tuple(x.shape[-nd:])} != normalized_shape {shape}")
        y = _normalize(x, tuple(range(x.ndim - nd, x.ndim)), eps)
        if affine:
            y = (y * weights["gamma"].astype(y.dtype)
                 + weights["beta"].astype(y.dtype))
        if phys4:
            y = jnp.transpose(y, (0, 2, 3, 1))
        return y

    return OpImpl(name=op.name, type=op.type, apply=apply, weights=weights)


@register_op("nn.GroupNorm")
def lower_group_norm(op, cfg):
    groups = require_param(op, "num_groups", PARAM_INT).i
    channels = require_param(op, "num_channels", PARAM_INT).i
    eps = require_param(op, "eps", PARAM_FLOAT).f
    affine = require_param(op, "affine", PARAM_BOOL).b
    if channels % groups:
        raise ValueError(f"GroupNorm {op.name}: num_channels {channels} "
                         f"not divisible by num_groups {groups}")
    weights = _affine_weights(op, affine, (channels,))

    def apply(weights, x):
        # NHWC: group the (last) channel dim, reduce spatial + in-group
        n = x.shape[0]
        spatial = x.shape[1:-1]
        xg = x.reshape((n,) + spatial + (groups, channels // groups))
        axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        y = _normalize(xg, axes, eps).reshape(x.shape)
        if affine:
            y = (y * weights["gamma"].astype(y.dtype)
                 + weights["beta"].astype(y.dtype))
        return y

    return OpImpl(name=op.name, type=op.type, apply=apply, weights=weights)


@register_op("nn.InstanceNorm2d")
def lower_instance_norm_2d(op, cfg):
    features = require_param(op, "num_features", PARAM_INT).i
    eps = require_param(op, "eps", PARAM_FLOAT).f
    affine = require_param(op, "affine", PARAM_BOOL).b
    weights = _affine_weights(op, affine, (features,))

    # track_running_stats=True at eval uses the RUNNING statistics, not
    # per-instance ones — exactly BatchNorm semantics; fold to
    # scale+shift like lower_batch_norm_2d
    if op.has_attr("running_mean"):
        mean = require_attr(op, "running_mean").array().astype(np.float64)
        var = require_attr(op, "running_var").array().astype(np.float64)
        if mean.shape != (features,) or var.shape != (features,):
            raise ValueError(
                f"InstanceNorm2d {op.name}: running stats shapes "
                f"{mean.shape}/{var.shape} != ({features},)")
        gamma = (weights["gamma"].astype(np.float64) if affine
                 else np.ones(features))
        beta = (weights["beta"].astype(np.float64) if affine
                else np.zeros(features))
        scale = gamma / np.sqrt(var + eps)
        shift = beta - mean * scale
        weights = {"scale": scale.astype(np.float32),
                   "shift": shift.astype(np.float32)}

        def apply(weights, x):
            return (x * weights["scale"].astype(x.dtype)
                    + weights["shift"].astype(x.dtype))

        return OpImpl(name=op.name, type=op.type, apply=apply,
                      weights=weights)

    def apply(weights, x):
        # per (N, C) over H, W — NHWC reduce dims (1, 2)
        y = _normalize(x, (1, 2), eps)
        if affine:
            y = (y * weights["gamma"].astype(y.dtype)
                 + weights["beta"].astype(y.dtype))
        return y

    return OpImpl(name=op.name, type=op.type, apply=apply, weights=weights)


@register_op("nn.RMSNorm")
def lower_rms_norm(op, cfg):
    """Root-mean-square norm (llama-style, superset op): no mean
    subtraction, optional gamma, over the trailing `normalized_shape`
    logical dims. Statistics in f32 like the other norms."""
    shape = tuple(require_param(op, "normalized_shape", PARAM_AINT).ai)
    eps = require_param(op, "eps", PARAM_FLOAT).f
    affine = (op.params["elementwise_affine"].b
              if op.has_param("elementwise_affine", PARAM_BOOL)
              else op.has_attr("weight"))
    nd = len(shape)
    weights = {}
    if affine:
        g = require_attr(op, "weight").array()
        if tuple(g.shape) != shape:
            raise ValueError(f"RMSNorm {op.name}: weight shape {g.shape} "
                             f"!= normalized_shape {shape}")
        weights["gamma"] = g.astype(np.float32)

    def apply(weights, x):
        phys4 = x.ndim == 4
        if phys4:
            x = jnp.transpose(x, (0, 3, 1, 2))
        if tuple(x.shape[-nd:]) != shape:
            raise ValueError(
                f"RMSNorm {op.name}: input trailing dims "
                f"{tuple(x.shape[-nd:])} != normalized_shape {shape}")
        axes = tuple(range(x.ndim - nd, x.ndim))
        ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes,
                      keepdims=True)
        y = (x.astype(jnp.float32) * jax.lax.rsqrt(ms + eps)).astype(x.dtype)
        if affine:
            y = y * weights["gamma"].astype(y.dtype)
        if phys4:
            y = jnp.transpose(y, (0, 2, 3, 1))
        return y

    return OpImpl(name=op.name, type=op.type, apply=apply, weights=weights)
