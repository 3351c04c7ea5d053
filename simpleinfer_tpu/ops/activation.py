"""Elementwise activation lowerings.

Parity with the reference activation layers (/root/reference/src/layer/):
relu.cpp (cwiseMax 0), sigmoid.cpp (.sigmoid()), silu.cpp
(x / (1 + exp(-x))), hard_sigmoid.cpp (clip(x/6 + 0.5, 0, 1), alpha=1/6
beta=0.5 fixed at :18-22), hard_swish.cpp (x * clip(x/6 + 0.5, 0, 1)).
All are single VPU ops that XLA fuses into neighboring convs.
"""
from __future__ import annotations

import jax.numpy as jnp

from .registry import OpImpl, register_op


def relu(x):
    return jnp.maximum(x, 0)


def sigmoid(x):
    return jax_sigmoid(x)


def jax_sigmoid(x):
    # jax.nn.sigmoid = stable logistic; matches Eigen's .sigmoid()
    import jax
    return jax.nn.sigmoid(x)


def silu(x):
    return x * jax_sigmoid(x)


def hard_sigmoid(x):
    # alpha = 1/6, beta = 0.5 (hard_sigmoid.cpp:18-22)
    return jnp.clip(x * (1.0 / 6.0) + 0.5, 0.0, 1.0)


def hard_swish(x):
    return x * hard_sigmoid(x)


def _elementwise(pnnx_type, fn):
    @register_op(pnnx_type)
    def lower(op, cfg, _fn=fn):
        def apply(weights, x):
            return _fn(x)
        return OpImpl(name=op.name, type=op.type, apply=apply)
    return lower


_elementwise("nn.ReLU", relu)
_elementwise("nn.Sigmoid", sigmoid)
_elementwise("nn.SiLU", silu)
_elementwise("nn.Hardsigmoid", hard_sigmoid)
_elementwise("nn.Hardswish", hard_swish)
_elementwise("F.relu", relu)
_elementwise("F.sigmoid", sigmoid)
_elementwise("F.silu", silu)
_elementwise("F.hardsigmoid", hard_sigmoid)
_elementwise("F.hardswish", hard_swish)


def relu6(x):
    # mobilenet-family clip activation (superset: reference has no ReLU6)
    return jnp.clip(x, 0.0, 6.0)


def mish(x):
    # x * tanh(softplus(x)) — yolov4-era activation
    import jax
    return x * jnp.tanh(jax.nn.softplus(x))


_elementwise("nn.ReLU6", relu6)
_elementwise("F.relu6", relu6)
_elementwise("nn.Mish", mish)
_elementwise("F.mish", mish)
