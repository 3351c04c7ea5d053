"""Shape/layout lowerings: torch.cat, torch.flatten, nn.Upsample.

Operands of rank 4 are stored NHWC (the engine permutes declared NCHW
shapes at load, mirroring /root/reference/src/engine_impl.cpp:182-189), so
logical NCHW dim arguments must be remapped to physical NHWC dims:

- Cat (/root/reference/src/layer/cat.cpp:84-91): dim 1->3, 2->1, 3->2.
- Flatten (/root/reference/src/layer/flatten.cpp:71-79): permute NHWC back
  to NCHW first so the flat element order matches PyTorch, then reshape.
- Upsample (/root/reference/src/layer/upsample.cpp): nearest only;
  source index = trunc(out_coord * (1/scale)) clamped (the Nearest4D
  functor, :76-99). Implemented as a static gather (jnp.take), which XLA
  fuses; also supports the `size` param the reference TODOs (:40).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .registry import OpImpl, register_op, require_param
from ..ir.graph import PARAM_INT

_NCHW_TO_NHWC_DIM = {0: 0, 1: 3, 2: 1, 3: 2}


@register_op("torch.cat")
def lower_cat(op, cfg):
    dim = require_param(op, "dim", PARAM_INT).i

    def apply(weights, *inputs):
        d = dim
        rank = inputs[0].ndim
        if d < 0:
            d += rank
        if rank == 4:
            d = _NCHW_TO_NHWC_DIM[d]
        return jnp.concatenate(inputs, axis=d)

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("torch.flatten")
def lower_flatten(op, cfg):
    start_dim = require_param(op, "start_dim", PARAM_INT).i
    end_dim = require_param(op, "end_dim", PARAM_INT).i

    def apply(weights, x):
        rank = x.ndim
        s = start_dim + rank if start_dim < 0 else start_dim
        e = end_dim + rank if end_dim < 0 else end_dim
        if rank == 4:
            # match PyTorch's NCHW flat order (flatten.cpp:71-79)
            x = jnp.transpose(x, (0, 3, 1, 2))
        shape = list(x.shape)
        new_shape = shape[:s] + [int(np.prod(shape[s:e + 1]))] + shape[e + 1:]
        return jnp.reshape(x, new_shape)

    return OpImpl(name=op.name, type=op.type, apply=apply)


def upsample_nearest(x, scale=None, size=None):
    """NHWC nearest upsample; index = trunc(out * 1/scale), clamped."""
    n, h, w, c = x.shape
    if size is not None:
        oh, ow = size
        sh_inv, sw_inv = h / oh, w / ow
    else:
        sh, sw = scale
        oh, ow = int(h * sh), int(w * sw)
        sh_inv, sw_inv = 1.0 / sh, 1.0 / sw
    # static index maps, exactly the reference's float-trunc-clamp
    h_idx = np.clip((np.arange(oh) * sh_inv).astype(np.int32), 0, h - 1)
    w_idx = np.clip((np.arange(ow) * sw_inv).astype(np.int32), 0, w - 1)
    x = jnp.take(x, jnp.asarray(h_idx), axis=1)
    x = jnp.take(x, jnp.asarray(w_idx), axis=2)
    return x


@register_op("nn.Upsample")
def lower_upsample(op, cfg):
    mode = require_param(op, "mode").s
    if mode != "nearest":
        raise ValueError(f"Upsample {op.name}: unsupported mode {mode!r}")
    scale = size = None
    if op.has_param("scale_factor", 6):
        scale = tuple(op.params["scale_factor"].af)
    elif op.has_param("scale_factor", 3):
        scale = (op.params["scale_factor"].f,) * 2
    elif op.has_param("size", 5):
        size = tuple(op.params["size"].ai)
    elif op.has_param("size", 2):
        size = (op.params["size"].i,) * 2
    else:
        raise ValueError(f"Upsample {op.name}: need scale_factor or size")

    def apply(weights, x):
        return upsample_nearest(x, scale=scale, size=size)

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("nn.UpsamplingNearest2d")
def lower_upsampling_nearest_2d(op, cfg):
    scale = size = None
    if op.has_param("scale_factor", 6):
        scale = tuple(op.params["scale_factor"].af)
    elif op.has_param("size", 5):
        size = tuple(op.params["size"].ai)
    else:
        raise ValueError(f"UpsamplingNearest2d {op.name}: need scale or size")

    def apply(weights, x):
        return upsample_nearest(x, scale=scale, size=size)

    return OpImpl(name=op.name, type=op.type, apply=apply)
