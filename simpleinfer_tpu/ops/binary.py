"""BinaryOp / UnaryOp lowerings (ncnn op-code convention).

The reference BinaryOp layer implements only add (0) and mul (2) with two
tensor inputs (/root/reference/src/layer/binary_op.cpp:17-29) — the subset
YOLOv5/ResNet skip connections need — and has no UnaryOp layer at all,
although its own expression expander can emit every code
(expand_expression.cpp:140-230). Here the full table is implemented;
broadcasting follows NumPy semantics, a superset of the reference's
per-dim broadcast factors (binary_op.cpp:62-91).
"""
from __future__ import annotations

import jax.numpy as jnp

from .registry import OpImpl, register_op, require_param
from ..ir.graph import PARAM_INT

# ncnn BinaryOp op codes (expand_expression.cpp:190-200)
_BINARY_FNS = {
    0: jnp.add,
    1: jnp.subtract,
    2: jnp.multiply,
    3: jnp.divide,
    4: jnp.maximum,
    5: jnp.minimum,
    6: jnp.power,
    7: lambda a, b: jnp.subtract(b, a),   # rsub (scalar first)
    8: lambda a, b: jnp.divide(b, a),     # rdiv
    9: lambda a, b: jnp.power(b, a),      # rpow
    10: jnp.arctan2,
    11: lambda a, b: jnp.arctan2(b, a),   # ratan2
}

# ncnn UnaryOp op codes (expand_expression.cpp:140-160)
_UNARY_FNS = {
    0: jnp.abs,
    1: jnp.negative,
    2: jnp.floor,
    3: jnp.ceil,
    4: jnp.square,
    5: jnp.sqrt,
    6: lambda x: jnp.reciprocal(jnp.sqrt(x)),
    7: jnp.exp,
    8: jnp.log,
    9: jnp.sin,
    10: jnp.cos,
    11: jnp.tan,
    12: jnp.arcsin,
    13: jnp.arccos,
    14: jnp.arctan,
    15: jnp.reciprocal,
    16: jnp.tanh,
    17: jnp.log10,
}


@register_op("BinaryOp")
def lower_binary_op(op, cfg):
    code = require_param(op, "0", PARAM_INT).i
    fn = _BINARY_FNS.get(code)
    if fn is None:
        raise ValueError(f"BinaryOp {op.name}: unsupported op code {code}")

    # W-packed relay (ops/conv.py PackedW): elementwise ops act on the
    # packed payload directly; stay packed when the region pass marked
    # this op pack_out, else unpack for dense consumers
    pack_out = op.has_param("si_pack_out")

    def _repack(result, inputs):
        from .conv import PackedW

        packed = [x for x in inputs if isinstance(x, PackedW)]
        if not packed:
            return result
        pw = PackedW(data=result, jo=packed[0].jo, ow=packed[0].ow)
        return pw if pack_out else pw.unpack()

    def _payload(x):
        from .conv import PackedW

        return x.data if isinstance(x, PackedW) else x

    def _aligned(a, b):
        from .conv import PackedW

        return (isinstance(a, PackedW) and isinstance(b, PackedW)
                and a.jo == b.jo and a.ow == b.ow)

    with_scalar = op.has_param("1") and op.params["1"].i == 1
    if with_scalar:
        scalar = float(op.params["2"].f)
        # The scalar always binds as the SECOND operand; reversed codes
        # (7-9, 11) have the swap built into their lambda, so e.g. code 7
        # (rsub, from expr "sub(1.0,@0)") computes scalar - x.
        def apply(weights, x, _fn=fn, _s=scalar):
            from .conv import PackedW

            if isinstance(x, PackedW):
                return _repack(_fn(x.data, jnp.asarray(_s, x.data.dtype)),
                               [x])
            return _fn(x, jnp.asarray(_s, x.dtype))
    else:
        def apply(weights, a, b, _fn=fn):
            from .conv import PackedW

            if _aligned(a, b):
                return _repack(_fn(a.data, b.data), [a, b])
            if isinstance(a, PackedW):
                a = a.unpack()
            if isinstance(b, PackedW):
                b = b.unpack()
            return _fn(a, b)

    return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("UnaryOp")
def lower_unary_op(op, cfg):
    code = require_param(op, "0", PARAM_INT).i
    fn = _UNARY_FNS.get(code)
    if fn is None:
        raise ValueError(f"UnaryOp {op.name}: unsupported op code {code}")

    def apply(weights, x, _fn=fn):
        return _fn(x)

    return OpImpl(name=op.name, type=op.type, apply=apply)
