"""Operator lowerings: pnnx type string -> OpImpl (weights + jax fn).

Importing this package registers every lowering (the analog of the
DEFINE_LAYER_REGISTRY static registrations in the reference,
/root/reference/src/layer_registry.cpp:33-49).
"""
from . import (  # noqa: F401
    activation,
    attention,
    binary,
    c3,
    conv,
    extra,
    functional,
    linear,
    norm,
    pool,
    shape,
    yolo,
)
from .registry import (
    OpImpl,
    UnsupportedOpError,
    get_lowering,
    lower_operator,
    register_op,
    registered_ops,
)

__all__ = [
    "OpImpl",
    "UnsupportedOpError",
    "get_lowering",
    "lower_operator",
    "register_op",
    "registered_ops",
]
