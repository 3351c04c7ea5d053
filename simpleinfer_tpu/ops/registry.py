"""Operator lowering registry.

The TPU-native analog of the reference's layer creator registry
(/root/reference/src/layer_registry.cpp:33-57): pnnx type strings map to
*lowering functions* instead of C++ object factories. A lowering inspects
a pnnx Operator at load time (the analog of Layer::Init), performs weight
layout transforms (e.g. OIHW->HWIO), and returns an OpImpl — a pure
function plus its weight pytree — which the executor stitches into one
jit-compiled XLA program (the analog of the CGraph pipeline,
engine_impl.cpp:336-437, collapsed into compilation).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from ..ir.graph import Operator


@dataclass
class OpImpl:
    """A lowered operator: weights + a pure apply function.

    apply(weights_dict, *input_arrays) -> output array (or tuple when
    n_outputs > 1). Must be traceable by jax (static shapes only).
    """

    name: str
    type: str
    apply: Callable
    weights: dict = field(default_factory=dict)
    n_outputs: int = 1
    # weight key -> axis holding output channels, for per-channel
    # weight-only int8 quantization (quant/tensor.py)
    quantizable: dict = field(default_factory=dict)
    # weight key -> PartitionSpec-style tuple for tensor-parallel sharding
    # (None entries = replicated dims); consumed by parallel/mesh.py
    shard_hints: dict = field(default_factory=dict)
    # estimated flops per forward at batch=1 (roofline accounting):
    # flops_per_item is a complete per-batch-item count (linear), while
    # flops_per_pixel is multiplied by the op's output H*W once shapes
    # are inferred (conv — spatial extent unknown at lowering time)
    flops_per_item: int = 0
    flops_per_pixel: int = 0
    # weight keys that must STAY float32 even when the engine casts
    # weights to a lower compute dtype (e.g. YOLO grids: box coordinates
    # lose pixels in bf16)
    fp32_keys: tuple = ()
    # op can consume int8-quantized activations (static quant): the
    # calibration observer (quant/calibrate.py) records its input
    # activation range, and Engine.calibrate installs an `act_scale`
    # weight entry that switches apply onto the s8 path
    act_quant: bool = False
    # int8-chain producer: name of the consumer op whose calibrated
    # act_scale this op requantizes its output to (Engine.calibrate
    # installs `out_scale` from it); None = not a chain producer
    q_out_consumer: object = None
    # per-CHANNEL activation quantization support (EngineConfig.
    # act_per_channel): (act_axis, weight_ic_axis) where act_axis is the
    # channel axis of the PHYSICAL activation the calibration observer
    # sees, and weight_ic_axis is the weight axis the per-channel scales
    # are folded into at install time (engine._install_act_scales folds
    # w·s[ic] and requantizes, so the s8 epilogue dequant stays a single
    # per-OUT-channel vector). None = per-tensor scales only.
    act_fold: object = None
    # stem conv W-pack geometry (kernel_w, stride_w, pad_l) when the op
    # can consume a W-packed graph input (see executor.stem_pack_factor)
    stem_pack_info: object = None
    # terminal ops may emit their output in a packed layout whose
    # row-major bytes equal the logical output's: value = the anchor
    # fold factor `na`, and the host reshapes [N,R,na*c] -> [N,R*na,c]
    # for free at extract (Program.output_transforms)
    host_output_retile: object = None
    # metadata a KV-cache decode walk needs that the apply closure hides
    # (attention head geometry — zoo/generate.CachedDecoder); None for
    # ops with no decode-specific form
    decode_info: object = None


class UnsupportedOpError(Exception):
    """Raised when a graph references an op type with no lowering."""


_LOWERINGS: dict[str, Callable] = {}


def register_op(pnnx_type: str):
    def deco(fn: Callable):
        _LOWERINGS[pnnx_type] = fn
        return fn
    return deco


def get_lowering(pnnx_type: str) -> Callable:
    fn = _LOWERINGS.get(pnnx_type)
    if fn is None:
        raise UnsupportedOpError(
            f"no lowering registered for op type {pnnx_type!r}; "
            f"known: {sorted(_LOWERINGS)}")
    return fn


def registered_ops() -> list[str]:
    return sorted(_LOWERINGS)


def lower_operator(op: Operator, cfg) -> OpImpl:
    return get_lowering(op.type)(op, cfg)


# ---- param helpers (analog of CheckParam/CheckAttr strictness,
#      /root/reference/src/pnnx/pnnx_helper.cpp:5-39) --------------------
def require_param(op: Operator, key: str, ptype: Optional[int] = None):
    if not op.has_param(key, ptype):
        raise ValueError(
            f"{op.type} {op.name!r}: missing/mistyped param {key!r} "
            f"(expected type {ptype})")
    return op.params[key]


def require_attr(op: Operator, key: str, atype: Optional[int] = None):
    if not op.has_attr(key, atype):
        raise ValueError(
            f"{op.type} {op.name!r}: missing/mistyped attr {key!r}")
    return op.attrs[key]
