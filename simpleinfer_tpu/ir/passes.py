"""Load-time graph rewrite passes (inference fusions).

The reference has exactly one graph pass — expand_expression
(SURVEY.md §2.2 #12) — and leaves op fusion to nobody (each layer runs
standalone; conv+bn+relu is three pipeline nodes). Here two classic
inference fusions run on the IR before lowering:

- fuse_conv_bn: Conv2d (bias optional) followed by BatchNorm2d folds the
  BN affine into the conv weights/bias (f64 arithmetic at load). Besides
  saving an op, this is REQUIRED for int8 weight-only accuracy: quantizing
  pre-BN weights and applying BN after dequant would double the effective
  quantization noise; folding first keeps per-channel scales meaningful.
  (BASELINE.json config 4: "fused conv+bn+relu".)
- fuse_conv_activation: Conv2d followed by ReLU/SiLU/Hardswish/... tags
  the conv with a `si_fused_act` param and deletes the activation op, so
  the lowering can run the activation inside the conv epilogue (the
  Pallas int8 kernel applies it on the VPU before writeback; the lax path
  applies it inline and XLA fuses).

Both passes only fire when the intermediate operand has exactly one
consumer and is not a graph output.
"""
from __future__ import annotations

import numpy as np

from .graph import Graph, Operator, Parameter

# pnnx activation type -> epilogue name understood by kernels/matmul.py
FUSABLE_ACTIVATIONS = {
    "nn.ReLU": "relu",
    "F.relu": "relu",
    "nn.SiLU": "silu",
    "F.silu": "silu",
    "nn.Sigmoid": "sigmoid",
    "F.sigmoid": "sigmoid",
    "nn.Hardsigmoid": "hardsigmoid",
    "F.hardsigmoid": "hardsigmoid",
    "nn.Hardswish": "hardswish",
    "F.hardswish": "hardswish",
}

FUSED_ACT_PARAM = "si_fused_act"


def _single_consumer(graph: Graph, op: Operator):
    """The unique consumer of op's single output, or None (also None when
    the output is a graph output via pnnx.Output)."""
    if len(op.outputs) != 1:
        return None
    operand = op.outputs[0]
    if len(operand.consumers) != 1:
        return None
    nxt = operand.consumers[0]
    if nxt.type == "pnnx.Output":
        return None
    return nxt


def _splice_out(graph: Graph, producer: Operator, dead: Operator) -> None:
    """Rewire producer to take over dead's output operand and delete dead
    and the intermediate operand."""
    mid = producer.outputs[0]
    out = dead.outputs[0]
    out.producer = producer
    producer.outputs[0] = out
    graph.remove_operand(mid)
    graph.remove_operator(dead)


def fuse_conv_bn(graph: Graph) -> int:
    """Fold BatchNorm2d into the preceding Conv2d. Returns #fusions."""
    n = 0
    for op in list(graph.ops):
        if op.type != "nn.Conv2d":
            continue
        nxt = _single_consumer(graph, op)
        if nxt is None or nxt.type != "nn.BatchNorm2d":
            continue
        eps = nxt.params["eps"].f
        mean = nxt.attrs["running_mean"].array().astype(np.float64)
        var = nxt.attrs["running_var"].array().astype(np.float64)
        gamma = nxt.attrs["weight"].array().astype(np.float64)
        beta = nxt.attrs["bias"].array().astype(np.float64)
        scale = gamma / np.sqrt(var + eps)  # per out-channel
        shift = beta - mean * scale

        w = op.attrs["weight"].array().astype(np.float64)  # OIHW
        w = w * scale[:, None, None, None]
        from .graph import Attribute

        op.attrs["weight"] = Attribute.from_array(w.astype(np.float32))
        if op.params["bias"].b:
            b = op.attrs["bias"].array().astype(np.float64)
        else:
            b = np.zeros(w.shape[0], np.float64)
            op.params["bias"] = Parameter.from_value(True)
        op.attrs["bias"] = Attribute.from_array(
            (b * scale + shift).astype(np.float32))
        _splice_out(graph, op, nxt)
        n += 1
    return n


def fuse_conv_activation(graph: Graph) -> int:
    """Tag convs (and linears) whose sole consumer is a fusable
    activation; delete the activation op. Returns #fusions."""
    n = 0
    for op in list(graph.ops):
        if op.type not in ("nn.Conv2d", "nn.Linear"):
            continue
        if FUSED_ACT_PARAM in op.params:
            continue
        nxt = _single_consumer(graph, op)
        if nxt is None:
            continue
        act = FUSABLE_ACTIVATIONS.get(nxt.type)
        if act is None:
            continue
        op.params[FUSED_ACT_PARAM] = Parameter.from_value(act)
        _splice_out(graph, op, nxt)
        n += 1
    return n


def _conv_param(op, key):
    p = op.params.get(key)
    return p.value if p is not None else None


def _plain_conv(op) -> bool:
    return (op.type == "nn.Conv2d"
            and _conv_param(op, "groups") == 1
            and _conv_param(op, "dilation") == [1, 1]
            and _conv_param(op, "padding_mode") == "zeros")


def _pack_consumers(op):
    """The packed-handoff consumer set: op's single output must have
    exactly ONE consumer, a plain non-pointwise conv. (Measured on v5e:
    fanning packed tensors out to multiple consumers, or into 1x1 convs
    whose block-Toeplitz form is block-diagonal — g x the MACs for the
    same work — regresses; the win is conv->conv relay with kw > 1.)"""
    if len(op.outputs) != 1:
        return None
    consumers = op.outputs[0].consumers
    if len(consumers) != 1:
        return None
    c = consumers[0]
    if c.type == "pnnx.Output" or not _plain_conv(c):
        return None
    kernel = _conv_param(c, "kernel_size") or [1, 1]
    stride = _conv_param(c, "stride") or [1, 1]
    if stride[1] not in (1, 2) or kernel[1] == 1:
        return None
    return [c]


def mark_packed_conv_chains(graph: Graph) -> int:
    """Tag conv chains for the W-packed handoff (ops/conv.py PackedW).

    Seeds: small-input-channel W-stride-2 stem convs. From each seed the
    packed domain propagates while EVERY consumer of a packed conv is
    itself a plain conv (stride_w 1 or 2): the producer keeps its output
    in packed form and each consumer convolves it with block-Toeplitz-
    repacked weights — skipping the unpack/repack layout copies between
    them (measured ~0.45 ms of a 3 ms YOLOv5s-640-b8 forward for the
    first pair alone). The first non-conv consumer (cat, add, pool, the
    graph output) ends the chain: its producer emits dense NHWC.
    Returns the number of producer->consumers handoffs marked."""
    n = 0
    seeds = []
    for op in graph.ops:
        if not _plain_conv(op):
            continue
        stride = _conv_param(op, "stride") or [1, 1]
        ic = _conv_param(op, "in_channels") or 1 << 30
        if stride[1] == 2 and ic <= 8:
            seeds.append(op)
    visited = set()
    work = list(seeds)
    while work:
        op = work.pop()
        if id(op) in visited:
            continue
        visited.add(id(op))
        consumers = _pack_consumers(op)
        if consumers is None:
            continue
        op.params[FUSED_PACK_OUT] = Parameter.from_value(True)
        for c in consumers:
            c.params[FUSED_PACK_IN] = Parameter.from_value(True)
            work.append(c)
        n += 1
    return n


FUSED_PACK_OUT = "si_pack_out"
FUSED_PACK_IN = "si_pack_in"


def _pointwise_conv(op) -> bool:
    return (_plain_conv(op)
            and _conv_param(op, "kernel_size") == [1, 1]
            and _conv_param(op, "stride") == [1, 1]
            and _conv_param(op, "padding") == [0, 0])


FUSED_CAT_INPUTS = "si_cat_inputs"


def fuse_cat_conv1x1(graph: Graph) -> int:
    """Eliminate channel concats feeding pointwise convs:
    conv1x1(cat(a, b, ...)) == conv(a, W_a) + conv(b, W_b) + ... with W
    split along input channels — so the concatenated tensor is never
    materialized (C3 blocks and SPPF in YOLOv5 concat 2-4 feature maps
    before a 1x1 conv; measured ~0.1 ms each at 80x80 on v5e). Fires
    when EVERY consumer of a channel-dim cat is a pointwise conv; each
    consumer takes the cat's inputs directly and slices its own weight
    at trace time (ops/conv.py FUSED_CAT_INPUTS handling).
    Returns #cats removed."""
    n = 0
    for op in list(graph.ops):
        if op.type != "torch.cat":
            continue
        dim = _conv_param(op, "dim")
        if dim != 1 or len(op.outputs) != 1:
            continue  # channel concat only (logical NCHW dim 1)
        operand = op.outputs[0]
        consumers = list(operand.consumers)
        if not consumers or not all(_pointwise_conv(c) for c in consumers):
            continue
        for conv in consumers:
            # replace the cat operand with the cat's inputs, in order
            new_inputs = []
            for r in conv.inputs:
                if r is operand:
                    for src in op.inputs:
                        src.consumers.append(conv)
                        new_inputs.append(src)
                else:
                    new_inputs.append(r)
            conv.inputs = new_inputs
            conv.params[FUSED_CAT_INPUTS] = Parameter.from_value(True)
        for src in op.inputs:
            src.remove_consumer(op)
        graph.remove_operand(operand)
        graph.remove_operator(op)
        n += 1
    return n


def run_inference_fusions(graph: Graph) -> dict:
    """conv+bn first (so conv+bn+act chains end as one fused conv),
    then activation folding, then packed-chain marking."""
    stats = {"conv_bn": fuse_conv_bn(graph),
             "conv_act": fuse_conv_activation(graph),
             "cat_conv": fuse_cat_conv1x1(graph),
             "packed_chain": mark_packed_conv_chains(graph)}
    return stats
