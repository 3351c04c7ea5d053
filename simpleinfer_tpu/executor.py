"""Graph executor: pnnx graph -> one jit-compiled XLA program.

This is the TPU-native replacement for the reference's entire runtime
layer (/root/reference/src/engine_impl.cpp): where the reference builds a
CGraph dataflow pipeline with one PipelineNode per layer and executes it
on a 2-thread pool (engine_impl.cpp:336-437), here the graph is lowered
once into a single pure JAX function and handed to `jax.jit`. XLA then
provides everything the reference's runtime did by hand or left as TODO:

- inter-op scheduling (CGraph STATIC engine -> XLA program order),
- operator fusion (conv+bias+activation epilogues; the reference has none),
- memory planning/reuse (the reference mallocs every intermediate eagerly,
  engine_impl.cpp:465-482, "TODO: memory pool" at tensor.cpp:54),
- multi-core parallelism (Eigen ThreadPool(16) -> MXU/VPU + GSPMD).

Lifecycle parity with EngineImpl::LoadModel (engine_impl.cpp:16-75):

    CreateContext        -> (jax runtime, implicit)
    CreateGraph          -> ir.Graph.load + expand_expression
    CreateTensorNodes    -> operand table + NCHW->NHWC shape conversion
                            (engine_impl.cpp:182-189) + input/output
                            discovery by producer/consumer degree
                            (engine_impl.cpp:196-211)
    CreateLayers         -> ops.lower_operator per op (Init+Validate)
    CreatePipeline       -> build_program (trace order = topo order)
    AllocateTensorMemory -> (XLA buffer assignment, implicit)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .config import EngineConfig
from .ir.expression import expand_expression
from .ir.graph import Graph, Operand
from .ops import OpImpl, lower_operator
from .quant.tensor import quantize_per_channel


def nchw_shape_to_nhwc(shape: list) -> list:
    """Declared pnnx shapes are NCHW; runtime tensors are NHWC.

    Mirrors the conversion at engine_impl.cpp:182-189 (rank-4 only).
    """
    if len(shape) == 4:
        n, c, h, w = shape
        return [n, h, w, c]
    return list(shape)


@dataclass
class TensorSpec:
    """Runtime metadata for one operand (the analog of TensorNode,
    /root/reference/src/tensor_node.h:9-12, minus the eager buffer)."""

    name: str
    shape: list  # NHWC for rank-4, -1 = dynamic (batch)
    dtype: object = jnp.float32


@dataclass
class Program:
    """A lowered model: pure function + weights, ready to jit."""

    inputs: list  # list[TensorSpec] in declaration order
    outputs: list  # list[TensorSpec]
    impls: list  # list[OpImpl] in topo order
    weights: dict  # op name -> {weight key -> np/jax array | QuantizedTensor}
    fn: Callable  # fn(weights, inputs_dict) -> outputs_dict
    flops_per_item: int = 0  # forward FLOPs at batch=1 (roofline accounting)
    # op name -> list of inferred output shapes at batch=1 (NHWC), from
    # abstract evaluation; {} when graph input shapes are undeclared
    op_output_shapes: dict = field(default_factory=dict)
    # execution plan: [(OpImpl, input operand names, output operand names)]
    # in topo order — consumed by profiling.timed_run and debug tooling
    plan: list = field(default_factory=list)
    # graph inputs the engine should stage PRE-PACKED for a W-packed stem
    # (ops/conv.py PackedW): input name -> (f, declared_w). The host-side
    # reshape is free; staging packed removes XLA's input relayout + pack
    # copies. pack_input() applies it; fn accepts either form.
    input_transforms: dict = field(default_factory=dict)
    # wraps staged (possibly pre-packed) inputs into their carrier types
    # before plan execution; identity when None
    wrap_inputs: Optional[Callable] = None
    # outputs emitted packed (OpImpl.host_output_retile): output name ->
    # na; Engine.extract reshapes [N,R,na*c] -> [N,R*na,c] host-side
    # (free) instead of paying the device retile copy
    output_transforms: dict = field(default_factory=dict)
    # HOST-only pre-quantization fp32 weights for per-channel activation
    # folding (EngineConfig.act_per_channel): op name -> fp array. The
    # fold (engine._install_act_scales) requantizes w·s from THESE, not
    # from the already-quantized weight — per-out-channel weight quant
    # can zero whole input channels (small |w| against a large-|w|
    # sibling), and dequantize() cannot bring them back. Never placed on
    # device.
    fp_weights: dict = field(default_factory=dict)

    def pack_input(self, name: str, x):
        """Reshape a staged NHWC input to its stem-packed form (no-op
        when the input has no transform or doesn't match the declared
        unpacked shape)."""
        tr = self.input_transforms.get(name)
        if tr is None or getattr(x, "ndim", 0) != 4:
            return x
        f, wd, c = tr
        n, h, w_, ch = x.shape
        if w_ != wd or ch != c:
            return x  # already packed, or undeclared shape mismatch
        return x.reshape(n, h, w_ // f, f * c)

    @property
    def input_names(self) -> list:
        return [s.name for s in self.inputs]

    @property
    def output_names(self) -> list:
        return [s.name for s in self.outputs]


class GraphError(ValueError):
    pass


def _toposort(graph: Graph) -> list:
    """Topological order over operators (producer before consumer).

    pnnx files are serialized in topo order already, but the expression
    expander inserts ops in place; re-sorting keeps the executor
    independent of serialization order (the analog of CGraph's dependency
    resolution at engine_impl.cpp:396-404).
    """
    indeg = {id(op): 0 for op in graph.ops}
    name_to_producer = {}
    for op in graph.ops:
        for r in op.outputs:
            name_to_producer[r.name] = op
    edges = {id(op): [] for op in graph.ops}
    for op in graph.ops:
        for r in op.inputs:
            p = name_to_producer.get(r.name)
            if p is not None and p is not op:
                edges[id(p)].append(op)
                indeg[id(op)] += 1
    from collections import deque

    ready = deque(op for op in graph.ops if indeg[id(op)] == 0)
    order = []
    while ready:
        op = ready.popleft()
        order.append(op)
        for c in edges[id(op)]:
            indeg[id(c)] -= 1
            if indeg[id(c)] == 0:
                ready.append(c)
    if len(order) != len(graph.ops):
        raise GraphError("graph contains a cycle")
    return order


def discover_io(graph: Graph) -> tuple:
    """Input/output operands, by op type first then by degree.

    pnnx graphs mark graph I/O with pnnx.Input/pnnx.Output operators; the
    degree-based classification (no producer -> input, no consumer ->
    output) matches engine_impl.cpp:196-211 and covers hand-built graphs.
    """
    inputs, outputs = [], []
    for op in graph.ops:
        if op.type == "pnnx.Input":
            inputs.extend(op.outputs)
        elif op.type == "pnnx.Output":
            outputs.extend(op.inputs)
    if not inputs:
        inputs = [r for r in graph.operands if r.producer is None]
    if not outputs:
        outputs = [r for r in graph.operands if not r.consumers]
    if not inputs:
        raise GraphError("graph has no inputs")
    if not outputs:
        raise GraphError("graph has no outputs")
    return inputs, outputs


def _spec_for(operand: Operand) -> TensorSpec:
    return TensorSpec(name=operand.name,
                      shape=nchw_shape_to_nhwc(operand.shape))


def _stem_input_transforms(plan: list, input_specs: list,
                           input_names: set) -> dict:
    """Graph inputs whose sole consumer is a W-pack-eligible stem conv:
    the shared ops/conv.stem_pack_factor picks the SAME block factor the
    stem would at trace time (including viability checks), so the engine
    can stage the input pre-packed. Returns {name: (f, w, c)}."""
    from .ops.conv import stem_pack_factor

    consumers: dict = {}
    for impl, in_names, _ in plan:
        for n in in_names:
            if n in input_names:
                consumers.setdefault(n, []).append(impl)
    out = {}
    for spec in input_specs:
        cons = consumers.get(spec.name, [])
        if len(cons) != 1 or cons[0].stem_pack_info is None:
            continue
        if (len(spec.shape) != 4 or spec.shape[2] in (None, -1)
                or spec.shape[3] in (None, -1)):
            continue
        wd, c = int(spec.shape[2]), int(spec.shape[3])
        kw, sw, pl = cons[0].stem_pack_info
        f = stem_pack_factor(wd, kw, sw, pl)
        if f is not None:
            out[spec.name] = (f, wd, c)
    return out


def _infer_op_shapes(plan: list, input_specs: list,
                     input_transforms: dict | None = None) -> dict:
    """Abstract-evaluate the plan (jax.eval_shape — no FLOPs spent) to
    get every op's output shapes at batch=1. The shape-propagation
    analog of the reference's per-layer ValidateShape during load
    (engine_impl.cpp:232-310), and the input to roofline accounting.
    Returns {} when any graph input lacks a declared shape."""
    from .ops.conv import PackedW

    env: dict = {}
    for s in input_specs:
        if not s.shape:
            return {}
        shape = tuple(1 if d == -1 else int(d) for d in s.shape)
        tr = (input_transforms or {}).get(s.name)
        if tr is not None and len(shape) == 4:
            f, wd, _c = tr
            n, h, w_, c = shape
            env[s.name] = PackedW(
                data=jax.ShapeDtypeStruct((n, h, w_ // f, f * c), s.dtype),
                jo=f, ow=wd)
            continue
        env[s.name] = jax.ShapeDtypeStruct(shape, s.dtype)
    shapes: dict = {}
    for impl, in_names, out_names in plan:
        out = jax.eval_shape(impl.apply, impl.weights,
                             *[env[n] for n in in_names])
        outs = [out] if impl.n_outputs == 1 else list(out)
        for n, o in zip(out_names, outs):
            env[n] = o
        shapes[impl.name] = [list(o.shape) for o in outs]
    return shapes


def _estimate_flops(impl: OpImpl, out_shapes: list) -> int:
    if impl.flops_per_pixel and out_shapes:
        s = out_shapes[0]
        if len(s) == 4:
            return impl.flops_per_pixel * int(s[1]) * int(s[2])
    return impl.flops_per_item


def build_program(graph: Graph, cfg: Optional[EngineConfig] = None) -> Program:
    """Lower a pnnx graph to a Program (pure fn + weights pytree)."""
    cfg = cfg or EngineConfig()
    expand_expression(graph)
    if cfg.fuse:
        from .ir.passes import run_inference_fusions

        run_inference_fusions(graph, cfg)
    order = _toposort(graph)
    input_operands, output_operands = discover_io(graph)
    input_names = {r.name for r in input_operands}

    impls: list[OpImpl] = []
    weights: dict = {}
    fp_weights: dict = {}
    plan: list[tuple] = []  # (impl, in_names, out_names)
    for op in order:
        if op.type in ("pnnx.Input", "pnnx.Output"):
            continue
        impl = lower_operator(op, cfg)
        if cfg.quant in ("int8w", "int8", "int4w") and impl.quantizable:
            for key, axis in impl.quantizable.items():
                if key in impl.weights:
                    # host-only fp copy for per-channel fold targets —
                    # kept for ANY int8 engine so a per-channel
                    # calibration artifact loads regardless of whether
                    # THIS engine was built with act_per_channel
                    if (key == "weight" and cfg.quant == "int8"
                            and impl.act_fold):
                        fp_weights[impl.name] = impl.weights[key]
                    w = impl.weights[key]
                    if (cfg.quant == "int4w"
                            and getattr(w, "ndim", 0) == 2
                            and axis == 1):
                        # the W4 serving dtype: 2-D [in, out] weights
                        # group-quantized + nibble-packed; conv (4-D)
                        # weights below keep per-channel int8
                        from .quant.tensor import quantize_int4_grouped

                        impl.weights[key] = quantize_int4_grouped(
                            w, group=cfg.int4_group)
                    else:
                        impl.weights[key] = quantize_per_channel(w, axis)
        impls.append(impl)
        weights[impl.name] = impl.weights
        in_names = [r.name for r in op.inputs]
        out_names = [r.name for r in op.outputs]
        plan.append((impl, in_names, out_names))

    input_specs = [_spec_for(r) for r in input_operands]
    input_transforms = _stem_input_transforms(plan, input_specs,
                                              input_names)
    op_shapes = _infer_op_shapes(plan, input_specs, input_transforms)
    flops = sum(_estimate_flops(impl, op_shapes.get(impl.name, []))
                for impl in impls)

    output_names = [r.name for r in output_operands]
    producer_of = {}
    for impl, _, out_ns in plan:
        for n in out_ns:
            producer_of[n] = impl
    output_transforms = {
        n: producer_of[n].host_output_retile
        for n in output_names
        if n in producer_of and producer_of[n].host_output_retile}

    def wrap_inputs(inputs: dict) -> dict:
        """Re-wrap pre-packed stem inputs as PackedW carriers (engine
        stages them reshaped; raw NHWC arrays pass through untouched —
        the conv lowering packs those itself). Shared by fn and the
        calibration observer (quant/calibrate.py)."""
        from .ops.conv import PackedW

        env = dict(inputs)
        for name, (f, wd, c) in input_transforms.items():
            x = env.get(name)
            # both width AND channel dims must match the packed form —
            # a raw input that merely happens to be wd/f wide (smaller
            # image at the declared channel count) must pass through
            if (x is not None and getattr(x, "ndim", 0) == 4
                    and x.shape[2] == wd // f and x.shape[3] == f * c):
                env[name] = PackedW(data=x, jo=f, ow=wd)
        return env

    def fn(weights, inputs):
        env = wrap_inputs(inputs)
        for impl, in_names, out_names in plan:
            args = []
            for n in in_names:
                if n not in env:
                    raise GraphError(
                        f"op {impl.name!r} consumes operand {n!r} before it "
                        f"is produced")
                args.append(env[n])
            out = impl.apply(weights[impl.name], *args)
            if impl.n_outputs == 1:
                env[out_names[0]] = out
            else:
                for n, o in zip(out_names, out):
                    env[n] = o
        return {n: env[n] for n in output_names}

    return Program(
        inputs=input_specs,
        outputs=[_spec_for(r) for r in output_operands],
        impls=impls,
        weights=weights,
        fn=fn,
        flops_per_item=flops,
        op_output_shapes=op_shapes,
        plan=plan,
        input_transforms=input_transforms,
        wrap_inputs=wrap_inputs,
        output_transforms=output_transforms,
        fp_weights=fp_weights,
    )
