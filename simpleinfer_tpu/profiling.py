"""Observability: roofline accounting, device tracing, instrumented runs.

The reference's entire instrumentation is a per-layer LOG(INFO) line
(/root/reference/src/layer.cpp:46) plus a google-benchmark harness
(SURVEY.md §5 "Tracing/profiling: none"). Here, as BASELINE.json demands
("per-kernel roofline accounting"):

- roofline_report(program): per-op FLOPs, weight/activation bytes,
  arithmetic intensity, and the compute-vs-bandwidth bound verdict for a
  given chip spec (defaults: TPU v5e).
- trace(): context manager around jax.profiler for real device timelines.
- timed_run(): op-by-op execution with a sync per op — the analog of the
  reference's per-layer log, for attributing time on backends where the
  profiler is unavailable. (Per-op dispatch overhead dominates on
  remote-attached chips; prefer trace() there.)
"""
from __future__ import annotations

import contextlib
import math
import time
from dataclasses import dataclass

import jax
import numpy as np


@dataclass(frozen=True)
class ChipSpec:
    """Peak numbers used for roofline ratios."""

    name: str = "tpu-v5e"
    peak_bf16_tflops: float = 394.0
    peak_fp32_tflops: float = 197.0  # 3-pass emulation halves-ish bf16
    hbm_gbps: float = 819.0
    vmem_mb: float = 128.0

    def peak_tflops(self, dtype: str) -> float:
        return (self.peak_fp32_tflops if dtype == "float32"
                else self.peak_bf16_tflops)


V5E = ChipSpec()


@dataclass
class OpCost:
    name: str
    type: str
    flops: int
    weight_bytes: int
    out_bytes: int
    out_shape: list

    @property
    def bytes_total(self) -> int:
        return self.weight_bytes + self.out_bytes

    @property
    def intensity(self) -> float:
        """FLOPs per byte moved (weights + outputs; inputs are usually a
        prior op's output already counted once)."""
        return self.flops / max(self.bytes_total, 1)

    def bound(self, spec: ChipSpec = V5E, dtype: str = "bfloat16") -> str:
        ridge = spec.peak_tflops(dtype) * 1e12 / (spec.hbm_gbps * 1e9)
        return "compute" if self.intensity >= ridge else "bandwidth"

    def min_time_us(self, spec: ChipSpec = V5E,
                    dtype: str = "bfloat16") -> float:
        """Speed-of-light time: max of compute and bandwidth floors."""
        t_c = self.flops / (spec.peak_tflops(dtype) * 1e12)
        t_b = self.bytes_total / (spec.hbm_gbps * 1e9)
        return max(t_c, t_b) * 1e6


def _nbytes(tree) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        total += getattr(leaf, "nbytes",
                         np.asarray(leaf).nbytes if np.isscalar(leaf) else 0)
    return int(total)


def roofline_report(program, batch: int = 1, dtype_bytes: int = 2) -> list:
    """Per-op cost table from the lowered Program (executor.Program).

    Uses the shapes inferred at load (program.op_output_shapes, batch=1)
    scaled by `batch`; output element size = dtype_bytes (2 for bf16).
    """
    from .executor import _estimate_flops

    out = []
    for impl in program.impls:
        shapes = program.op_output_shapes.get(impl.name, [])
        flops = _estimate_flops(impl, shapes) * batch
        out_bytes = sum(
            batch * int(math.prod(s[1:])) * dtype_bytes if s else 0
            for s in shapes)
        out.append(OpCost(
            name=impl.name, type=impl.type, flops=flops,
            weight_bytes=_nbytes(impl.weights), out_bytes=out_bytes,
            out_shape=shapes[0] if shapes else []))
    return out


def summarize_roofline(program, batch: int = 1, spec: ChipSpec = V5E,
                       dtype: str = "bfloat16", top: int = 10) -> str:
    """Human-readable roofline table + speed-of-light total."""
    costs = roofline_report(
        program, batch, dtype_bytes=4 if dtype == "float32" else 2)
    costs.sort(key=lambda c: -c.min_time_us(spec, dtype))
    sol_us = sum(c.min_time_us(spec, dtype) for c in costs)
    total_flops = sum(c.flops for c in costs)
    lines = [
        f"model: {len(costs)} ops, {total_flops / 1e9:.2f} GFLOP/batch{batch},"
        f" speed-of-light {sol_us / 1e3:.3f} ms on {spec.name} ({dtype})",
        f"{'op':28s} {'type':18s} {'GFLOP':>8s} {'MB':>8s} {'int.':>7s} "
        f"{'bound':>9s} {'SoL us':>8s}",
    ]
    for c in costs[:top]:
        lines.append(
            f"{c.name[:28]:28s} {c.type[:18]:18s} {c.flops / 1e9:8.3f} "
            f"{c.bytes_total / 1e6:8.2f} {c.intensity:7.1f} "
            f"{c.bound(spec, dtype):>9s} {c.min_time_us(spec, dtype):8.1f}")
    return "\n".join(lines)


def measure_device_time(fn, *args, iters: int = 20, warmup: bool = True,
                        precompile: bool = True, compiler_options=None):
    """Wall-accurate DEVICE time per fn(*args) call, robust to host
    dispatch overhead: runs iterations inside one jitted lax.fori_loop,
    chaining each iteration's input on a scalar of the previous output
    (so XLA cannot hoist or parallelize them), and uses a TWO-POINT
    measurement — (T(2*iters) - T(iters)) / iters — so the fixed
    per-dispatch cost (~28 ms on a remote-attached chip: RTT + launch)
    cancels exactly. The trip count is a traced argument, so both
    points share one compilation.

    fn's first argument must be a float array; remaining args pass
    through.

    `precompile` first compiles fn PLAIN (outside the loop): measured on
    the axon compile service (2026-08-17), cold-compiling a fori_loop
    program directly can stall >45 min, while the same loop compiles in
    ~20-30 s once the plain fn has been compiled (shared per-fusion
    cache). The extra plain compile costs seconds to minutes but bounds
    the worst case.

    `compiler_options`: optional {xla option: value} dict applied to
    BOTH the plain and loop compiles (per-executable XLA backend
    options — the tuning surface scripts/xla_flags_experiment.py
    sweeps)."""
    import jax.numpy as jnp
    from jax import lax

    if precompile:
        jax.jit(fn).lower(*args).compile(compiler_options)

    def scalar_of(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf).astype(jnp.float32)

    def loop_fn(n, x0, *rest):
        def body(i, carry):
            x, acc = carry
            out = fn(x, *rest)
            s = scalar_of(out)
            # dependency chain: adds 0*s (not foldable: s could be NaN)
            x = x + (s * 0.0).astype(x.dtype)
            return (x, acc + s)

        _, acc = lax.fori_loop(0, n, body, (x0, jnp.float32(0.0)),
                               unroll=False)
        return acc

    jitted = jax.jit(loop_fn)
    if compiler_options:
        # AOT with explicit backend options; n stays a traced argument
        # so the two measurement points share this one executable
        loop = jitted.lower(iters, *args).compile(compiler_options)
    else:
        loop = jitted

    if warmup:
        np.asarray(loop(iters, *args))
    t0 = time.perf_counter()
    np.asarray(loop(iters, *args))
    t1 = time.perf_counter()
    np.asarray(loop(2 * iters, *args))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / iters


# validated healthy reading for the reference kernel (docs/PERF.md:
# 4096^3 bf16 matmul = 0.709 ms = 193.7 TFLOP/s = 98% of v5e peak)
_REF_N = 4096
_REF_HEALTHY_S = 2 * _REF_N**3 / 193.7e12


def chip_speed_factor(iters: int = 40) -> float:
    """Current chip speed vs its validated healthy state, via the
    reference kernel (4096^3 bf16 matmul, two-point chained loop).

    1.0 = healthy; 0.5 = the chip/relay is currently delivering half
    its known-good rate. Motivation (docs/PERF.md "measurement trap"):
    the SAME program measured 1.56-3.49 ms across one day, so absolute
    readings are uninterpretable without a same-moment reference.
    Report this factor next to any benchmark number; compare runs only
    at similar factors. Costs one tiny cached compile + ~60 ms of
    device time."""
    import jax.numpy as jnp

    a = jnp.ones((_REF_N, _REF_N), jnp.bfloat16)

    def ref(x):
        return jnp.dot(x, x, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16)

    dt = measure_device_time(ref, a, iters=iters, precompile=False)
    return _REF_HEALTHY_S / dt


@contextlib.contextmanager
def trace(logdir: str = "/tmp/si_trace"):
    """jax.profiler trace around a block; view in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


# Column ids kept from xprof's hlo_stats table (the rest are dropped).
_HLO_STAT_KEYS = (
    "program_id", "category", "hlo_op_name", "tf_op_name", "occurrences",
    "total_self_time", "avg_self_time", "total_self_time_percent",
    "model_flop_rate", "measured_memory_bw", "operational_intensity",
    "bound_by", "hlo_op_expression",
)


def hlo_stats(trace_dir: str) -> list:
    """Parse a `trace()` capture into MEASURED per-HLO-op device stats.

    The measured counterpart of `roofline_report` (which is static
    accounting): for every HLO op that ran on the device, the profiler's
    self time, achieved GFLOP/s, memory bandwidth, operational intensity
    and bound-by verdict, sorted by total self time. Uses xprof's
    hlo_stats converter on the .xplane.pb files jax.profiler wrote.
    The reference has no profiling at all (SURVEY.md §5); this plus
    `trace()` is the BASELINE.json "per-kernel roofline accounting".

    Returns a list of dicts with keys `_HLO_STAT_KEYS` (times in us).
    """
    import glob as _glob
    import json as _json
    import os as _os

    # xprof's generated protos need the pure-python protobuf runtime;
    # must be set before google.protobuf is first imported.
    _os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                           "python")
    paths = sorted(_glob.glob(_os.path.join(trace_dir, "**", "*.xplane.pb"),
                              recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    try:
        from xprof.convert import raw_to_tool_data as _r2t
    except Exception as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "xprof unavailable for trace parsing; if this is a protobuf "
            "descriptor error, set PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"
            "=python before python starts") from e
    data, _ = _r2t.xspace_to_tool_data(paths, "hlo_stats", {})
    if data is None:
        raise RuntimeError(
            "xprof produced no hlo_stats from the capture — the trace "
            "holds no device events. On a remote-attached chip this "
            "means the backend's profiler service was unavailable "
            "during capture ('No worker service stub available' on "
            "stderr); retry later, it is a transient service condition.")
    table = _json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["id"] for c in table["cols"]]
    rows = []
    for row in table.get("rows", []):
        full = dict(zip(cols, [c.get("v") for c in row["c"]]))
        rows.append({k: full.get(k) for k in _HLO_STAT_KEYS})
    rows.sort(key=lambda r: -(r["total_self_time"] or 0.0))
    return rows


def device_profile(fn, *args, iters: int = 10,
                   logdir: str = "/tmp/si_device_profile") -> list:
    """Trace `iters` enqueued calls of compiled `fn(*args)` and return
    `hlo_stats` rows. fn is jit-compiled before tracing so the capture
    holds only steady-state device work (plus the final host fetch that
    drains the queue inside the trace window)."""
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args))  # compile outside the trace
    with trace(logdir) as d:
        out = None
        for _ in range(iters):
            out = jfn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return hlo_stats(d)


def format_hlo_stats(rows: list, top: int = 30, iters: int = 1) -> str:
    """Render hlo_stats rows: per-category rollup + top ops by self
    time. `iters` divides totals down to per-iteration time."""
    total = sum(r["total_self_time"] or 0.0 for r in rows)
    by_cat: dict = {}
    for r in rows:
        c = by_cat.setdefault(r["category"] or "?", [0.0, 0])
        c[0] += r["total_self_time"] or 0.0
        c[1] += int(r["occurrences"] or 0)
    lines = [f"device self time: {total / iters / 1e3:.3f} ms/iter "
             f"({iters} iters)", "",
             f"{'category':<26s} {'us/iter':>9s} {'%':>6s} {'#ops':>6s}"]
    for cat, (us, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        lines.append(f"{cat[:26]:<26s} {us / iters:9.1f} "
                     f"{100 * us / max(total, 1e-9):6.1f} {n:6d}")
    lines += ["", f"{'op':<34s} {'category':<22s} {'us/iter':>8s} "
              f"{'%':>5s} {'GFLOP/s':>8s} {'GiB/s':>7s} {'bound':>10s}"]
    for r in rows[:top]:
        lines.append(
            f"{(r['hlo_op_name'] or '?')[:34]:<34s} "
            f"{(r['category'] or '?')[:22]:<22s} "
            f"{(r['total_self_time'] or 0.0) / iters:8.1f} "
            f"{r['total_self_time_percent'] or 0.0:5.1f} "
            f"{r['model_flop_rate'] or 0.0:8.0f} "
            f"{r['measured_memory_bw'] or 0.0:7.0f} "
            f"{(r['bound_by'] or '?')[:10]:>10s}")
    return "\n".join(lines)


def timed_run(program, weights, inputs, sync: bool = True) -> list:
    """Execute the program op-by-op (eager, unfused), timing each op.
    Returns [(op_name, op_type, seconds)] in execution order.

    The analog of the reference's per-layer forward logging
    (layer.cpp:46), and an upper bound on fused whole-program time. Debug
    tool for local backends — per-op sync is meaningless over a
    remote-attached device, and eager per-op execution forgoes XLA
    fusion, so treat results as relative weights, not absolute times."""
    env = dict(inputs)
    rows = []
    for impl, in_names, out_names in program.plan:
        args = [env[n] for n in in_names]
        t0 = time.perf_counter()
        out = impl.apply(weights[impl.name], *args)
        leaves = [out] if impl.n_outputs == 1 else list(out)
        if sync:
            for v in leaves:
                jax.block_until_ready(v)
        rows.append((impl.name, impl.type, time.perf_counter() - t0))
        for n, o in zip(out_names, leaves):
            env[n] = o
    return rows


def attribute_slices(program, weights, inputs, n_slices: int = 12,
                     iters: int = 12, compiler_options=None,
                     verbose: bool = True, cuts: list | None = None) -> list:
    """Per-SEGMENT on-chip attribution via prefix-program slicing —
    the profiler-independent answer to "where do the milliseconds go"
    (the external hlo_stats service is unreliable, docs/PERF.md).

    Compiles ~n_slices prefix programs (plan[0:cut]), two-point-times
    each (measure_device_time — the only drift-robust method on this
    chip), and reports consecutive differences:

        [(label, ops_in_segment, seg_seconds, seg_flops)]

    Cut points are chosen evenly in CUMULATIVE FLOPs so each segment
    carries comparable work. Each prefix returns a scalar sum over its
    frontier tensors (graph outputs + tensors consumed beyond the cut)
    so XLA cannot dead-code-eliminate any in-slice op; the added
    reductions are one read of the frontier, small vs segment work.

    Caveat (by construction): a prefix boundary breaks whatever fusion
    XLA would have done across it, so segment times sum to slightly
    MORE than the fused whole — treat segments as attribution weights
    with ~5-10% boundary smear, not exact kernel times. The reference's
    analog is per-layer timing with sync (timed_run), which is far
    cruder (no fusion at all)."""
    import jax.numpy as jnp

    plan = program.plan
    # consumer map: operand name -> set of plan indices that read it
    consumers: dict = {}
    for idx, (_impl, in_names, _outs) in enumerate(plan):
        for n in in_names:
            consumers.setdefault(n, set()).add(idx)
    output_names = {s.name for s in program.outputs}

    # cumulative flops -> cut points (always include the full program).
    # Per-op flops come from the inferred output shapes (same estimator
    # the roofline uses) — impl.flops_per_item alone is 0 for
    # per-pixel-counted ops like conv.
    from .executor import _estimate_flops

    flops = [max(_estimate_flops(
        impl, program.op_output_shapes.get(impl.name, [])), 0)
        for impl, _, _ in plan]
    total = sum(flops) or 1
    if cuts is None:
        # cut points evenly in cumulative FLOPs (default)
        cuts, acc, step = [], 0, total / n_slices
        next_mark = step
        for i, f in enumerate(flops):
            acc += f
            if acc >= next_mark and (i + 1) not in cuts:
                cuts.append(i + 1)
                next_mark += step
    else:
        # explicit cut indices (per-op attribution of a region): each
        # value is a plan prefix length; clipped, deduped, sorted
        cuts = sorted({min(max(int(c), 1), len(plan)) for c in cuts})
    if not cuts or cuts[-1] != len(plan):
        cuts.append(len(plan))

    def make_prefix(cut):
        def fn(w, ins):
            env = dict(ins)
            if program.wrap_inputs is not None:
                env = program.wrap_inputs(env)
            for idx in range(cut):
                impl, in_names, out_names = plan[idx]
                out = impl.apply(w[impl.name], *[env[n] for n in in_names])
                leaves = [out] if impl.n_outputs == 1 else list(out)
                for n, o in zip(out_names, leaves):
                    env[n] = o
            produced = {n for _, _, outs in plan[:cut] for n in outs}
            frontier = [
                n for n in produced
                if n in output_names
                or any(c >= cut for c in consumers.get(n, ()))
                or not consumers.get(n)]
            # frontier values may be carrier pytrees (int8-static
            # QuantizedActivation): sum every jax leaf
            return sum(
                jnp.sum(leaf.astype(jnp.float32))
                for n in sorted(frontier)
                for leaf in jax.tree_util.tree_leaves(env[n]))

        return fn

    rows = []
    prev_t = 0.0
    prev_cut = 0
    for cut in cuts:
        fn = make_prefix(cut)
        t = measure_device_time(lambda x, fn=fn: fn(weights,
                                                    {**inputs,
                                                     _first(inputs): x}),
                                inputs[_first(inputs)], iters=iters,
                                compiler_options=compiler_options)
        seg_ops = [plan[i][0] for i in range(prev_cut, cut)]
        seg_flops = sum(flops[prev_cut:cut])
        label = (f"{seg_ops[0].name}..{seg_ops[-1].name}"
                 if seg_ops else "?")
        rows.append((label, [o.name for o in seg_ops],
                     max(t - prev_t, 0.0), seg_flops))
        if verbose:
            print(f"  prefix[:{cut:3d}] {t * 1e3:8.3f} ms  "
                  f"segment {max(t - prev_t, 0.0) * 1e3:8.3f} ms  "
                  f"({label})", flush=True)
        prev_t, prev_cut = t, cut
    return rows


def _first(d: dict):
    return next(iter(d))
