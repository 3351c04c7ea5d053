"""Public Engine API — capability parity with the reference Engine.

Reference surface (/root/reference/include/engine.h:12-38):

    Engine::LoadModel(parampath, binpath)   -> Engine.load_model
    Engine::Release()                       -> Engine.release
    Engine::InputNames()/OutputNames()      -> Engine.input_names/output_names
    Engine::Input(name, tensor)             -> Engine.input(name, array)
    Engine::Forward()                       -> Engine.forward
    Engine::Extract(name, tensor&)          -> Engine.extract(name)
    InitializeContext()                     -> initialize_context

plus the pythonic one-shot `Engine.run(**inputs)`. Where the reference's
Input/Extract pass non-owning aliases into malloc'd buffers
(src/tensor.cpp:28-45), here Input stages a host array onto the device
(sharded over the mesh's `data` axis when configured) and Extract fetches
the jitted program's output.

Execution model: `load_model` lowers the pnnx graph once
(executor.build_program) and wraps it in `jax.jit`. The first `forward`
per batch shape compiles; later calls replay the cached executable —
batch is the one re-jit axis (SURVEY.md §7 hard parts), which is what the
continuous-batching service layer relies on.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import EngineConfig
from .executor import Program, build_program
from .ir.graph import Graph
from .parallel.mesh import build_mesh, input_sharding, weight_shardings
from .quant.tensor import Quantized4Tensor, QuantizedTensor

logger = logging.getLogger("simpleinfer_tpu")


def initialize_context() -> None:
    """Logging init; parity with InitializeContext (src/engine.cpp:46-49),
    which also only initializes logging."""
    if not logging.getLogger().handlers:
        logging.basicConfig(
            level=logging.INFO,
            format="%(asctime)s %(levelname).1s %(name)s] %(message)s")


def _required_layouts_from_error(text: str) -> dict:
    """Parse {input name: required major_to_minor} from an XLA
    "Computation was compiled for input layouts that disagree" error.
    Each mismatch block reads:

        Argument inputs['0'] with shape bfloat16[8,640,80,24]:
          Passed layout: Layout(major_to_minor=(0, 2, 3, 1), ...)
          Required layout: Layout(major_to_minor=(1, 2, 0, 3), ...)

    Only graph-input arguments are recovered (weights are placed once
    at load and never rejected in practice). Returns {} if the text
    does not match, which callers treat as unrecoverable."""
    import re

    out = {}
    for name, mm in re.findall(
            r"Argument inputs\['([^']+)'\].*?"
            r"Required layout: Layout\(major_to_minor=\(([\d,\s]*)\)",
            text, re.S):
        dims = tuple(int(t) for t in mm.replace(" ", "").split(",") if t)
        if dims:
            out[name] = dims
    return out


class EngineStateError(RuntimeError):
    """Operation requires a loaded model (analog of Status::kEmptyGraph /
    kEmptyPipeline early-outs, engine_impl.cpp:522-555)."""


_cache_dir_enabled: Optional[str] = None


def enable_compilation_cache(cache_dir: str) -> None:
    """Point JAX's persistent compilation cache at `cache_dir`
    (process-global, first caller wins). Compiled executables are
    reused across processes — on remote-attached chips this turns
    minutes of cold model compile into seconds of deserialization."""
    global _cache_dir_enabled
    cache_dir = os.path.expanduser(cache_dir)
    if _cache_dir_enabled is not None:
        if _cache_dir_enabled != cache_dir:
            logger.info("compilation cache already at %s; ignoring %s",
                        _cache_dir_enabled, cache_dir)
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:  # noqa: BLE001 — caching is best-effort
        # unwritable HOME (read-only serving containers) must not make
        # Engine() unusable; run without the cache
        logger.warning("compilation cache disabled (%s: %s)",
                       type(e).__name__, e)
        _cache_dir_enabled = ""  # don't retry per engine
        return
    _cache_dir_enabled = cache_dir


class Engine:
    """Load a pnnx model and run batched NHWC inference on TPU."""

    def __init__(self, config: Optional[EngineConfig] = None):
        self.config = config or EngineConfig()
        if self.config.compilation_cache_dir:
            enable_compilation_cache(self.config.compilation_cache_dir)
        self._program: Optional[Program] = None
        self._jitted = None
        self._mesh = None
        self._device = None  # pinned device (config.device_index)
        self._device_weights = None
        self._staged: dict = {}
        self._outputs: dict = {}
        self._observer = None  # cached jitted calibration observer
        # pre-fold quantized weights (per-channel act scales fold the
        # act factor into the weight; re-installs restore from here)
        self._pristine_qweights: dict = {}
        # AUTO-input-layout state (config.input_layout == "auto"):
        # {input-signature: (compiled, {name: Format})}; None after a
        # failed attempt (permanently fall back to default layouts)
        self._aot_cache: Optional[dict] = {}
        # {(name, shape, dtype): Format} — lets input() stage directly
        # in the layout the compiled forward wants
        self._input_formats: dict = {}

    # ---- lifecycle -----------------------------------------------------
    def load_model(self, parampath: str, binpath: Optional[str] = None,
                   graph: Optional[Graph] = None) -> "Engine":
        """Lower + prepare a model. Idempotent re-load like the reference
        (EngineImpl::LoadModel starts with Release(), engine_impl.cpp:19).
        Pass `graph` to load an already-parsed/constructed Graph."""
        self.release()
        t0 = time.perf_counter()
        if graph is None:
            graph = Graph.load(parampath, binpath)
        program = build_program(graph, self.config)
        self._mesh = build_mesh(self.config.mesh)
        if self.config.device_index is not None:
            devs = jax.devices()
            if self.config.device_index >= len(devs):
                raise ValueError(
                    f"device_index {self.config.device_index} out of "
                    f"range: {len(devs)} device(s) visible")
            self._device = devs[self.config.device_index]
        self._device_weights = self._place_weights(program)
        self._program = program

        def run_fn(weights, inputs):
            return program.fn(weights, inputs)

        if self.config.donate_inputs:
            # donated input buffers are consumed by the call; forward()
            # clears the staging dict so reuse requires a fresh input()
            self._jitted = jax.jit(run_fn, donate_argnums=(1,))
        else:
            self._jitted = jax.jit(run_fn)
        logger.info(
            "loaded model %s: %d ops, %d inputs %s, %d outputs %s, "
            "%.1f MFLOP/item, %.0f ms",
            parampath, len(program.impls), len(program.inputs),
            program.input_names, len(program.outputs), program.output_names,
            program.flops_per_item / 1e6, (time.perf_counter() - t0) * 1e3)
        return self

    def release(self) -> None:
        self._program = None
        self._jitted = None
        self._mesh = None
        self._device = None
        self._device_weights = None
        self._staged = {}
        self._outputs = {}
        self._observer = None
        self._pristine_qweights = {}
        self._aot_cache = {}
        self._input_formats = {}

    @property
    def loaded(self) -> bool:
        return self._program is not None

    # ---- introspection ---------------------------------------------------
    @property
    def input_names(self) -> list:
        self._require_loaded()
        return self._program.input_names

    @property
    def output_names(self) -> list:
        self._require_loaded()
        return self._program.output_names

    @property
    def program(self) -> Program:
        self._require_loaded()
        return self._program

    @property
    def mesh(self):
        return self._mesh

    # ---- run-time calls --------------------------------------------------
    def input(self, name: str, array) -> None:
        """Stage one named input (host numpy or jax array).

        Arrays are NHWC by default; with io_layout='nchw' rank-4 arrays
        are transposed at this boundary. The array lands on device(s)
        here, sharded batch-over-`data` when a mesh is configured — the
        host->TPU edge of the reference's alias-into-the-engine Input
        (engine_impl.cpp:522-528)."""
        self._staged[name] = self._prepare_input(name, array)

    def _prepare_input(self, name: str, array):
        """Convert + place one named input (dtype policy, layout remap,
        mesh sharding) — shared by input() and calibrate()."""
        self._require_loaded()
        if name not in self._program.input_names:
            raise KeyError(
                f"unknown input {name!r}; inputs are {self._program.input_names}")
        if getattr(array, "dtype", None) == np.uint8:
            # ship the raw bytes (4x less relay/PCIe traffic) and
            # normalize on-device
            x = (jnp.asarray(array).astype(self.config.compute_jnp_dtype)
                 * self.config.u8_scale)
        else:
            x = jnp.asarray(array, dtype=self.config.compute_jnp_dtype)
        if self.config.io_layout == "nchw" and x.ndim == 4:
            x = jnp.transpose(x, (0, 2, 3, 1))
        spec = next(s for s in self._program.inputs if s.name == name)
        if spec.shape and len(spec.shape) != x.ndim:
            raise ValueError(
                f"input {name!r}: rank {x.ndim} does not match declared "
                f"shape {spec.shape}")
        # stem inputs stage PRE-PACKED (free host reshape; removes XLA's
        # input relayout + pack copies — Program.input_transforms)
        x = self._program.pack_input(name, x)
        if self._mesh is not None:
            x = jax.device_put(x, input_sharding(self._mesh, x.ndim))
        elif self._device is not None:
            # pinned engine (DP pool): commit the input to this
            # engine's chip so the jitted call runs there
            x = jax.device_put(x, self._device)
        else:
            # stage straight into the layout the compiled forward wants
            # (known after the first forward of this signature)
            fmt = self._input_formats.get(
                (name, tuple(x.shape), str(x.dtype)))
            if fmt is not None:
                x = jax.device_put(x, fmt)
        return x

    def forward(self) -> None:
        """Run the jitted program on the staged inputs."""
        self._require_loaded()
        missing = [n for n in self._program.input_names
                   if n not in self._staged]
        if missing:
            raise EngineStateError(f"inputs not set: {missing}")
        entry = self._auto_layout_entry()
        if entry is not None:
            compiled, formats = entry
            staged = {}
            for n, v in self._staged.items():
                fmt = formats[n]
                if getattr(v, "format", None) != fmt:
                    v = jax.device_put(v, fmt)
                staged[n] = v
            try:
                self._outputs = compiled(self._device_weights, staged)
            except ValueError as e:
                # the axon backend sometimes reports input_formats that
                # disagree with the executable's actual layout
                # requirements; the rejection message carries the
                # required major_to_minor per argument, so recover the
                # true formats from it and retry once
                fixed = _required_layouts_from_error(str(e))
                if fixed and all(n in formats for n in fixed):
                    logger.warning(
                        "AUTO-layout executable rejected its inputs; "
                        "re-staging %s in the required layouts",
                        sorted(fixed))
                    try:
                        self._repair_auto_layouts(formats, fixed)
                        staged = {n: jax.device_put(v, formats[n])
                                  for n, v in self._staged.items()}
                        self._outputs = compiled(self._device_weights,
                                                 staged)
                        if self.config.donate_inputs:
                            self._staged = {}
                        return
                    except Exception as e2:  # noqa: BLE001
                        e = e2
                # unrecoverable — degrade to default layouts for the
                # rest of this engine's life
                logger.warning(
                    "AUTO-layout executable rejected its inputs (%s); "
                    "falling back to default layouts", e)
                self._aot_cache = None
                self._outputs = self._jitted(self._device_weights,
                                             self._staged)
        else:
            self._outputs = self._jitted(self._device_weights, self._staged)
        if self.config.donate_inputs:
            self._staged = {}

    def _auto_layout_entry(self):
        """(compiled, {input: Format}) for the current staged-input
        signature, AOT-compiled with XLA-chosen argument layouts
        (EngineConfig.input_layout). None = use the default-layout jit
        (mesh configured, disabled, or the layout API failed once)."""
        if (self.config.input_layout != "auto" or self._mesh is not None
                or self._device is not None or self._aot_cache is None):
            # a pinned engine skips the AUTO-layout AOT path: it
            # compiles against the process default device
            return None
        key = tuple(sorted(
            (n, tuple(v.shape), str(v.dtype))
            for n, v in self._staged.items()))
        entry = self._aot_cache.get(key)
        if entry is None:
            try:
                entry = self._compile_auto_layout()
            except Exception as e:  # noqa: BLE001 — layout API varies
                logger.warning(
                    "AUTO input layouts unavailable (%s: %s); using "
                    "default layouts", type(e).__name__, e)
                self._aot_cache = None
                return None
            self._aot_cache[key] = entry
        return entry

    def _repair_auto_layouts(self, formats: dict, fixed: dict) -> None:
        """Replace reported-but-wrong AUTO formats with the layouts the
        executable actually requires (parsed from its rejection error).
        Mutates `formats` in place — the same dict object lives in
        `_aot_cache` — and refreshes `_input_formats` so future
        `input()` calls stage straight into the corrected layout."""
        from jax.experimental.layout import Format, Layout

        for name, mm in fixed.items():
            old = formats[name]
            formats[name] = Format(Layout(major_to_minor=mm),
                                   old.sharding)
            v = self._staged.get(name)
            if v is not None:
                self._input_formats[(name, tuple(v.shape),
                                     str(v.dtype))] = formats[name]

    def _effective_compiler_options(self) -> Optional[dict]:
        """config.xla_compiler_options (None/{} -> stock XLA). No flag
        has survived interleaved A/B measurement yet (config.py), so
        there is no auto default."""
        return self.config.xla_compiler_options or None

    def _compile_auto_layout(self):
        from jax.experimental.layout import Format, Layout

        program = self._program

        def run_fn(weights, inputs):
            return program.fn(weights, inputs)

        donate = (1,) if self.config.donate_inputs else ()
        jitted = jax.jit(run_fn,
                         in_shardings=(Format(), Format(Layout.AUTO)),
                         donate_argnums=donate)
        lowered = jitted.lower(self._device_weights, self._staged)
        opts = self._effective_compiler_options()
        try:
            compiled = lowered.compile(compiler_options=opts)
        except Exception as e:  # noqa: BLE001 — inspect, don't swallow
            # ONLY an option-rejection ("No such compile option" /
            # INVALID_ARGUMENT, possibly wrapped by a remote compile
            # service) falls back to a plain compile; genuine compile
            # failures must propagate, not silently double compile time
            msg = str(e)
            rejected = opts is not None and (
                "compile option" in msg or "INVALID_ARGUMENT" in msg)
            if not rejected:
                raise
            logger.warning(
                "compiler options %s rejected (%s); compiling without",
                opts, e)
            compiled = lowered.compile()
        formats = compiled.input_formats[0][1]
        for n, v in self._staged.items():
            self._input_formats[(n, tuple(v.shape), str(v.dtype))] = \
                formats[n]
        return compiled, formats

    def export_model(self, path: str, batch: Optional[int] = None) -> None:
        """Serialize the forward as a self-contained StableHLO artifact
        (jax.export): weights baked in as constants, one file, loadable
        by `load_exported()` in a process that never sees the pnnx
        sources or this engine's config. The deployment-artifact story
        the reference lacks (its models re-parse .pnnx.* every start).

        The artifact takes float32 inputs in the engine's io layout
        (NHWC by default) at the declared shapes; `batch` overrides the
        leading dim (the one re-jit axis). Exported for the CURRENT
        backend's lowering but as portable StableHLO — jax guarantees
        forward compatibility for serialized artifacts."""
        from jax import export as jexport

        self._require_loaded()
        if self._mesh is not None:
            raise EngineStateError(
                "export_model requires a single-device engine: a mesh "
                "engine's weights carry device-bound shardings that the "
                "loading process may not be able to satisfy. Load the "
                "model without a mesh for export; apply the mesh in the "
                "serving engine instead.")
        program = self._program
        weights = self._device_weights
        compute = self.config.compute_jnp_dtype
        io_nchw = self.config.io_layout == "nchw"

        specs = {}
        for s in program.inputs:
            if not s.shape:
                raise EngineStateError(
                    f"export needs a declared shape for input {s.name!r}")
            lead = batch if batch is not None else (
                1 if s.shape[0] == -1 else s.shape[0])
            shape = [lead, *s.shape[1:]]  # program specs are NHWC
            if io_nchw and len(shape) == 4:
                shape = [shape[0], shape[3], shape[1], shape[2]]
            specs[s.name] = jax.ShapeDtypeStruct(tuple(shape), jnp.float32)

        def run(inputs):
            cast = {k: v.astype(compute) for k, v in inputs.items()}
            if io_nchw:
                cast = {k: (jnp.transpose(v, (0, 2, 3, 1))
                            if v.ndim == 4 else v)
                        for k, v in cast.items()}
            out = dict(program.fn(weights, cast))
            # undo packed terminal layouts (Engine.extract's host-side
            # retile) so artifact consumers see logical shapes
            for name, na in program.output_transforms.items():
                v = out.get(name)
                if v is not None and na and v.ndim == 3:
                    n_, r_, c_ = v.shape
                    out[name] = jnp.reshape(v, (n_, r_ * na, c_ // na))
            if io_nchw:
                out = {k: (jnp.transpose(v, (0, 3, 1, 2))
                           if v.ndim == 4 else v)
                       for k, v in out.items()}
            return out

        exported = jexport.export(jax.jit(run))(specs)
        with open(path, "wb") as f:
            f.write(exported.serialize())
        logger.info("exported %d-input StableHLO artifact to %s",
                    len(specs), path)

    def warmup(self, batch_sizes=(1,)) -> None:
        """Compile the forward for each batch size ahead of time (batch
        is the only re-jit axis). Requires declared input shapes. The
        serving layer warms its buckets through this."""
        self._require_loaded()
        staged_backup, outputs_backup = dict(self._staged), self._outputs
        try:
            for bs in batch_sizes:
                for spec in self._program.inputs:
                    if not spec.shape:
                        raise EngineStateError(
                            f"warmup needs a declared shape for input "
                            f"{spec.name!r}")
                    if any(d == -1 for d in spec.shape[1:]):
                        # batch is the only supported re-jit axis; a
                        # fabricated size-1 stand-in would silently warm
                        # (and cache) an executable for the wrong bucket
                        raise EngineStateError(
                            f"warmup cannot pick a size for dynamic "
                            f"non-batch dim(s) of input {spec.name!r} "
                            f"(declared {spec.shape}); feed a concrete "
                            f"array via input()+forward() instead")
                    shape = [bs] + list(spec.shape[1:])
                    self.input(spec.name, np.zeros(shape, np.float32))
                self.forward()
            for v in self._outputs.values():
                np.asarray(v)  # full sync (block_until_ready may be weak)
        finally:
            self._staged, self._outputs = staged_backup, outputs_backup

    def temp_bytes(self, batch_size: int) -> Optional[int]:
        """XLA temp-buffer bytes of the compiled forward at this batch
        size (compiled.memory_analysis) — the b16/b32 spill signal: at
        b8 yolov5s compiles with temp_size=0 (fully fused), at b16 XLA
        materializes 216 MB of stage temporaries and the batch pays a
        ~24% throughput tax (docs/PERF.md). None when the backend does
        not expose the report. Compiles the shape if not cached (the
        persistent compile cache makes repeat calls cheap)."""
        self._require_loaded()
        staged = {}
        for spec in self._program.inputs:
            if not spec.shape:
                raise EngineStateError(
                    f"temp_bytes needs a declared shape for input "
                    f"{spec.name!r}")
            shape = [batch_size] + [1 if d == -1 else d
                                    for d in spec.shape[1:]]
            staged[spec.name] = self._prepare_input(
                spec.name, np.zeros(shape, np.float32))
        try:
            compiled = self._jitted.lower(
                self._device_weights, staged).compile()
            report = compiled.memory_analysis()
            return int(report.temp_size_in_bytes)
        except Exception as e:  # noqa: BLE001 — backend-dependent API
            logger.info("memory_analysis unavailable at b%d (%s: %s)",
                        batch_size, type(e).__name__, e)
            return None

    def calibrate(self, sample_batches) -> dict:
        """Static-int8 activation calibration (quant='int8' only).

        `sample_batches`: iterable of {input name: array} feeds (any
        batch size; representative data). Runs one jitted observer pass
        per batch collecting per-op activation ranges
        (quant/calibrate.py), aggregates the running max, installs
        per-tensor `act_scale` entries into the weight pytree, and
        re-places weights — the next forward() retraces onto the
        s8×s8→s32 conv/linear paths. Returns {op name: scale} for
        introspection. The reference has no quantization at all
        (SURVEY.md §2 intro); this serves the BASELINE.json INT8 target.
        """
        self._require_loaded()
        if self.config.quant != "int8":
            raise EngineStateError(
                "calibrate() requires EngineConfig(quant='int8')")
        from .quant.calibrate import build_observer_fn, scales_from_stats

        if self._observer is None:
            self._observer = jax.jit(build_observer_fn(
                self._program, self.config.act_clip_percentile,
                per_channel=self.config.act_per_channel))
        agg: dict = {}
        n_batches = 0
        for feeds in sample_batches:
            staged = {k: self._prepare_input(k, v) for k, v in feeds.items()}
            missing = [n for n in self._program.input_names
                       if n not in staged]
            if missing:
                raise EngineStateError(
                    f"calibration batch missing inputs: {missing}")
            # ONE host fetch for the whole stats dict: per-scalar
            # fetches would pay the ~26 ms relay RTT per op per batch
            stats = jax.device_get(self._observer(self._device_weights,
                                                  staged))
            for k, v in stats.items():
                v = np.asarray(v, np.float32)  # scalar or per-channel
                agg[k] = np.maximum(agg[k], v) if k in agg else v
            n_batches += 1
        if not n_batches:
            raise EngineStateError("calibrate() needs at least one batch")
        scales = scales_from_stats(agg)
        if self.config.act_per_channel:
            scales = self._balance_per_channel(scales)
        self._install_act_scales(scales)
        logger.info("calibrated %d ops over %d batches (observer=%s)",
                    len(scales), n_batches,
                    self.config.act_clip_percentile or "absmax")
        return scales

    def _balance_per_channel(self, scales: dict) -> dict:
        """Replace raw per-channel scale vectors (absmax/127) with
        SmoothQuant-balanced ones (quant/calibrate.smooth_balanced_scales)
        for ops whose weight they will fold into. save_calibration
        artifacts store the BALANCED vectors, so load_calibration folds
        them verbatim and round-trips exactly."""
        from .quant.calibrate import smooth_balanced_scales
        from .quant.tensor import QuantizedTensor

        impls = {i.name: i for i in self._program.impls}
        out = {}
        for name, s in scales.items():
            s = np.asarray(s, np.float32)
            impl = impls.get(name)
            w = self._pristine_qweights.get(name)
            if w is None:
                w = self._program.weights[name].get("weight")
            fold = impl.act_fold if impl is not None else None
            if (s.ndim == 1 and fold is not None
                    and isinstance(w, QuantizedTensor)
                    and w.data.shape[fold[1]] == s.size):
                w_fp = self._program.fp_weights.get(name)
                if w_fp is None:  # pre-quantization copy preferred
                    w_fp = np.asarray(w.dequantize())
                ic = fold[1] % w_fp.ndim
                w_ic = np.abs(w_fp).max(
                    axis=tuple(i for i in range(w_fp.ndim) if i != ic))
                out[name] = smooth_balanced_scales(s * 127.0, w_ic)
            else:
                out[name] = s
        return out

    def _install_act_scales(self, scales: dict) -> None:
        """Install per-op activation scales into the weight pytree and
        re-place weights (switches conv/linear onto s8×s8 at retrace).

        Vector (per-channel) scales are FOLDED into the op's quantized
        weight along its input-channel axis (OpImpl.act_fold): with
        w~ = w·s[ic] requantized per-out-channel and x̂ = x/s[ic], the
        s32 accumulator dequantizes by w~'s per-out-channel scale alone
        — per-channel activation quant at zero inference cost. The
        pre-fold weight is kept so re-installs (re-calibration, loading
        a different artifact) never double-fold."""
        unknown = [k for k in scales
                   if k not in self._program.weights]
        if unknown:
            raise EngineStateError(
                f"calibration names not in this model: {unknown[:5]}")
        from .quant.tensor import QuantizedTensor, quantize_per_channel

        impls = {i.name: i for i in self._program.impls}
        # restore pre-fold weights before applying the new scales; an op
        # absent from the NEW scales must also lose its old act_scale —
        # a stale per-channel vector over an unfolded weight would
        # quantize by s while the epilogue dequantizes by w_scale alone
        for opname, w0 in self._pristine_qweights.items():
            self._program.weights[opname]["weight"] = w0
            if opname not in scales:
                self._program.weights[opname].pop("act_scale", None)
        for opname, s in scales.items():
            s = np.asarray(s, np.float32)
            if s.ndim == 1:
                impl = impls.get(opname)
                w = self._program.weights[opname].get("weight")
                fold = impl.act_fold if impl is not None else None
                if (fold is None or not isinstance(w, QuantizedTensor)
                        or w.data.shape[fold[1]] != s.size):
                    logger.warning(
                        "per-channel act scale for %r cannot fold "
                        "(act_fold=%s); reducing to per-tensor",
                        opname, fold)
                    s = np.float32(s.max())
                else:
                    w0 = self._pristine_qweights.setdefault(opname, w)
                    wf = self._program.fp_weights.get(opname)
                    if wf is None:  # pre-quantization copy preferred:
                        # per-out-channel weight quant may have zeroed
                        # small input channels irrecoverably
                        wf = np.asarray(w0.dequantize())
                    wf = np.asarray(wf, np.float32)
                    bshape = [1] * wf.ndim
                    bshape[fold[1] % wf.ndim] = s.size
                    self._program.weights[opname]["weight"] = (
                        quantize_per_channel(wf * s.reshape(bshape),
                                             axis=w0.axis))
            self._program.weights[opname]["act_scale"] = s
        # chain producers (ir/passes.mark_int8_chains) requantize their
        # output to the consumer's scale: install it as out_scale.
        # Per-channel (vector) consumer scales disable the chain — the
        # producer would have to requantize per-channel while sibling
        # consumers may be per-tensor; without out_scale every consumer
        # quantizes its own input, which is always correct.
        for impl in self._program.impls:
            c = impl.q_out_consumer
            if c is None:
                continue
            s = (np.asarray(scales[c], np.float32) if c in scales
                 else None)
            if s is not None and s.ndim == 0:
                self._program.weights[impl.name]["out_scale"] = s
            else:  # vector scale or consumer absent: no chain requant
                self._program.weights[impl.name].pop("out_scale", None)
        self._device_weights = self._place_weights(self._program)
        if self._aot_cache:
            # weight pytree changed shape (act_scale/out_scale entries):
            # drop compiled-forward entries lowered against the old tree
            self._aot_cache = {}
            self._input_formats = {}

    def save_calibration(self, path: str) -> None:
        """Persist the installed activation scales as an npz artifact,
        so production engines can load offline calibration instead of
        re-running sample batches (`load_calibration`). The artifact is
        {op name: f32 scalar scale} — model-specific but batch-size and
        dtype-config independent."""
        self._require_loaded()
        scales = {name: w["act_scale"]
                  for name, w in self._program.weights.items()
                  if isinstance(w, dict) and "act_scale" in w}
        if not scales:
            raise EngineStateError(
                "no activation scales installed; run calibrate() first")
        # write through a file object: np.savez would otherwise append
        # ".npz" to a bare path, breaking save(path) -> load(path)
        with open(path, "wb") as f:
            np.savez(f, **scales)

    def load_calibration(self, path: str) -> dict:
        """Install activation scales from a `save_calibration` artifact.
        Requires quant='int8'. Returns the {op name: scale} dict."""
        self._require_loaded()
        if self.config.quant != "int8":
            raise EngineStateError(
                "load_calibration() requires EngineConfig(quant='int8')")
        with np.load(path) as z:
            # scalar (per-tensor) or vector (per-channel) scales
            scales = {k: np.asarray(z[k], np.float32) for k in z.files}
        self._install_act_scales(scales)
        logger.info("loaded calibration for %d ops from %s",
                    len(scales), path)
        return scales

    def block_until_ready(self) -> None:
        for v in self._outputs.values():
            v.block_until_ready()

    def extract(self, name: str, as_numpy: bool = True):
        """Fetch a named output of the last forward()."""
        self._require_loaded()
        if name not in self._outputs:
            if name in self._program.output_names:
                raise EngineStateError("forward() has not been run")
            raise KeyError(
                f"unknown output {name!r}; outputs are "
                f"{self._program.output_names}")
        out = self._outputs[name]
        na = self._program.output_transforms.get(name)
        if na and out.ndim == 3:
            # packed terminal output (OpImpl.host_output_retile): the
            # row-major bytes already match the logical [N,R*na,c]
            # shape, so the host reshape is free; device-side consumers
            # (as_numpy=False) pay a jnp.reshape instead — the same
            # retile the device used to do unconditionally
            n, r, c = out.shape
            if as_numpy:
                return np.asarray(out).reshape(n, r * na, c // na)
            out = jnp.reshape(out, (n, r * na, c // na))
        if self.config.io_layout == "nchw" and out.ndim == 4:
            # the io_layout contract applies to device-side consumers
            # (as_numpy=False) too — a jnp transpose, fused downstream
            out = jnp.transpose(out, (0, 3, 1, 2))
        return np.asarray(out) if as_numpy else out

    def run(self, inputs: Optional[dict] = None, **named) -> dict:
        """One-shot: stage inputs, forward, return all outputs (numpy)."""
        feeds = dict(inputs or {})
        feeds.update(named)
        for k, v in feeds.items():
            self.input(k, v)
        self.forward()
        return {n: self.extract(n) for n in self.output_names}

    # ---- internals ---------------------------------------------------
    def _require_loaded(self) -> None:
        if self._program is None:
            raise EngineStateError("no model loaded")

    def _cast(self, w, key: str, fp32_keys: tuple):
        """Store float weights at the compute dtype so forward passes
        read half the HBM bytes and skip per-call converts; fp32_keys
        (e.g. YOLO grids) and quantized tensors are left alone."""
        if isinstance(w, (QuantizedTensor, Quantized4Tensor)):
            return w
        w = jnp.asarray(w)
        dtype = self.config.compute_jnp_dtype
        if (w.dtype == jnp.float32 and dtype != jnp.float32
                and key not in fp32_keys):
            return w.astype(dtype)
        return w

    def _place_weights(self, program: Program):
        """Move weights to device — cast to the compute dtype, sharded
        per each OpImpl's shard_hints when a mesh is configured."""
        fp32_keys = {impl.name: impl.fp32_keys for impl in program.impls}
        if self._mesh is None:
            place = ((lambda w: w) if self._device is None
                     else (lambda w: self._put_single(w, self._device)))
            return {
                opname: {k: place(self._cast(w, k,
                                             fp32_keys.get(opname, ())))
                         for k, w in wdict.items()}
                for opname, wdict in program.weights.items()}
        placed = {}
        hints = {impl.name: impl.shard_hints for impl in program.impls}
        for opname, wdict in program.weights.items():
            shardings = weight_shardings(self._mesh, wdict,
                                         hints.get(opname, {}))
            placed[opname] = {
                k: self._put(self._cast(w, k, fp32_keys.get(opname, ())),
                             shardings[k])
                for k, w in wdict.items()}
        return placed

    @staticmethod
    def _put_single(w, dev):
        """Commit one weight to a pinned device (config.device_index).
        Committed weights make jit run the program on that device, so a
        DP pool's engines compute concurrently on their own chips."""
        if isinstance(w, QuantizedTensor):
            return QuantizedTensor(
                data=jax.device_put(jnp.asarray(w.data), dev),
                scale=jax.device_put(jnp.asarray(w.scale), dev),
                axis=w.axis)
        if isinstance(w, Quantized4Tensor):
            return Quantized4Tensor(
                packed=jax.device_put(jnp.asarray(w.packed), dev),
                scale=jax.device_put(jnp.asarray(w.scale), dev),
                group=w.group, k=w.k)
        return jax.device_put(jnp.asarray(w), dev)

    def _put(self, w, sharding):
        if isinstance(w, QuantizedTensor):
            # shard the int8 payload per hint; scales follow the same
            # output-channel axis (1-D vector)
            data = jax.device_put(jnp.asarray(w.data), sharding)
            axis_spec = sharding.spec[w.axis] if w.axis < len(
                sharding.spec) else None
            from jax.sharding import NamedSharding, PartitionSpec as P
            scale_sh = NamedSharding(self._mesh, P(axis_spec))
            scale = jax.device_put(jnp.asarray(w.scale), scale_sh)
            return QuantizedTensor(data=data, scale=scale, axis=w.axis)
        return jax.device_put(jnp.asarray(w), sharding)


def load_exported(path: str):
    """Load a StableHLO artifact written by Engine.export_model.

    Returns fn(inputs: dict[str, array]) -> dict[str, np.ndarray] — a
    self-contained compiled forward (weights baked in); the loading
    process needs neither the pnnx sources nor the exporting engine's
    config."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(inputs: dict) -> dict:
        out = exported.call({k: jnp.asarray(v, jnp.float32)
                             for k, v in inputs.items()})
        return {k: np.asarray(v) for k, v in out.items()}

    return call
