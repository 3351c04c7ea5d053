"""Static activation calibration for full-int8 inference.

The reference is FP32-only (SURVEY.md §2 intro) — there is nothing to
mirror; this subsystem exists because the north-star metric
(/root/repo/BASELINE.json) is INT8 images/sec/chip within an accuracy
budget. Design:

- `build_observer_fn(program)` re-runs the lowered plan (executor.py
  Program.plan) and, for every op that can consume int8 activations
  (`OpImpl.act_quant`), records a per-tensor statistic of its input
  activations: abs-max by default, or a high percentile of |x| when
  `EngineConfig.act_clip_percentile` is set (outliers then saturate in
  `quantize_act`, buying resolution for the bulk of the distribution).
- The whole observer is one jitted program: calibration batches run at
  inference speed, stats come back as a dict of f32 scalars.
- `Engine.calibrate` aggregates the running max across batches and turns
  stats into per-op scales `absmax / 127`, stored as an `act_scale`
  entry in the op's weight dict. Presence of that entry switches the
  conv/linear lowering onto the s8×s8→s32 path at the next trace (the
  weights pytree changed, so jax.jit retraces automatically).

Calibration runs with weights ALREADY int8-quantized (build_program
quantizes at load for quant="int8"), so observed ranges include the
weight-quantization error — scales calibrate the network that will
actually run, not its fp parent.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _tensor_stat(a, percentile: Optional[float]):
    """abs-max (or percentile of |x|) of one activation as an f32 scalar.
    PackedW carriers (ops/conv.py) hold the same values as their logical
    tensor, so the stat is taken on the raw packed data; re-calibration
    over an active int8 chain sees QuantizedActivation carriers, whose
    real values need the scale applied."""
    from .tensor import QuantizedActivation

    if isinstance(a, QuantizedActivation):
        a = a.dequantize(jnp.float32)
    data = getattr(a, "data", a)  # PackedW -> underlying array
    mag = jnp.abs(data.astype(jnp.float32))
    if percentile is not None:
        return jnp.quantile(mag.reshape(-1), percentile / 100.0)
    return jnp.max(mag)


def build_observer_fn(program, percentile: Optional[float] = None):
    """fn(weights, inputs) -> {op name: f32 scalar activation stat} for
    every act_quant op in the plan. Jittable; runs the full forward."""
    plan = program.plan

    def fn(weights, inputs):
        env = (program.wrap_inputs(inputs) if program.wrap_inputs
               else dict(inputs))
        stats = {}
        for impl, in_names, out_names in plan:
            args = [env[n] for n in in_names]
            if impl.act_quant and args:
                vals = [_tensor_stat(a, percentile) for a in args]
                stats[impl.name] = (vals[0] if len(vals) == 1
                                    else jnp.max(jnp.stack(vals)))
            out = impl.apply(weights[impl.name], *args)
            if impl.n_outputs == 1:
                env[out_names[0]] = out
            else:
                for n, o in zip(out_names, out):
                    env[n] = o
        return stats

    return fn


def scales_from_stats(stats: dict) -> dict:
    """Aggregated abs-max stats -> symmetric per-tensor scales."""
    import numpy as np

    return {k: np.float32(max(float(v), 1e-8) / 127.0)
            for k, v in stats.items()}
