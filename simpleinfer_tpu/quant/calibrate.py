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


def _tensor_stat(a, percentile: Optional[float], axis: Optional[int] = None):
    """abs-max (or percentile of |x|) of one activation — an f32 scalar,
    or a per-channel f32 vector over `axis` (OpImpl.act_fold).
    PackedW carriers (ops/conv.py) hold the same values as their logical
    tensor, so the stat is taken on the raw packed data; re-calibration
    over an active int8 chain sees QuantizedActivation carriers, whose
    real values need the scale applied."""
    from .tensor import QuantizedActivation

    if isinstance(a, QuantizedActivation):
        a = a.dequantize(jnp.float32)
    data = getattr(a, "data", a)  # PackedW -> underlying array
    mag = jnp.abs(data.astype(jnp.float32))
    if axis is not None:
        c = mag.shape[axis]
        flat = jnp.moveaxis(mag, axis, -1).reshape(-1, c)
        if percentile is not None:
            return jnp.quantile(flat, percentile / 100.0, axis=0)
        return jnp.max(flat, axis=0)
    if percentile is not None:
        return jnp.quantile(mag.reshape(-1), percentile / 100.0)
    return jnp.max(mag)


def build_observer_fn(program, percentile: Optional[float] = None,
                      per_channel: bool = False):
    """fn(weights, inputs) -> {op name: f32 activation stat} for every
    act_quant op in the plan. Jittable; runs the full forward. Stats are
    scalars, or per-channel vectors for single-input ops advertising
    OpImpl.act_fold when `per_channel` is set."""
    plan = program.plan

    def fn(weights, inputs):
        env = (program.wrap_inputs(inputs) if program.wrap_inputs
               else dict(inputs))
        stats = {}
        for impl, in_names, out_names in plan:
            args = [env[n] for n in in_names]
            if impl.act_quant and args:
                axis = (impl.act_fold[0]
                        if per_channel and impl.act_fold
                        and len(args) == 1 else None)
                vals = [_tensor_stat(a, percentile, axis) for a in args]
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


def smooth_balanced_scales(act_absmax, w_ic_absmax, alpha: float = 0.5):
    """Balanced per-channel activation scales (the SmoothQuant
    equivalent-transform, Xiao et al. 2022): folding raw per-channel act
    scales into the weight (alpha=1) merely MOVES channel skew from the
    activation into the per-out-channel weight quantization; splitting
    it — s_ic = act_max^alpha / w_max^(1-alpha) — halves the dynamic
    range both sides pay (in log space).

    Returns v (f32, per input channel) such that x_hat = x / v is int8
    with max |x_hat| = 127, and w·v requantized per-out-channel carries
    the rest; the s32 epilogue dequant is the folded weight's
    per-out-channel scale alone (ops/conv.int8_epilogue convention)."""
    import numpy as np

    act = np.maximum(np.asarray(act_absmax, np.float64), 1e-8)
    wm = np.maximum(np.asarray(w_ic_absmax, np.float64), 1e-8)
    s = np.maximum(act ** alpha / wm ** (1.0 - alpha), 1e-8)
    t = max(float((act / s).max()) / 127.0, 1e-12)
    return (s * t).astype(np.float32)


def scales_from_stats(stats: dict) -> dict:
    """Aggregated abs-max stats -> symmetric scales: f32 scalars for
    per-tensor stats, f32 vectors for per-channel stats."""
    import numpy as np

    return {k: np.asarray(np.maximum(np.asarray(v, np.float32), 1e-8)
                          / 127.0, np.float32)
            for k, v in stats.items()}
