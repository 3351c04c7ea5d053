"""A/B: per-compile XLA compiler options on the headline program.

Conv fusions are ~90% of the yolov5s-640-b8 device time (docs/PERF.md),
so the remaining levers are compiler scheduling/fusion knobs rather
than graph rewrites. This sweeps candidate TPU backend options through
`jitted.lower(...).compile(compiler_options=...)` — per-executable, no
process restart, measured with the two-point chained loop so results
are device-time accurate. The reference has no compiler to tune; this
is the TPU analog of its build-time SIMD flag choices
(/root/reference/xmake.lua:32-34).

Usage:
    python scripts/xla_flags_experiment.py [--config int8w] [--iters 12]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402

# each entry: (label, {option: value}) — compiled + measured separately;
# values must be typed (int/bool), not strings. Unknown options fail
# that candidate only (INVALID_ARGUMENT from the backend).
CANDIDATES = [
    ("baseline", {}),
    ("vmem-32M", {"xla_tpu_scoped_vmem_limit_kib": 32768}),
    ("vmem-64M", {"xla_tpu_scoped_vmem_limit_kib": 65536}),
    ("vmem-96M", {"xla_tpu_scoped_vmem_limit_kib": 98304}),
    ("lhs-sched", {"xla_tpu_enable_latency_hiding_scheduler": True}),
    ("vmem64+lhs", {"xla_tpu_scoped_vmem_limit_kib": 65536,
                    "xla_tpu_enable_latency_hiding_scheduler": True}),
    ("no-rwb-fusion", {"xla_tpu_rwb_fusion": False}),
    # round 2: combinations on top of the confirmed rwb win
    ("rwb+dotdot", {"xla_tpu_rwb_fusion": False,
                    "xla_tpu_dot_dot_fusion": False}),
    ("rwb+nodsr", {"xla_tpu_rwb_fusion": False,
                   "xla_tpu_enable_dot_strength_reduction": False}),
    ("rwb+vmem32", {"xla_tpu_rwb_fusion": False,
                    "xla_tpu_scoped_vmem_limit_kib": 32768}),
    ("rwb+lhs", {"xla_tpu_rwb_fusion": False,
                 "xla_tpu_enable_latency_hiding_scheduler": True}),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="int8w",
                    choices=["fp32", "bf16", "int8w"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--only", default=None,
                    help="comma-separated candidate labels to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.profiling import measure_device_time
    from simpleinfer_tpu.zoo import build_yolov5

    cfg = {
        "fp32": EngineConfig(),
        "bf16": EngineConfig(compute_dtype="bfloat16"),
        "int8w": EngineConfig(compute_dtype="bfloat16", quant="int8w"),
    }[args.config]
    graph, in_name, out_name = build_yolov5("s", batch=args.batch,
                                            image_size=args.img)
    eng = Engine(cfg).load_model(None, graph=graph)
    program, weights = eng.program, eng._device_weights
    x = jnp.asarray(np.asarray(program.pack_input(
        in_name, (np.random.default_rng(0).standard_normal(
            (args.batch, args.img, args.img, 3)).astype(np.float32) / 4))),
        cfg.compute_jnp_dtype)

    def fwd(xi):
        return program.fn(weights, {in_name: xi})[out_name]

    wanted = (set(w.strip() for w in args.only.split(","))
              if args.only else None)
    results = {}
    for label, opts in CANDIDATES:
        if wanted is not None and label not in wanted:
            continue
        t0 = time.perf_counter()
        try:
            dt = measure_device_time(fwd, x, iters=args.iters,
                                     compiler_options=opts or None)
        except Exception as e:  # noqa: BLE001 — option may be unknown
            print(f"{label:16s} FAILED {type(e).__name__}: {e}")
            continue
        results[label] = dt
        print(f"{label:16s} {dt * 1e3:7.3f} ms/batch  "
              f"{args.batch / dt:8.1f} img/s  "
              f"(compile+measure {time.perf_counter() - t0:.0f}s)",
              flush=True)
    if "baseline" in results:
        base = results["baseline"]
        for label, dt in results.items():
            if label != "baseline":
                print(f"{label:16s} vs baseline: {base / dt:6.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
