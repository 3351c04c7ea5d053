"""Measured per-HLO-op device profile of a zoo model.

Builds an Engine for a zoo model, compiles the forward, traces N
enqueued forwards with jax.profiler, and prints xprof's hlo_stats:
per-op self time, achieved GFLOP/s, memory bandwidth, and bound-by —
the measured complement of `python -m simpleinfer_tpu roofline`
(static accounting). The reference has no profiler at all
(SURVEY.md §5 "Tracing/profiling: none").

Usage:
  python scripts/profile_model.py --model yolov5s --batch 8 --img 640 \
      --config bf16 --iters 10 --top 40
Must run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (set
automatically when possible).
"""
import argparse
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def build(model: str, batch: int, img: int):
    from simpleinfer_tpu import zoo

    if model.startswith("yolov5"):
        return zoo.build_yolov5(model[-1], batch=batch, image_size=img)
    if model.startswith("yolov8"):
        return zoo.build_yolov8(model[-1], batch=batch, image_size=img)
    if model == "resnet18":
        return zoo.build_resnet18(batch=batch, image_size=img)
    if model == "resnet50":
        return zoo.build_resnet50(batch=batch, image_size=img)
    if model == "mobilenet":
        return zoo.build_mobilenet_like(batch=batch, image_size=img)
    if model == "mobilenet_v3":
        return zoo.build_mobilenet_v3_like(batch=batch, image_size=img)
    raise SystemExit(f"unknown model {model}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov5s")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--config", default="bf16",
                    choices=["fp32", "bf16", "int8w", "int8"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/si_device_profile")
    args = ap.parse_args()

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.profiling import device_profile, format_hlo_stats

    cfg = {
        "fp32": EngineConfig(),
        "bf16": EngineConfig(compute_dtype="bfloat16"),
        "int8w": EngineConfig(compute_dtype="bfloat16", quant="int8w"),
        "int8": EngineConfig(compute_dtype="bfloat16", quant="int8"),
    }[args.config]

    graph, in_name, out_name = build(args.model, args.batch, args.img)
    eng = Engine(cfg).load_model(None, graph=graph)
    x_np = (np.random.default_rng(0)
            .standard_normal((args.batch, args.img, args.img, 3))
            .astype(np.float32) / 4.0)
    if cfg.quant == "int8":
        eng.calibrate([{in_name: x_np}])

    t0 = time.perf_counter()
    eng.input(in_name, x_np)
    eng.forward()
    np.asarray(eng.extract(out_name))
    print(f"compiled in {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    import jax.numpy as jnp
    weights, program = eng._device_weights, eng.program
    # stem-packed, like Engine.input() stages it (free reshape)
    x = program.pack_input(in_name,
                           jnp.asarray(x_np, cfg.compute_jnp_dtype))

    def fwd(xi):
        return program.fn(weights, {in_name: xi})[out_name]

    rows = device_profile(fwd, x, iters=args.iters, logdir=args.logdir)
    print(format_hlo_stats(rows, top=args.top, iters=args.iters))
    return 0


if __name__ == "__main__":
    sys.exit(main())
