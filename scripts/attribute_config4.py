"""Where do config-4's milliseconds go? (round-4 verdict item 2)

yolov5l 640 b16 int8-static measured 12.29 ms (~140 TFLOP/s — 36% of
the 394-TOPS int8 MXU). This script attributes the gap with the
profiler-independent prefix-slicing harness
(profiling.attribute_slices): ~n_slices prefix programs, two-point
device timing, consecutive differences = per-segment cost, each
reported against the int8 and bf16 rooflines.

Usage: python scripts/attribute_config4.py [--batch 16] [--slices 12]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--variant", default="l")
    ap.add_argument("--slices", type=int, default=12)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--quant", default="int8",
                    choices=["int8", "int8w", "none"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.profiling import (attribute_slices,
                                           chip_speed_factor,
                                           measure_device_time)
    from simpleinfer_tpu.zoo import build_yolov5

    cfg = EngineConfig(compute_dtype="bfloat16",
                       quant=None if args.quant == "none" else args.quant)
    graph, in_name, out_name = build_yolov5(args.variant,
                                            batch=args.batch,
                                            image_size=args.img)
    eng = Engine(cfg).load_model(None, graph=graph)
    x_np = (np.random.default_rng(0).standard_normal(
        (args.batch, args.img, args.img, 3)).astype(np.float32) / 4.0)
    if cfg.quant == "int8":
        eng.calibrate([{in_name: x_np}])

    factor = chip_speed_factor()
    print(f"chip_speed_factor before: {factor:.3f}", flush=True)

    program, weights = eng.program, eng._device_weights
    xs = program.pack_input(in_name, jnp.asarray(
        x_np, cfg.compute_jnp_dtype))

    # the fused whole-model reference time first
    def full(xi):
        return program.fn(weights, {in_name: xi})[out_name]

    t_full = measure_device_time(full, xs, iters=args.iters,
                                 compiler_options=eng.
                                 _effective_compiler_options())
    print(f"full fused forward: {t_full * 1e3:.3f} ms "
          f"({args.batch / t_full:.1f} img/s)", flush=True)

    rows = attribute_slices(program, weights, {in_name: xs},
                            n_slices=args.slices, iters=args.iters,
                            compiler_options=eng.
                            _effective_compiler_options())
    t_sum = sum(r[2] for r in rows) or 1e-9
    print(f"\nsegments sum {t_sum * 1e3:.3f} ms vs fused "
          f"{t_full * 1e3:.3f} ms (boundary smear "
          f"{(t_sum / t_full - 1) * 100:+.1f}%)")
    print(f"\n{'segment':44s} {'ms':>8s} {'%':>5s} {'GFLOP':>8s} "
          f"{'TFLOP/s':>8s} {'%int8pk':>7s} {'%bf16pk':>7s}")
    for label, ops, t, flops in rows:
        fl = flops * args.batch
        tf = fl / t / 1e12 if t > 0 else float("nan")
        print(f"{label[:44]:44s} {t * 1e3:8.3f} {t / t_sum * 100:5.1f} "
              f"{fl / 1e9:8.1f} {tf:8.1f} {tf / 394 * 100:7.1f} "
              f"{tf / 197 * 100:7.1f}")
    print(f"\nchip_speed_factor after: {chip_speed_factor():.3f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
