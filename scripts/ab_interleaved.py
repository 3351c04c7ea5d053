"""Interleaved A/B harness — the only valid comparison on this chip.

docs/PERF.md "measurement trap": sequential same-process A/Bs are
confounded by 2x+ same-day drift. This harness compiles every variant
of the headline workload ONCE, then measures them round-robin in R
rounds seconds apart, reporting per-variant medians and the cross-round
spread, plus the chip_speed_factor before/after. Differences that
survive this protocol are real.

Usage:
    python scripts/ab_interleaved.py [--rounds 3] [--iters 12] \
        [--variants bf16,bf16-nofuse,int8w]
"""
import argparse
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def build_variants(wanted, batch, img, model="s"):
    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.zoo import build_yolov5

    cfgs = {
        "fp32": EngineConfig(),
        "bf16": EngineConfig(compute_dtype="bfloat16"),
        "bf16-nofuse": EngineConfig(compute_dtype="bfloat16", fuse=False),
        "int8w": EngineConfig(compute_dtype="bfloat16", quant="int8w"),
        "int8": EngineConfig(compute_dtype="bfloat16", quant="int8"),
    }
    import jax.numpy as jnp

    out = {}
    x_np = (np.random.default_rng(0)
            .standard_normal((batch, img, img, 3)).astype(np.float32) / 4)
    for name in wanted:
        cfg = cfgs[name]
        graph, in_name, out_name = build_yolov5(model, batch=batch,
                                                image_size=img)
        eng = Engine(cfg).load_model(None, graph=graph)
        if cfg.quant == "int8":
            eng.calibrate([{in_name: x_np}])
        program, weights = eng.program, eng._device_weights
        x = jnp.asarray(np.asarray(program.pack_input(in_name, x_np)),
                        cfg.compute_jnp_dtype)

        def fwd(xi, program=program, weights=weights, in_name=in_name,
                out_name=out_name):
            return program.fn(weights, {in_name: xi})[out_name]

        out[name] = (fwd, x)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--variants", default="bf16,bf16-nofuse,int8w")
    ap.add_argument("--model", default="s",
                    help="yolov5 variant letter (n/s/m/l/x)")
    args = ap.parse_args()

    from simpleinfer_tpu.profiling import chip_speed_factor, \
        measure_device_time

    wanted = [w.strip() for w in args.variants.split(",") if w.strip()]
    variants = build_variants(wanted, args.batch, args.img, args.model)

    print(f"chip_speed_factor before: {chip_speed_factor():.3f}",
          flush=True)
    # warm every variant's plain + loop executables first (so rounds are
    # seconds apart, not compile-minutes apart)
    times = {name: [] for name in wanted}
    for r in range(args.rounds):
        for name in wanted:
            fwd, x = variants[name]
            dt = measure_device_time(fwd, x, iters=args.iters)
            times[name].append(dt)
        print(f"round {r}: " + "  ".join(
            f"{n} {times[n][-1] * 1e3:.3f}ms" for n in wanted), flush=True)
    print(f"chip_speed_factor after: {chip_speed_factor():.3f}",
          flush=True)

    print("\nvariant        median      min..max       img/s(med)")
    meds = {}
    for name in wanted:
        ts = times[name]
        m = statistics.median(ts)
        meds[name] = m
        print(f"{name:12s} {m * 1e3:8.3f}ms {min(ts) * 1e3:7.3f}.."
              f"{max(ts) * 1e3:7.3f}  {args.batch / m:9.1f}")
    base = wanted[0]
    for name in wanted[1:]:
        print(f"{base} / {name}: {meds[name] / meds[base]:.3f}x "
              f"({base} is that much faster)" if meds[name] > meds[base]
              else f"{name} vs {base}: {meds[base] / meds[name]:.3f}x "
                   f"faster")
    return 0


if __name__ == "__main__":
    sys.exit(main())
