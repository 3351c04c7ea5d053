"""E2E engine A/B: C3 fusion on vs off, interleaved medians.

The receipt format for the round-5 stem-fusion lever: same model, same
quant mode, two engines differing ONLY in EngineConfig.c3_fusion,
measured round-robin with chip-factor anchors (within-run interleaved
columns are the only drift-comparable numbers — docs/PERF.md).

Usage: python scripts/c3_e2e_ab.py [--cases l:16:int8,s:8:int8w]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

from simpleinfer_tpu import Engine, EngineConfig  # noqa: E402
from simpleinfer_tpu.profiling import (chip_speed_factor,  # noqa: E402
                                       measure_device_time)
from simpleinfer_tpu.zoo import build_yolov5  # noqa: E402


def prepare(variant, batch, quant, c3_fusion, img=640):
    import jax.numpy as jnp

    cfg = EngineConfig(
        compute_dtype="float32" if quant == "fp32" else "bfloat16",
        quant=None if quant in ("fp32", "bf16") else quant,
        c3_fusion=c3_fusion)
    graph, in_name, out_name = build_yolov5(variant, batch=batch,
                                            image_size=img)
    eng = Engine(cfg).load_model(None, graph=graph)
    x_np = (np.random.default_rng(0).standard_normal(
        (batch, img, img, 3)).astype(np.float32) / 4.0)
    if cfg.quant == "int8":
        eng.calibrate([{in_name: x_np}])
    t0 = time.perf_counter()
    eng.input(in_name, x_np)
    eng.forward()
    out_ref = np.asarray(eng.extract(out_name))
    print(f"  {variant}:{quant}:fusion={c3_fusion} compiled in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr,
          flush=True)
    program, weights = eng.program, eng._device_weights
    xs = program.pack_input(in_name, jnp.asarray(
        x_np, cfg.compute_jnp_dtype))

    def fwd(xi):
        return program.fn(weights, {in_name: xi})[out_name]

    n_fused = [i.type for i in program.impls].count("si.FusedC3")
    return fwd, xs, eng._effective_compiler_options(), out_ref, n_fused


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="l:16:int8,s:8:int8w")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--img", type=int, default=640)
    args = ap.parse_args()

    cases = []
    for spec in args.cases.split(","):
        variant, batch, quant = spec.split(":")
        cases.append((variant, int(batch), quant))

    prepared = {}
    for variant, batch, quant in cases:
        label = f"yolov5{variant}-{args.img}-b{batch}-{quant}"
        fused = prepare(variant, batch, quant, True, args.img)
        plain = prepare(variant, batch, quant, False, args.img)
        # output parity at the engine surface (quant-level tolerance)
        rel = (np.abs(fused[3] - plain[3]).max()
               / max(np.abs(plain[3]).max(), 1e-6))
        print(f"{label}: {fused[4]} fused C3 blocks, output rel-diff "
              f"{rel:.4f}", flush=True)
        prepared[label] = (fused, plain, batch)

    res = {}
    for rnd in range(args.rounds):
        cf = chip_speed_factor()
        print(f"-- round {rnd} chip factor {cf:.2f}", flush=True)
        for label, (fused, plain, batch) in prepared.items():
            for name, (fwd, xs, opts, _ref, _n) in (
                    ("fused", fused), ("plain", plain)):
                dt = measure_device_time(fwd, xs, iters=args.iters,
                                         compiler_options=opts)
                res.setdefault((label, name), []).append(dt)
                print(f"  {label:28s} {name:6s}: {dt * 1e3:7.3f} ms "
                      f"({batch / dt:7.1f} img/s)", flush=True)

    print("\nmedians:", flush=True)
    for label, (_f, _p, batch) in prepared.items():
        tf = sorted(res[(label, "fused")])[args.rounds // 2]
        tp = sorted(res[(label, "plain")])[args.rounds // 2]
        print(f"  {label:28s}: plain {tp * 1e3:7.3f} ms  fused "
              f"{tf * 1e3:7.3f} ms -> {tp / tf:.3f}x "
              f"({batch / tf:.0f} img/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
