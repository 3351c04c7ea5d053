"""Reproduce the BASELINE.json measurement configs on the local chip(s).

Produces the numbers table the reference never published (BASELINE.md):
one JSON line per config, then a markdown summary on stderr. Configs
needing multi-host hardware (v5e-16) run in single-chip form and are
marked as such.

    python scripts/baseline_table.py            # full run (slow: compiles)
    python scripts/baseline_table.py --quick    # smaller batches
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def measure(build_fn, cfg, batch, img, iters=20, **kw):
    import jax.numpy as jnp

    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.profiling import measure_device_time

    graph, in_name, out_name = build_fn(batch=batch, image_size=img, **kw)
    eng = Engine(cfg).load_model(None, graph=graph)
    if cfg.quant == "int8":
        # static activation int8: calibrate on one representative batch
        calib = (np.random.default_rng(1).standard_normal(
            (batch, img, img, 3)).astype(np.float32) / 4)
        eng.calibrate([{in_name: calib}])
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, img, img, 3)).astype(np.float32) / 4,
        cfg.compute_jnp_dtype)
    w, p = eng._device_weights, eng.program
    dt = measure_device_time(lambda xi: p.fn(w, {in_name: xi})[out_name],
                             x, iters=iters)
    gflop = p.flops_per_item * batch / 1e9
    eng.release()
    return dt, batch / dt, gflop / dt / 1e3  # s, img/s, TFLOP/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated config-label prefixes to run")
    args = ap.parse_args()

    from simpleinfer_tpu import EngineConfig
    from simpleinfer_tpu.zoo import (
        build_resnet18,
        build_resnet50,
        build_yolov5,
    )

    fp32 = EngineConfig()
    bf16 = EngineConfig(compute_dtype="bfloat16")
    int8w = EngineConfig(compute_dtype="bfloat16", quant="int8w")
    # static activation int8 (calibrated s8xs8 convs): wins on
    # wide-channel models (yolov5l 1.17x bf16, docs/PERF.md)
    int8s = EngineConfig(compute_dtype="bfloat16", quant="int8")

    b_large = 32 if args.quick else 128
    rows = [
        # (config label, build, cfg, batch, img, kwargs)
        ("1: resnet18 224 b1 fp32", build_resnet18, fp32, 1, 224, {}),
        ("2: yolov5s 640 b1 fp32", build_yolov5, fp32, 1, 640,
         {"variant": "s"}),
        ("3: yolov5s 640 b32 int8w", build_yolov5, int8w, 32, 640,
         {"variant": "s"}),
        ("4a: resnet50 224 b%d int8-static" % b_large, build_resnet50,
         int8s, b_large, 224, {}),
        ("4b: yolov5l 640 b16 int8-static", build_yolov5, int8s, 16, 640,
         {"variant": (1.0, 1.0)}),
        ("5: yolov5l 640 b16 bf16 (single-chip form)", build_yolov5, bf16,
         16, 640, {"variant": (1.0, 1.0)}),
    ]
    print("| config | ms/batch | img/s/chip | TFLOP/s |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    wanted = ([w.strip() for w in args.only.split(",")]
              if args.only else None)
    for label, fn, cfg, batch, img, kw in rows:
        if wanted is not None and not any(
                label.startswith(w) for w in wanted):
            continue
        try:
            dt, ips, tf = measure(fn, cfg, batch, img, **kw)
            print(json.dumps({"config": label,
                              "ms_per_batch": round(dt * 1e3, 3),
                              "images_per_sec": round(ips, 1),
                              "tflops": round(tf, 1)}), flush=True)
            print(f"| {label} | {dt * 1e3:.2f} | {ips:.0f} | {tf:.1f} |",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"config": label,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
