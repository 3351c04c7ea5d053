"""Scaling sweep: throughput vs mesh size (BASELINE.json configs 4-5).

On real multi-chip hardware this produces the 1-chip / 1-host / N-host
scaling table; without it (this repo's CI), it runs the identical code
path on a simulated CPU mesh (--xla_force_host_platform_device_count)
to validate that the sharded program compiles and the per-device batch
math is right. Usage:

    python scripts/scaling_sweep.py                 # real backend
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_sweep.py --sim
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sim", action="store_true",
                    help="force the CPU backend (simulated mesh)")
    ap.add_argument("--variant", default="n")
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.sim:
        jax.config.update("jax_platforms", "cpu")

    from simpleinfer_tpu import Engine, EngineConfig, MeshConfig
    from simpleinfer_tpu.zoo import build_yolov5

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    rows = []
    for d in sizes:
        batch = args.per_device_batch * d
        cfg = EngineConfig(
            compute_dtype="bfloat16" if not args.sim else "float32",
            mesh=MeshConfig(data=d, model=1) if d > 1 else None)
        graph, in_name, out_name = build_yolov5(
            args.variant, batch=batch, image_size=args.img)
        eng = Engine(cfg).load_model(None, graph=graph)
        x = np.random.default_rng(0).standard_normal(
            (batch, args.img, args.img, 3)).astype(np.float32) / 4
        eng.input(in_name, x)
        eng.forward()
        np.asarray(eng.extract(out_name))  # sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            eng.forward()
        np.asarray(eng.extract(out_name))
        dt = (time.perf_counter() - t0) / args.iters
        ips = batch / dt
        rows.append({"devices": d, "batch": batch,
                     "ms_per_batch": round(dt * 1e3, 2),
                     "images_per_sec": round(ips, 1),
                     "scaling_vs_1": round(
                         ips / rows[0]["images_per_sec"], 2) if rows
                     else 1.0})
        eng.release()
        print(json.dumps(rows[-1]), flush=True)

    if len(rows) > 1:
        eff = rows[-1]["images_per_sec"] / (
            rows[0]["images_per_sec"] * rows[-1]["devices"])
        print(f"# parallel efficiency at {rows[-1]['devices']} devices: "
              f"{eff:.0%}", flush=True)

    # batch-1 latency row: spatial(+model) sharding — the axes that can
    # fill a mesh when DP cannot (MeshConfig.spatial; GSPMD halo)
    if n_dev >= 4:
        cfg = EngineConfig(
            compute_dtype="bfloat16" if not args.sim else "float32",
            mesh=MeshConfig(data=1, spatial=2, model=2))
        graph, in_name, out_name = build_yolov5(
            args.variant, batch=1, image_size=args.img)
        eng = Engine(cfg).load_model(None, graph=graph)
        x = np.random.default_rng(0).standard_normal(
            (1, args.img, args.img, 3)).astype(np.float32) / 4
        eng.input(in_name, x)
        eng.forward()
        np.asarray(eng.extract(out_name))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            eng.forward()
        np.asarray(eng.extract(out_name))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"devices": 4, "mesh": "1x2sp x2tp", "batch": 1,
                          "ms_per_batch": round(dt * 1e3, 2)}), flush=True)
        eng.release()


if __name__ == "__main__":
    main()
