"""Headline benchmark: YOLOv5s 640x640 INT8 images/sec on one chip.

The reference's benchmark is BM_Yolov5s_Batch8_640x640 — wall-ms per
Engine::Forward() at batch 8 (/root/reference/bench/bench_yolo.cpp:7-34).
The reference publishes no numbers (BASELINE.md), so `vs_baseline` is
reported against this framework's own FP32 single-chip run — the
"beat-your-own-fp32" discipline BASELINE.json asks for (INT8 ≥ FP32).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
plus optional detail lines on stderr.
"""
import json
import os
import sys
import time

import numpy as np


def _bench_engine(eng, in_name, batch, image_size, warmup=2, iters=10):
    x = np.random.default_rng(0).standard_normal(
        (batch, image_size, image_size, 3)).astype(np.float32) / 4.0
    eng.input(in_name, x)
    for _ in range(warmup):
        eng.forward()
        eng.block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        eng.forward()
        eng.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return batch / dt, dt


def main():
    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.zoo import build_yolov5

    batch = int(os.environ.get("SI_BENCH_BATCH", "8"))
    image_size = int(os.environ.get("SI_BENCH_IMG", "640"))
    variant = os.environ.get("SI_BENCH_VARIANT", "s")

    graph_fp, in_name, _ = build_yolov5(variant, batch=batch,
                                        image_size=image_size)
    eng_fp = Engine(EngineConfig()).load_model(None, graph=graph_fp)
    fp_ips, fp_dt = _bench_engine(eng_fp, in_name, batch, image_size)
    print(f"fp32:  {fp_ips:8.1f} img/s  ({fp_dt * 1e3:.2f} ms / batch "
          f"{batch})", file=sys.stderr)
    eng_fp.release()

    graph_q, _, _ = build_yolov5(variant, batch=batch, image_size=image_size)
    eng_q = Engine(EngineConfig(quant="int8w")).load_model(None, graph=graph_q)
    q_ips, q_dt = _bench_engine(eng_q, in_name, batch, image_size)
    print(f"int8w: {q_ips:8.1f} img/s  ({q_dt * 1e3:.2f} ms / batch "
          f"{batch})", file=sys.stderr)

    print(json.dumps({
        "metric": f"yolov5{variant}_{image_size}_b{batch}_int8w_throughput",
        "value": round(q_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(q_ips / fp_ips, 3),
    }))


if __name__ == "__main__":
    main()
