"""Continuous-batching serving benchmark (BASELINE.json config 5 shape).

Drives the BatchingService with a Poisson-ish open-loop client stream
and reports sustained throughput, mean latency, and batch occupancy.

    python scripts/serving_bench.py [--variant s --img 640 --requests 256]
"""
import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="s")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--post", default="topk",
                    choices=["topk", "decode", "none"],
                    help="device postprocess: top-300 rows (topk), full "
                         "on-device NMS -> [max_det,6] rows (decode), "
                         "or raw head fetch (none)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.serving import BatchingService
    from simpleinfer_tpu.zoo import build_yolov5

    from simpleinfer_tpu.zoo.detect import decode_device, topk_candidates

    graph, in_name, out_name = build_yolov5(args.variant, batch=1,
                                            image_size=args.img)
    eng = Engine(EngineConfig(compute_dtype="bfloat16",
                              quant="int8w")).load_model(None, graph=graph)
    post = {"topk": lambda o: topk_candidates(o, k=300),
            "decode": lambda o: decode_device(o, max_det=100,
                                              pre_topk=512),
            "none": None}[args.post]
    svc = BatchingService(eng, in_name, out_name,
                          max_batch=args.max_batch, max_wait_ms=3.0,
                          device_postprocess=post)
    print("warming up batch buckets...", file=sys.stderr)
    svc.warmup()
    svc.start()

    per_client = args.requests // args.clients
    rng = np.random.default_rng(0)
    # requests travel as uint8 (the engine normalizes on-device): 4x
    # less host->device traffic than pre-normalized f32
    img = rng.integers(0, 255, (args.img, args.img, 3)).astype(np.uint8)

    def client():
        futs = [svc.submit(img) for _ in range(per_client)]
        for f in futs:
            f.result(timeout=600)

    # one throwaway request so the device_postprocess jit compiles
    # OUTSIDE the timed window (warmup() only compiles the forwards)
    svc.submit(img).result(timeout=600)
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    svc.stop()

    s = svc.stats
    n = s.requests
    print(f"served {n} requests in {wall:.2f}s -> {n / wall:.1f} img/s; "
          f"{s.batches} batches, occupancy {s.mean_batch_occupancy:.0%}, "
          f"mean latency {s.mean_latency_ms:.1f} ms")


if __name__ == "__main__":
    main()
