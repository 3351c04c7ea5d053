"""Capstone composite receipt: the round-3/4 serving features compose.

One TieredGenerationService on a mistral-shaped SWA model exercises,
in a single run on the real chip:
  - tiered KV pools (short requests -> w512 slots, long -> w2048),
  - ring-stored sliding-window KV (cache bounded by sw, not window),
  - the banded flash prefill kernel (long-prompt admissions land in
    the 2048 bucket where flash_band_profitable opens),
  - prefill bucket ladder, scratch blocks, capped sampling, pipelined
    chained decode blocks — all defaults.

Reports aggregate + per-tier throughput and asserts the routing /
ring / kernel paths actually engaged.

Usage: python scripts/composite_serving_demo.py [--short 12 --long 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--short", type=int, default=12)
    ap.add_argument("--long", type=int, default=4)
    ap.add_argument("--window", type=int, default=2048)
    ap.add_argument("--sw", type=int, default=256)
    args = ap.parse_args()

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.kernels.attention import flash_band_profitable
    from simpleinfer_tpu.serving.llm import TieredGenerationService
    from simpleinfer_tpu.zoo.builders import build_llama

    graph, _, _ = build_llama(batch=1, seq_len=args.window,
                              vocab_size=8192, depth=4, width=1024,
                              num_heads=8, sliding_window=args.sw,
                              seed=0)
    eng = Engine(EngineConfig(compute_dtype="bfloat16",
                              quant="int8w")).load_model(None,
                                                         graph=graph)
    print("engine loaded (int8w, bf16 compute)", file=sys.stderr,
          flush=True)
    svc = TieredGenerationService(
        eng, tiers=((8, 512), (4, None)), kv_dtype="bfloat16",
        decode_horizon=16)
    # receipts that the composed paths are actually live
    ring = svc.services[0]._dec._op_ring(
        dict(sliding_window=args.sw))
    assert ring is not None and ring < args.window, \
        "sliding KV should be ring-stored"
    assert flash_band_profitable(args.window, args.window, args.sw), \
        "the 2048-bucket prefill should open the banded kernel gate"
    t0 = time.perf_counter()
    svc.warmup()
    print(f"warmup (both tiers, all buckets) in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr,
          flush=True)
    svc.start()

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    futs = []
    for _ in range(args.long):
        prompt = rng.integers(1, 8192, size=1600).tolist()
        futs.append(("long", svc.submit(prompt, max_new=128)))
    for _ in range(args.short):
        prompt = rng.integers(1, 8192, size=40).tolist()
        futs.append(("short", svc.submit(prompt, max_new=64)))
    toks = 0
    for kind, f in futs:
        out = f.result(timeout=1200)
        toks += len(out) - (1600 if kind == "long" else 40)
    dt = time.perf_counter() - t0
    svc.stop()

    s0, s1 = svc.services[0].stats, svc.services[1].stats
    assert s0.completed == args.short and s1.completed == args.long, \
        f"routing broke: tier0 {s0.completed}, tier1 {s1.completed}"
    print(f"short tier (w512): {s0.completed} reqs, "
          f"{s0.tokens_out} tokens; long tier (w{args.window}): "
          f"{s1.completed} reqs, {s1.tokens_out} tokens", flush=True)
    print(f"composite: {args.short} short + {args.long} long requests, "
          f"{toks} generated tokens in {dt:.1f}s = {toks / dt:.0f} "
          f"tok/s (tiers + ring KV + banded prefill + ladders, one "
          f"chip)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
