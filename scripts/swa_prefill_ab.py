"""E2E sliding-window prefill A/B: banded flash kernel vs XLA band.

Round-4 receipt for the verdict item "sliding-window models pay
full-mask prefill": a mistral-shaped llama (d=128 heads, sw=256) at
prompt length 2048, measuring the WHOLE forward (the prefill compute:
projections + banded attention + MLP) with the banded kernel gate open
(default) vs forced off — interleaved rounds, same protocol as every
A/B in docs/PERF.md.

Usage: python scripts/swa_prefill_ab.py [--rounds 3] [--iters 32]
"""
import argparse
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--sw", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.profiling import (chip_speed_factor,
                                           measure_device_time)
    from simpleinfer_tpu.zoo import build_llama

    def make_fwd():
        graph, in_name, out_name = build_llama(
            batch=1, seq_len=args.seq, vocab_size=256, depth=args.depth,
            width=args.width, num_heads=args.heads,
            sliding_window=args.sw, seed=0)
        eng = Engine(EngineConfig(compute_dtype="bfloat16")).load_model(
            None, graph=graph)
        program, weights = eng.program, eng._device_weights
        ids = jnp.asarray(np.random.default_rng(0).integers(
            1, 256, (1, args.seq)), jnp.int32)

        def fwd(pos_scale):
            # chain the loop on a float input folded into the ids so
            # measure_device_time's dependency chain holds
            shifted = (ids + pos_scale.astype(jnp.int32)[0, 0]) % 256
            return program.fn(weights, {in_name: shifted})[out_name]

        return fwd, jnp.zeros((1, 1), jnp.float32)

    print(f"chip_speed_factor before: {chip_speed_factor():.3f}",
          flush=True)
    # The gate env var is read at TRACE time, and measure_device_time
    # re-traces fn on every call — so the env must be set around EACH
    # measurement, not just at build time (first version of this script
    # reset it after building and measured two identical programs).
    fwd_kernel, x = make_fwd()
    fwd_xla, _ = make_fwd()
    gate_env = {"banded-kernel": None, "xla-band": "1000000000"}

    variants = {"banded-kernel": fwd_kernel, "xla-band": fwd_xla}
    times = {n: [] for n in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():
            if gate_env[name] is None:
                os.environ.pop("SI_FLASH_BAND_MIN_LK", None)
            else:
                os.environ["SI_FLASH_BAND_MIN_LK"] = gate_env[name]
            times[name].append(measure_device_time(fn, x,
                                                   iters=args.iters))
        print(f"round {r}: " + "  ".join(
            f"{n} {times[n][-1] * 1e3:.3f}ms" for n in variants),
            flush=True)
    os.environ.pop("SI_FLASH_BAND_MIN_LK", None)
    meds = {n: statistics.median(ts) for n, ts in times.items()}
    print(f"chip_speed_factor after: {chip_speed_factor():.3f}",
          flush=True)
    print(f"\nL={args.seq} sw={args.sw} depth={args.depth} "
          f"width={args.width}: banded-kernel "
          f"{meds['banded-kernel'] * 1e3:.3f}ms vs xla-band "
          f"{meds['xla-band'] * 1e3:.3f}ms -> "
          f"{meds['xla-band'] / meds['banded-kernel']:.2f}x e2e prefill",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
