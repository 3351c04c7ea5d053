"""Banded (sliding-window) flash prefill kernel vs the XLA banded path.

Round-3 verdict item 3: SWA models paid full-mask O(L^2) prefill
because kernels/attention.py had no band support. This sweep measures
the new banded kernel (key blocks outside the band never read) against
the XLA banded-mask sdpa and the full-causal flash kernel, interleaved
(the only drift-proof protocol, docs/PERF.md).

Usage: python scripts/flash_band_sweep.py [--rounds 3] [--bh 16] [--d 128]
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bh", type=int, default=16)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cases", default="1024:256,2048:256,2048:512,"
                                       "4096:256,4096:1024,8192:256")
    args = ap.parse_args()

    import jax.numpy as jnp

    from simpleinfer_tpu.kernels.attention import (flash_attention,
                                                   flash_attention_ref)
    from simpleinfer_tpu.profiling import (chip_speed_factor,
                                           measure_device_time)

    cases = [tuple(int(x) for x in c.split(":"))
             for c in args.cases.split(",")]
    rng = np.random.default_rng(0)
    dt = jnp.dtype(args.dtype)
    print(f"chip_speed_factor before: {chip_speed_factor():.3f}",
          flush=True)

    results = {}
    for (l, sw) in cases:
        q = jnp.asarray(rng.standard_normal((args.bh, l, args.d)), dt)
        k = jnp.asarray(rng.standard_normal((args.bh, l, args.d)), dt)
        v = jnp.asarray(rng.standard_normal((args.bh, l, args.d)), dt)

        def xla_banded(qi, sw=sw):
            return flash_attention_ref(qi, k, v, causal=True,
                                       sliding_window=sw)

        def flash_banded(qi, sw=sw):
            return flash_attention(qi, k, v, causal=True,
                                   sliding_window=sw)

        def flash_full(qi):
            # qi must flow in — measure_device_time chains iterations on
            # the input; a closed-over q lets XLA hoist the whole call
            return flash_attention(qi, k, v, causal=True)

        variants = {"xla-band": xla_banded, "flash-band": flash_banded,
                    "flash-full": flash_full}
        # parity first (on-chip, bf16 tolerance)
        got = np.asarray(flash_banded(q), np.float32)
        want = np.asarray(xla_banded(q), np.float32)
        err = np.max(np.abs(got - want))
        times = {n: [] for n in variants}
        for r in range(args.rounds):
            for name, fn in variants.items():
                times[name].append(measure_device_time(
                    fn, q, iters=args.iters))
        meds = {n: statistics.median(ts) for n, ts in times.items()}
        results[(l, sw)] = meds
        print(f"L={l} sw={sw}: parity {err:.3e} | " + "  ".join(
            f"{n} {meds[n] * 1e3:.3f}ms" for n in variants)
            + f" | band speedup vs xla {meds['xla-band'] / meds['flash-band']:.2f}x"
            f", vs full-flash {meds['flash-full'] / meds['flash-band']:.2f}x",
            flush=True)
    print(f"chip_speed_factor after: {chip_speed_factor():.3f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
