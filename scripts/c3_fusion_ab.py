"""Interleaved A/B: fused C3-block Pallas kernel vs the XLA conv chain.

Round-5 candidate (round-4 verdict item 1): the config-4 attribution
showed the yolov5l high-res stem region bandwidth-bound at 9-21% MXU;
the fused kernel keeps the whole C3 in VMEM (one HBM read + one write
per image). This script measures the kernel standalone at the shape
classes that matter before any engine integration (the memory-note
discipline: build the A/B before investing).

Usage: python scripts/c3_fusion_ab.py [--rounds 3]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/simpleinfer_tpu/xla"))

from simpleinfer_tpu.kernels.c3block import (c3_block,  # noqa: E402
                                             c3_block_reference,
                                             c3_supported,
                                             quantize_taps)
from simpleinfer_tpu.profiling import (chip_speed_factor,  # noqa: E402
                                       measure_device_time)

# (label, N, H, W, C, hid, OC, n_btl) — yolov5l C3_1 is the receipt
# target; C3_2-at-80^2 checks the deeper/narrower-map regime; the
# yolov5s C3_2 shape (hid 64 at 80^2 b8) checks the headline model's
# only eligible block.
CASES = [
    ("yolov5l-C3_1 160^2 c128 hid64 T3 b16", 16, 160, 160, 128, 64,
     128, 3),
    ("yolov5l-C3_2 80^2 c256 hid128 T6 b16", 16, 80, 80, 256, 128,
     256, 6),
    ("yolov5s-C3_2 80^2 c128 hid64 T2 b8", 8, 80, 80, 128, 64, 128, 2),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    prepared = []
    for label, n, h, w, c, hid, oc, t in CASES:
        if not c3_supported(h, w, c, hid, oc):
            print(f"{label}: not c3_supported, skipping", flush=True)
            continue

        def r(*s):
            return rng.standard_normal(s).astype(np.float32) * 0.1

        ws = (r(c, hid), r(hid), r(c, hid), r(hid), r(hid, oc),
              r(hid, oc), r(oc), r(t, hid, hid), r(t, hid),
              r(t, 9, hid, hid), r(t, hid))
        x = jnp.asarray(r(n, h, w, c), jnp.bfloat16)
        wj = tuple(map(jnp.asarray, ws))

        wq, wsc = quantize_taps(ws[9])
        wq = jnp.asarray(wq)
        wsc = jnp.asarray(wsc)
        wj_s8 = wj[:9] + (wq,) + wj[10:]

        def xla_fn(x, wj=wj):
            return c3_block_reference(x, *wj)

        def pallas_fn(x, wj=wj):
            return c3_block(x, *wj)

        def pallas_s8_fn(x, wj_s8=wj_s8, wsc=wsc):
            return c3_block(x, *wj_s8, btl_b_scale=wsc)

        # parity first (bf16 tolerances)
        got = np.asarray(pallas_fn(x), np.float32)
        want = np.asarray(xla_fn(x), np.float32)
        err = np.abs(got - want).max()
        ref = np.abs(want).max()
        print(f"{label}: parity maxerr {err:.4f} (ref magnitude "
              f"{ref:.2f})", flush=True)
        assert err <= 0.05 * max(ref, 1.0), "kernel diverges from oracle"
        flops = 2 * n * h * w * (2 * c * hid + t * hid * hid * 10
                                 + 2 * hid * oc)
        prepared.append((label, x, xla_fn, pallas_fn, pallas_s8_fn,
                         flops))

    res = {}
    for rnd in range(args.rounds):
        cf = chip_speed_factor()
        print(f"-- round {rnd} chip factor {cf:.2f}", flush=True)
        for label, x, xla_fn, pallas_fn, pallas_s8_fn, flops in prepared:
            for name, fn in (("xla", xla_fn), ("pallas", pallas_fn),
                             ("pl-s8", pallas_s8_fn)):
                dt = measure_device_time(fn, x, iters=args.iters)
                res.setdefault((label, name), []).append(dt)
                print(f"  {label:42s} {name:6s}: {dt * 1e3:7.3f} ms "
                      f"({flops / dt / 1e12:6.1f} TFLOP/s)", flush=True)

    print("\nmedians:", flush=True)
    for label, *_ in prepared:
        tx = sorted(res[(label, "xla")])[len(res[(label, "xla")]) // 2]
        tp = sorted(res[(label, "pallas")])[
            len(res[(label, "pallas")]) // 2]
        ts = sorted(res[(label, "pl-s8")])[
            len(res[(label, "pl-s8")]) // 2]
        print(f"  {label:42s}: xla {tx * 1e3:7.3f} ms  pallas "
              f"{tp * 1e3:7.3f} ms ({tx / tp:.2f}x)  pl-s8 "
              f"{ts * 1e3:7.3f} ms ({tx / ts:.2f}x)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
