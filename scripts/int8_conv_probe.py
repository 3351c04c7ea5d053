"""Measure s8x8->s32 conv vs bf16 conv on the real chip, per shape.

Answers the roadmap-#3 feasibility question: does XLA lower int8 convs
to the v5e MXU int8 path (394 TOPS, 2x the bf16 MAC rate), and does the
win survive the quantize/dequant elementwise overhead that the static
quant path (ops/conv.py conv2d_int8_static) adds around every conv?

Shapes are the yolov5s-640-b8 hot mid-net convs (see docs/PERF.md).
Usage: python scripts/int8_conv_probe.py   (real chip; ~minutes of
remote compiles on first run)
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from simpleinfer_tpu.profiling import measure_device_time

DN = ("NHWC", "HWIO", "NHWC")

# (label, N, H, W, Cin, Cout, k, stride)
SHAPES = [
    ("c3_160x64", 8, 160, 160, 64, 64, 3, 1),
    ("c3_80x128", 8, 80, 80, 128, 128, 3, 1),
    ("c3_40x256", 8, 40, 40, 256, 256, 3, 1),
    ("c3_20x512", 8, 20, 20, 512, 512, 3, 1),
    ("down_80>40", 8, 80, 80, 128, 256, 3, 2),
    ("pw_80x256>128", 8, 80, 80, 256, 128, 1, 1),
    ("pw_40x512>256", 8, 40, 40, 512, 256, 1, 1),
]


def main():
    rng = np.random.default_rng(0)
    print(f"{'shape':16s} {'bf16 us':>9s} {'int8 us':>9s} {'int8+q us':>10s}"
          f" {'speedup':>8s} {'bf16 MXU%':>9s}", file=sys.stderr)
    for label, n, h, w, ci, co, k, s in SHAPES:
        x = jnp.asarray(rng.standard_normal((n, h, w, ci)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((k, k, ci, co)), jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (k, k, ci, co)), jnp.int8)
        wsc = jnp.full((co,), 0.01, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
        sx = jnp.float32(0.02)
        pad = ((k // 2, k // 2),) * 2

        def conv_bf16(x):
            o = lax.conv_general_dilated(
                x, wt, (s, s), pad, dimension_numbers=DN,
                preferred_element_type=jnp.float32)
            return jax.nn.silu(o + bias).astype(jnp.bfloat16)

        def conv_int8_pre(x):
            # int8 conv only (input pre-quantized outside the timer is
            # impossible in the chained loop; quantize INSIDE but from a
            # bf16 source both variants share)
            q = jnp.clip(jnp.round(x.astype(jnp.float32) * (1 / sx)),
                         -127, 127).astype(jnp.int8)
            o = lax.conv_general_dilated(
                q, wq, (s, s), pad, dimension_numbers=DN,
                preferred_element_type=jnp.int32)
            return o.astype(jnp.bfloat16)

        def conv_int8_full(x):
            # the exact conv2d_int8_static chain: quant + conv + dequant
            # + bias + silu
            q = jnp.clip(jnp.round(x.astype(jnp.float32) * (1 / sx)),
                         -127, 127).astype(jnp.int8)
            o = lax.conv_general_dilated(
                q, wq, (s, s), pad, dimension_numbers=DN,
                preferred_element_type=jnp.int32)
            o = o.astype(jnp.float32) * (sx * wsc) + bias
            return jax.nn.silu(o).astype(jnp.bfloat16)

        iters = 200 if h * ci <= 80 * 256 else 100
        t_bf = measure_device_time(conv_bf16, x, iters=iters)
        t_i8 = measure_device_time(conv_int8_pre, x, iters=iters)
        t_i8f = measure_device_time(conv_int8_full, x, iters=iters)
        flops = 2 * n * (h // s) * (w // s) * co * ci * k * k
        mxu = flops / t_bf / 394e12 * 100
        print(f"{label:16s} {t_bf * 1e6:9.1f} {t_i8 * 1e6:9.1f} "
              f"{t_i8f * 1e6:10.1f} {t_bf / t_i8f:8.2f} {mxu:9.1f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
