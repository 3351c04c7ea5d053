"""Interleaved A/B: Pallas flash attention vs XLA's fused sdpa across
sequence lengths, to validate the flash_profitable dispatch gate
(kernels/attention.py — default threshold Lk >= 1024).

Measured motivation (docs/PERF.md): at ViT's L=197 flash LOSES 2x e2e.
Flash should win once the [Lq, Lk] scores tensor is too large for XLA
to keep in VMEM — this sweep finds the crossover on the real chip.

Shapes: llama-prefill-like, bh = 16 heads (batch 1), d = 128, causal,
bf16. Methodology: profiling.measure_device_time (two-point chained
loop), interleaved rounds with chip_speed_factor anchors (same-day
drift is 1.5-3.5x on this chip — docs/PERF.md).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/simpleinfer_tpu/xla"))

from simpleinfer_tpu.kernels.attention import (flash_attention,
                                               flash_attention_ref)
from simpleinfer_tpu.profiling import measure_device_time, chip_speed_factor

BH = int(os.environ.get("SI_SWEEP_BH", "16"))
D = int(os.environ.get("SI_SWEEP_D", "128"))
LENGTHS = [int(s) for s in os.environ.get(
    "SI_SWEEP_L", "512,1024,2048,4096").split(",")]
ROUNDS = int(os.environ.get("SI_SWEEP_ROUNDS", "2"))

rng = np.random.default_rng(0)
cases = {}
for L in LENGTHS:
    q = jnp.asarray(rng.standard_normal((BH, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BH, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BH, L, D)), jnp.bfloat16)
    cases[L] = (q, k, v)


def xla_fn(q, k, v):
    return flash_attention_ref(q, k, v, causal=True)


def pallas_fn(q, k, v):
    return flash_attention(q, k, v, causal=True)


res = {(L, n): [] for L in LENGTHS for n in ("xla", "flash")}
for rnd in range(ROUNDS):
    cf = chip_speed_factor()
    print(f"-- round {rnd} chip factor {cf:.2f}", file=sys.stderr,
          flush=True)
    for L in LENGTHS:
        q, k, v = cases[L]
        # causal workload: ~half the full-matrix 2*2*BH*L*L*D flops
        flops = 2 * BH * L * L * D
        for name, fn in (("xla", xla_fn), ("flash", pallas_fn)):
            it = max(4, min(40, (1 << 22) // L))
            dt = measure_device_time(fn, q, k, v, iters=it)
            res[(L, name)].append(dt)
            print(f"  L={L:5d} {name:5s}: {dt*1e3:7.3f} ms "
                  f"({flops/dt/1e12:6.1f} TFLOP/s)",
                  file=sys.stderr, flush=True)

print("medians (xla / flash / ratio):", file=sys.stderr)
for L in LENGTHS:
    tx = sorted(res[(L, "xla")])[len(res[(L, "xla")]) // 2]
    tf = sorted(res[(L, "flash")])[len(res[(L, "flash")]) // 2]
    print(f"  L={L:5d}: {tx*1e3:7.3f} / {tf*1e3:7.3f} ms -> "
          f"flash is {tx/tf:.2f}x", file=sys.stderr)
