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


def make_pallas_fn(bq, bk):
    def pallas_fn(q, k, v):
        return flash_attention(q, k, v, causal=True, block_q=bq,
                               block_k=bk)
    return pallas_fn


# SI_SWEEP_BLOCKS="128x128,256x256": flash block variants to interleave
# against XLA (round-4 banded sweep won 1.44x at 256x256; this re-runs
# the FULL-CAUSAL crossover at those blocks — verdict item 3)
BLOCKS = [tuple(int(x) for x in spec.split("x"))
          for spec in os.environ.get("SI_SWEEP_BLOCKS",
                                     "128x128").split(",")]
variants = [("xla", xla_fn)] + [
    (f"fl{bq}x{bk}", make_pallas_fn(bq, bk)) for bq, bk in BLOCKS]

res = {(L, n): [] for L in LENGTHS for n, _ in variants}
for rnd in range(ROUNDS):
    cf = chip_speed_factor()
    print(f"-- round {rnd} chip factor {cf:.2f}", file=sys.stderr,
          flush=True)
    for L in LENGTHS:
        q, k, v = cases[L]
        # causal workload: ~half the full-matrix 2*2*BH*L*L*D flops
        flops = 2 * BH * L * L * D
        for name, fn in variants:
            it = max(4, min(40, (1 << 22) // L))
            dt = measure_device_time(fn, q, k, v, iters=it)
            res[(L, name)].append(dt)
            print(f"  L={L:5d} {name:10s}: {dt*1e3:7.3f} ms "
                  f"({flops/dt/1e12:6.1f} TFLOP/s)",
                  file=sys.stderr, flush=True)

print("medians (vs xla):", file=sys.stderr)
for L in LENGTHS:
    tx = sorted(res[(L, "xla")])[len(res[(L, "xla")]) // 2]
    row = [f"xla {tx*1e3:7.3f} ms"]
    for name, _ in variants[1:]:
        tf = sorted(res[(L, name)])[len(res[(L, name)]) // 2]
        row.append(f"{name} {tf*1e3:7.3f} ms ({tx/tf:.2f}x)")
    print(f"  L={L:5d}: " + "  ".join(row), file=sys.stderr)
