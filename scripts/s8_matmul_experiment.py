"""Interleaved A/B: Pallas s8xs8->s32 vs XLA s8 vs XLA bf16 at 4096^3.

Rounds of back-to-back measurement seconds apart (dotdot_verify.py
pattern) + chip_speed_factor anchors, because sequential readings on
this chip have produced physically-impossible numbers (>peak).
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/simpleinfer_tpu/xla"))
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from simpleinfer_tpu.profiling import measure_device_time, chip_speed_factor

def kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(2)
    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)
    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:]

def mm_s8(x, w, bm, bn, bk):
    m, k = x.shape; _, n = w.shape
    n_k = k // bk
    return pl.pallas_call(
        functools.partial(kernel, n_k=n_k),
        grid=(m // bm, n // bn, n_k),
        in_specs=[pl.BlockSpec((bm, bk), lambda i,j,kk: (i,kk)),
                  pl.BlockSpec((bk, bn), lambda i,j,kk: (kk,j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i,j,kk: (i,j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel","parallel","arbitrary")),
        cost_estimate=pl.CostEstimate(flops=2*m*n*k,
                                      bytes_accessed=m*k+k*n+m*n*4,
                                      transcendentals=0),
    )(x, w)

rng = np.random.default_rng(0)
S = 4096
x = jnp.asarray(rng.integers(-127, 127, (S, S), dtype=np.int8))
w = jnp.asarray(rng.integers(-127, 127, (S, S), dtype=np.int8))
wb = w.astype(jnp.bfloat16)
t0 = jnp.zeros((), jnp.float32)

# correctness at 2048^2 (cheap) vs XLA s32
xs, ws = x[:2048, :2048], w[:2048, :2048]
want = jax.jit(lambda a, b: jax.lax.dot_general(
    a, b, (((1,), (0,)), ((), ())),
    preferred_element_type=jnp.int32))(xs, ws)
for bm, bn, bk in ((512, 1024, 1024), (1024, 512, 2048)):
    got = mm_s8(xs, ws, bm, bn, bk)
    ok = bool(jnp.array_equal(got, want))
    print(f"correct bm{bm} bn{bn} bk{bk} @2048: {ok}", file=sys.stderr)
    assert ok

variants = {
    "pallas_s8_512x1024x1024": lambda xx: mm_s8(xx, w, 512, 1024, 1024),
    "pallas_s8_1024x512x2048": lambda xx: mm_s8(xx, w, 1024, 512, 2048),
    "xla_s8": lambda xx: jax.lax.dot_general(
        xx, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32),
    "xla_bf16": lambda xx: jnp.dot(xx.astype(jnp.bfloat16), wb,
                                   preferred_element_type=jnp.float32),
}
def timed(fn_of_x):
    f = lambda t: fn_of_x((x + t.astype(jnp.int8)).astype(jnp.int8))
    return measure_device_time(f, t0)

flops = 2 * S**3
results = {k: [] for k in variants}
for rnd in range(2):
    cf = chip_speed_factor()
    print(f"-- round {rnd} chip factor {cf:.2f}", file=sys.stderr)
    for name, fn in variants.items():
        t = timed(fn)
        results[name].append(t)
        print(f"  {name}: {t*1e3:.3f} ms = {flops/t/1e12:.1f} T/s",
              file=sys.stderr)
print("medians:", file=sys.stderr)
for name, ts in results.items():
    t = sorted(ts)[len(ts)//2]
    print(f"  {name}: {t*1e3:.3f} ms = {flops/t/1e12:.1f} T/s",
          file=sys.stderr)
