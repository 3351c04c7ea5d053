"""Interleaved A/B: Pallas space-to-depth stem kernel vs XLA's packed
block-Toeplitz stem on the yolov5 stem shape (6x6 s2 p2, 3->32,
640x640 b8, bias+silu fused, bf16).

Baseline = a 1-conv engine (the stem takes the same packed path as in
the full model: staged packed input, W-only pack + bt repack, fused
epilogue). Candidate = kernels/stem.stem_s2d on the H-padded staged
input, emitting the same packed jo=4 output.

docs/PERF.md context: XLA's form runs 269.5 us doing 3.2x zero MACs;
the kernel's ideal is 172 us (21% MXU: K=108/128, N=32/128).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/simpleinfer_tpu/xla"))

from simpleinfer_tpu import Engine, EngineConfig
from simpleinfer_tpu.kernels.stem import (pack_stem_input,
                                          pack_stem_weights, stem_s2d,
                                          stem_s2d_reference)
from simpleinfer_tpu.profiling import measure_device_time, chip_speed_factor
from simpleinfer_tpu.zoo.builders import GraphBuilder

BATCH = int(os.environ.get("SI_STEM_BATCH", "8"))
ROUNDS = int(os.environ.get("SI_STEM_ROUNDS", "3"))
IMG = 640

rng = np.random.default_rng(0)
x_np = rng.random((BATCH, IMG, IMG, 3), np.float32)
w_oihw = (rng.standard_normal((32, 3, 6, 6))
          / np.sqrt(3 * 36)).astype(np.float32)
bias = rng.standard_normal(32).astype(np.float32) * 0.05

# ---- XLA baseline: 1-conv engine, stem takes the packed path ----------
b = GraphBuilder(seed=0)
xin = b.input([BATCH, 3, IMG, IMG], name="0")
h = b.conv(xin, 32, 6, 2, 2)
h = b.silu(h)
b.output(h)
g = b.build()
conv_op = next(op for op in g.ops if op.type == "nn.Conv2d")
conv_op.attrs["weight"] = type(conv_op.attrs["weight"]).from_array(w_oihw)
conv_op.attrs["bias"] = type(conv_op.attrs["bias"]).from_array(bias)
eng = Engine(EngineConfig(compute_dtype="bfloat16")).load_model(
    None, graph=g)
in_name, out_name = eng.input_names[0], eng.output_names[0]
eng.input(in_name, x_np)
eng.forward()
y_eng = np.asarray(eng.extract(out_name), np.float32)  # [8,320,320,32]
weights, program = eng._device_weights, eng.program
xd = program.pack_input(in_name, jnp.asarray(x_np, jnp.bfloat16))
print(f"xla baseline staged input {xd.shape}", file=sys.stderr)

# ---- Pallas candidate --------------------------------------------------
wp = jnp.asarray(pack_stem_weights(w_oihw))
bj = jnp.asarray(bias)
xp = jnp.asarray(pack_stem_input(x_np), jnp.bfloat16)  # host-staged

y_pal = np.asarray(stem_s2d(xp, wp, bj, activation="silu"),
                   np.float32)  # [8,320,320,32] logical
err = np.abs(y_pal - y_eng).max()
ref = np.abs(y_eng).max()
print(f"pallas vs engine: max abs err {err:.5f} (|y| max {ref:.3f})",
      file=sys.stderr)
assert err < 0.05 * ref, "pallas stem does not match the engine stem"

y_ref = np.asarray(stem_s2d_reference(
    jnp.asarray(x_np, jnp.bfloat16), w_oihw, bias, "silu"), np.float32)
err2 = np.abs(y_pal - y_ref).max()
print(f"pallas vs lax oracle: max abs err {err2:.5f}", file=sys.stderr)

# ---- interleaved timing ------------------------------------------------
def xla_fn(xi):
    return program.fn(weights, {in_name: xi})[out_name]


def pal_fn(xi):
    return stem_s2d(xi, wp, bj, activation="silu")


results = {"xla": [], "pallas": []}
for rnd in range(ROUNDS):
    cf = chip_speed_factor()
    print(f"-- round {rnd} chip factor {cf:.2f}", file=sys.stderr,
          flush=True)
    for name, fn, xi in (("xla", xla_fn, xd), ("pallas", pal_fn, xp)):
        dt = measure_device_time(fn, xi, iters=40)
        results[name].append(dt)
        print(f"  {name}: {dt*1e6:.1f} us", file=sys.stderr, flush=True)

print("medians:", file=sys.stderr)
for name, ts in results.items():
    t = sorted(ts)[len(ts) // 2]
    print(f"  {name}: {t*1e6:.1f} us", file=sys.stderr)
