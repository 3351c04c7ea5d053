"""Interleaved A/B: packed cat-split partial-carry dtype (f32 vs bf16)
on the yolov5s-640-b8 whole program.

The f32 carry materialized fusion.8 = f32[8,160,80,128] (52 MB) between
the two split convs of every C3 junction — 114 us/iter in the headline
profile (docs/PERF.md). The bf16 carry mirrors the dense split path's
measured win; this script attributes the delta on the full program.
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
from simpleinfer_tpu.ops import conv as conv_mod
from simpleinfer_tpu.profiling import measure_device_time, chip_speed_factor
from simpleinfer_tpu.zoo import build_yolov5

BATCH, IMG = 8, 640
ROUNDS = int(os.environ.get("SI_CARRY_ROUNDS", "3"))

rng = np.random.default_rng(0)
x_np = rng.random((BATCH, IMG, IMG, 3), np.float32)

runners = {}
for name, f32_carry in (("carry_f32", True), ("carry_bf16", False)):
    conv_mod._PACKED_SPLIT_CARRY_F32 = f32_carry
    graph, in_name, out_name = build_yolov5("s", batch=BATCH,
                                            image_size=IMG)
    eng = Engine(EngineConfig(compute_dtype="bfloat16",
                              quant="int8w")).load_model(None, graph=graph)
    eng.input(in_name, x_np)
    eng.forward()
    out = np.asarray(eng.extract(out_name))
    print(f"{name}: compiled; out[0,0,:2]={out[0, 0, :2]}",
          file=sys.stderr, flush=True)
    weights, program = eng._device_weights, eng.program
    xd = program.pack_input(in_name, jnp.asarray(x_np, jnp.bfloat16))
    runners[name] = (lambda xi, w=weights, p=program, i=in_name,
                     o=out_name: p.fn(w, {i: xi})[o], xd,
                     eng._effective_compiler_options())
conv_mod._PACKED_SPLIT_CARRY_F32 = False

results = {k: [] for k in runners}
for rnd in range(ROUNDS):
    cf = chip_speed_factor()
    print(f"-- round {rnd} chip factor {cf:.2f}", file=sys.stderr,
          flush=True)
    for name, (fn, xd, opts) in runners.items():
        dt = measure_device_time(fn, xd, iters=20, compiler_options=opts)
        results[name].append(dt)
        print(f"  {name}: {dt*1e3:.3f} ms = {BATCH/dt:.0f} img/s",
              file=sys.stderr, flush=True)

print("medians:", file=sys.stderr)
for name, ts in results.items():
    t = sorted(ts)[len(ts) // 2]
    print(f"  {name}: {t*1e3:.3f} ms = {BATCH/t:.0f} img/s",
          file=sys.stderr)
