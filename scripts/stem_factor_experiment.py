"""Interleaved A/B: yolov5s-640-b8 whole-program device time across
stem W-pack factors and the packed cat-split carry dtype.

Motivation (docs/PERF.md per-op profile, 2026-08-19): the packed stem
(`multiply_convert_fusion`, bf16[8,320,80,128]) is the largest single
op at 269.5 us/iter, compute-bound at 83.7 TF/s — but ~3x of those MACs
are ZEROS in the block-Toeplitz weight (kernel window [6,3,3,1]: 3
blocks x 24 = 72 taps/channel-row vs 18 useful). Smaller pack factors
trade zero-redundancy against MXU K-utilization (f=8 -> K=72 of 128
lanes; f=4 -> K=48 spanning 2 blocks of 24... measured, not argued).

Configs: f8 (default), f4, f2, plus the carry control (the bf16
packed-split carry shipped 2026-08-19; SI_CARRY_F32=1 restores the old
f32 carry for attribution).

Methodology: profiling.measure_device_time, interleaved rounds,
chip_speed_factor anchors.
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

BATCH = int(os.environ.get("SI_STEM_BATCH", "8"))
IMG = int(os.environ.get("SI_STEM_IMG", "640"))
ROUNDS = int(os.environ.get("SI_STEM_ROUNDS", "2"))
QUANT = os.environ.get("SI_STEM_QUANT", "int8w")

FACTORS = {
    "f8": (8, 4, 2),
    "f4": (4, 2),
    "f2": (2,),
}

rng = np.random.default_rng(0)
x_np = rng.random((BATCH, IMG, IMG, 3), np.float32)

runners = {}
for name, factors in FACTORS.items():
    conv_mod._STEM_PACK_FACTORS = factors
    graph, in_name, out_name = build_yolov5("s", batch=BATCH,
                                            image_size=IMG)
    cfg = EngineConfig(compute_dtype="bfloat16",
                       quant=QUANT if QUANT != "none" else None)
    eng = Engine(cfg).load_model(None, graph=graph)
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
conv_mod._STEM_PACK_FACTORS = FACTORS["f8"]

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
