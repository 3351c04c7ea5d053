"""Interleaved A/B: int8-static ViT-base with the native s8xs8 Pallas
GEMM in nn.Linear (use_pallas) vs the XLA s8 einsum path vs bf16.

Attribution control: bf16+use_pallas isolates the flash-attention
dispatch that use_pallas ALSO flips, so the linear-kernel effect is
(int8+pallas vs int8) minus (bf16+pallas vs bf16).

Rounds of back-to-back measurement (dotdot_verify.py pattern) +
chip_speed_factor anchors; sequential readings on this chip drift
1.5-3.5 ms on the SAME program (docs/PERF.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/simpleinfer_tpu/xla"))

from simpleinfer_tpu import Engine, EngineConfig
from simpleinfer_tpu.profiling import measure_device_time, chip_speed_factor
from simpleinfer_tpu.zoo import build_vit

BATCH, SIZE = 16, 224
rng = np.random.default_rng(0)
x_np = (rng.standard_normal((BATCH, SIZE, SIZE, 3)).astype(np.float32)
        / 4.0)

CONFIGS = {
    "bf16": EngineConfig(compute_dtype="bfloat16"),
    "bf16_pallas": EngineConfig(compute_dtype="bfloat16", use_pallas=True),
    "int8_xla": EngineConfig(compute_dtype="bfloat16", quant="int8"),
    "int8_pallas": EngineConfig(compute_dtype="bfloat16", quant="int8",
                                use_pallas=True),
}

runners = {}
for name, cfg in CONFIGS.items():
    graph, in_name, out_name = build_vit("base", batch=BATCH,
                                         image_size=SIZE)
    eng = Engine(cfg).load_model(None, graph=graph)
    if cfg.quant == "int8":
        # ViT bakes batch-dependent reshapes: calibration feeds must
        # match the compiled batch
        eng.calibrate([{in_name: x_np}])
    t0 = time.perf_counter()
    eng.input(in_name, x_np)
    eng.forward()
    out = np.asarray(eng.extract(out_name))
    print(f"{name}: forward compiled in {time.perf_counter() - t0:.0f}s, "
          f"out[0,:3]={out[0, :3]}", file=sys.stderr, flush=True)
    weights, program = eng._device_weights, eng.program
    xd = program.pack_input(in_name,
                            jnp.asarray(x_np, cfg.compute_jnp_dtype))
    runners[name] = (lambda xi, w=weights, p=program, i=in_name,
                     o=out_name: p.fn(w, {i: xi})[o], xd,
                     eng._effective_compiler_options())

flops = None
results = {k: [] for k in runners}
for rnd in range(2):
    cf = chip_speed_factor()
    print(f"-- round {rnd} chip factor {cf:.2f}", file=sys.stderr,
          flush=True)
    for name, (fn, xd, opts) in runners.items():
        dt = measure_device_time(fn, xd, iters=12, compiler_options=opts)
        results[name].append(dt)
        print(f"  {name}: {dt*1e3:.3f} ms = {BATCH/dt:.0f} img/s",
              file=sys.stderr, flush=True)

print("medians:", file=sys.stderr)
for name, ts in results.items():
    t = sorted(ts)[len(ts) // 2]
    print(f"  {name}: {t*1e3:.3f} ms = {BATCH/t:.0f} img/s",
          file=sys.stderr)
