"""Interleaved A/B: int8-static transformer PREFILL with the native
s8xs8 Pallas GEMM in nn.Linear (use_pallas) vs the XLA s8 einsum path
vs bf16 — VERDICT r1 weak-#2: the 4096^3 microbenchmark win (264 vs
218 T/s) has never been tested at LLM-prefill GEMM shapes.

Workload: BERT-base (12L, 768h) at batch 8 x L 512 — MLP linears are
[4096, 768] x [768, 3072]/[3072, 768], the canonical prefill shape
class, all above the min(m,k,n) >= 256 Pallas gate in ops/linear.py.
bf16+use_pallas is the attribution control for the flash-attention
dispatch use_pallas also flips (flash gate now Lk>=4096, so at L=512
it stays closed and the control isolates nothing but the linear path).

Methodology: profiling.measure_device_time, interleaved rounds with
chip_speed_factor anchors (docs/PERF.md drift discipline).
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
from simpleinfer_tpu.zoo import build_bert

BATCH = int(os.environ.get("SI_S8_BATCH", "8"))
SEQ = int(os.environ.get("SI_S8_SEQ", "512"))
VARIANT = os.environ.get("SI_S8_VARIANT", "base")

rng = np.random.default_rng(0)
ids = rng.integers(1, 30000, size=(BATCH, SEQ)).astype(np.float32)

CONFIGS = {
    "bf16": EngineConfig(compute_dtype="bfloat16"),
    "bf16_pallas": EngineConfig(compute_dtype="bfloat16", use_pallas=True),
    "int8_xla": EngineConfig(compute_dtype="bfloat16", quant="int8"),
    "int8_pallas": EngineConfig(compute_dtype="bfloat16", quant="int8",
                                use_pallas=True),
}

runners = {}
for name, cfg in CONFIGS.items():
    graph, in_name, out_name = build_bert(VARIANT, batch=BATCH,
                                          seq_len=SEQ)
    eng = Engine(cfg).load_model(None, graph=graph)
    if cfg.quant == "int8":
        eng.calibrate([{in_name: ids}])
    t0 = time.perf_counter()
    eng.input(in_name, ids)
    eng.forward()
    out = np.asarray(eng.extract(out_name))
    print(f"{name}: forward compiled in {time.perf_counter() - t0:.0f}s, "
          f"out[0,:2]={out[0, :2]}", file=sys.stderr, flush=True)
    weights, program = eng._device_weights, eng.program
    xd = program.pack_input(in_name,
                            jnp.asarray(ids, cfg.compute_jnp_dtype))
    runners[name] = (lambda xi, w=weights, p=program, i=in_name,
                     o=out_name: p.fn(w, {i: xi})[o], xd,
                     eng._effective_compiler_options())

results = {k: [] for k in runners}
for rnd in range(int(os.environ.get("SI_S8_ROUNDS", "2"))):
    cf = chip_speed_factor()
    print(f"-- round {rnd} chip factor {cf:.2f}", file=sys.stderr,
          flush=True)
    for name, (fn, xd, opts) in runners.items():
        dt = measure_device_time(fn, xd, iters=12, compiler_options=opts)
        results[name].append(dt)
        print(f"  {name}: {dt*1e3:.3f} ms = {BATCH*SEQ/dt/1e3:.0f} ktok/s",
              file=sys.stderr, flush=True)

print("medians:", file=sys.stderr)
for name, ts in results.items():
    t = sorted(ts)[len(ts) // 2]
    print(f"  {name}: {t*1e3:.3f} ms = {BATCH*SEQ/t/1e3:.0f} ktok/s",
          file=sys.stderr)
