"""BASELINE config-3 (yolov5s-640 b32 int8w) spill attack.

Standing result: b32 compiles with stage-sized XLA temporaries (b8
temp_size = 0; b16 = 207-216 MB) and pays ~18% over the 4x-b8
equivalent (8.40 ms vs ~7.2 ms, BASELINE_RESULTS.md). VERDICT round-2
#6 asks for three attempts, interleaved:

  donate  : input donation at b32 — checked via memory_analysis (does
            freeing the 157 MB input change XLA's temp budget?); the
            chained-loop harness cannot express donation, so this is a
            compile-report experiment, not a timing.
  vmem-*  : per-executable scheduler memory options
            (xla_tpu_scoped_vmem_limit_kib) scoped to the spilling
            program.
  chunk2/4: a windowed batch INSIDE one jit — lax.map over 2 x b16 or
            4 x b8 halves. The map body reuses one buffer set, so the
            b8 body should keep its temp_size=0 fusion shape; cost is
            the sequential-loop barrier between waves.

Method: docs/PERF.md — two-point chained-loop device timing
(profiling.measure_device_time), variants interleaved per round,
chip_speed_factor recorded.
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
from simpleinfer_tpu.profiling import chip_speed_factor, \
    measure_device_time
from simpleinfer_tpu.zoo import build_yolov5

BATCH = int(os.environ.get("SI_BATCH", "32"))
ROUNDS = int(os.environ.get("SI_ROUNDS", "3"))
ITERS = int(os.environ.get("SI_ITERS", "10"))
IMG = 640

print(f"building yolov5s {IMG} b{BATCH} int8w", file=sys.stderr)
graph, in_name, out_name = build_yolov5("s", batch=BATCH, image_size=IMG)
eng = Engine(EngineConfig(compute_dtype="bfloat16", quant="int8w")
             ).load_model(None, graph=graph)
program, weights = eng.program, eng._device_weights

rng = np.random.default_rng(0)
x_np = rng.standard_normal((BATCH, IMG, IMG, 3)).astype(np.float32) / 4
x = program.pack_input(in_name, jnp.asarray(x_np, jnp.bfloat16))


def fwd(xi):
    return program.fn(weights, {in_name: xi})[out_name]


def chunked(n_chunks):
    def fwd_c(xi):
        xs = xi.reshape(n_chunks, BATCH // n_chunks, *xi.shape[1:])
        ys = jax.lax.map(
            lambda xc: program.fn(weights, {in_name: xc})[out_name], xs)
        return ys.reshape(BATCH, *ys.shape[2:])
    return fwd_c


# ---- compile-report experiments (donation, temp sizes) ---------------------
def temp_mb(fn, donate):
    try:
        jitted = jax.jit(fn, donate_argnums=(0,) if donate else ())
        rep = jitted.lower(x).compile().memory_analysis()
        return rep.temp_size_in_bytes / 1e6
    except Exception as e:  # noqa: BLE001
        print(f"memory_analysis failed: {e}", file=sys.stderr)
        return float("nan")


for label, fn, don in (("base", fwd, False), ("base+donate", fwd, True),
                       ("chunk2", chunked(2), False),
                       ("chunk4", chunked(4), False)):
    t0 = time.perf_counter()
    mb = temp_mb(fn, don)
    print(f"temp_size {label}: {mb:.0f} MB "
          f"(compile {time.perf_counter() - t0:.0f}s)", file=sys.stderr,
          flush=True)

# ---- timed variants (interleaved) -------------------------------------------
VMEM = os.environ.get("SI_VMEM_KIB")  # e.g. "65536"
variants = [("base", fwd, None), ("chunk2", chunked(2), None),
            ("chunk4", chunked(4), None)]
if VMEM:
    variants.append((f"vmem{VMEM}", fwd,
                     {"xla_tpu_scoped_vmem_limit_kib": VMEM}))

results = {label: [] for label, _, _ in variants}
for rnd in range(ROUNDS):
    for label, fn, opts in variants:
        try:
            dt = measure_device_time(fn, x, iters=ITERS,
                                     compiler_options=opts)
        except Exception as e:  # noqa: BLE001 — bad option etc.
            print(f"{label} failed: {e}", file=sys.stderr)
            continue
        ms = dt * 1e3
        results[label].append(ms)
        print(f"round {rnd} {label}: {ms:.2f} ms/b{BATCH} = "
              f"{BATCH / dt:.0f} img/s", file=sys.stderr, flush=True)

factor = chip_speed_factor()
med = {k: float(np.median(v)) for k, v in results.items() if v}
print(f"chip_speed_factor {factor:.3f}", file=sys.stderr)
print(f"medians (ms/b{BATCH}): {med}", file=sys.stderr)
best = min(med, key=med.get)
print(f'{{"metric": "yolov5s_{IMG}_b{BATCH}_spill_best", '
      f'"value": {BATCH / med[best] * 1e3:.0f}, "unit": "img/s", '
      f'"best": "{best}", '
      f'"medians_ms": {str({k: round(v, 2) for k, v in med.items()}).replace(chr(39), chr(34))}, '
      f'"chip_speed_factor": {factor:.3f}}}')
