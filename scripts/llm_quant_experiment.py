"""Interleaved A/B: llama-shaped LM prefill + decode DEVICE time across
quant policies (bf16 / int8w / int8-static XLA / int8-static + Pallas
s8 GEMM).

What each phase is bound by (and therefore what should win):
- prefill [1, L] is compute-bound (M = L tokens through every linear):
  int8-static puts the matmuls on the 394-TOPS int8 MXU path; the
  Pallas s8 kernel won 1.2-1.5x vs XLA-s8 at 4096^3 (docs/PERF.md) and
  the gate admits MXU-sized operands (min(M,K,N) >= 256).
- decode [slots, 1] is HBM-bound on weight reads: int8w halves the
  bytes (s8 weights dequantized in-register), so ~2x is the ceiling
  regardless of the compute path. The Pallas kernel is gated OUT at
  M = slots < 256 by design.

Methodology: profiling.measure_device_time (two-point chained loop) per
config, interleaved rounds with chip_speed_factor anchors (same-day
drift is 1.5-3.5x on this chip — docs/PERF.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
import numpy as np
import jax
import jax.numpy as jnp

# the TPU PJRT plugin wins over the JAX_PLATFORMS env var; honor an
# explicit cpu request through jax.config too (CPU smoke runs)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/simpleinfer_tpu/xla"))

from simpleinfer_tpu import Engine, EngineConfig
from simpleinfer_tpu.profiling import measure_device_time, chip_speed_factor
from simpleinfer_tpu.zoo import build_llama
from simpleinfer_tpu.zoo.generate import CachedDecoder

# llama-2-7B block shape at 1/4 depth: width 2048 would be a 1.3B-class
# block; use real 7B width/heads so the matmul shapes are the ones that
# matter, with depth trimmed to keep remote compiles bounded.
WIDTH = int(os.environ.get("SI_LLM_WIDTH", "2048"))
DEPTH = int(os.environ.get("SI_LLM_DEPTH", "4"))
HEADS = WIDTH // 128
KV = HEADS // 2
VOCAB = 32000
WINDOW = int(os.environ.get("SI_LLM_WINDOW", "512"))
SLOTS = int(os.environ.get("SI_LLM_SLOTS", "8"))

CONFIGS = {
    "bf16": EngineConfig(compute_dtype="bfloat16"),
    "int8w": EngineConfig(compute_dtype="bfloat16", quant="int8w"),
    "int8_xla": EngineConfig(compute_dtype="bfloat16", quant="int8"),
    "int8_pallas": EngineConfig(compute_dtype="bfloat16", quant="int8",
                                use_pallas=True),
}

rng = np.random.default_rng(0)
calib = rng.integers(1, VOCAB, size=(1, WINDOW)).astype(np.float32)
window = np.zeros((1, WINDOW), np.float32)
window[0, :WINDOW // 2] = calib[0, :WINDOW // 2]

prefills, steps = {}, {}
for name, cfg in CONFIGS.items():
    graph, in_name, out_name = build_llama(
        "small", batch=1, seq_len=WINDOW, vocab_size=VOCAB, depth=DEPTH,
        width=WIDTH, num_heads=HEADS, num_kv_heads=KV)
    t0 = time.perf_counter()
    eng = Engine(cfg).load_model(None, graph=graph)
    if cfg.quant == "int8":
        eng.calibrate([{in_name: calib}])
    dec = CachedDecoder(eng)
    opts = eng._effective_compiler_options()

    # prefill: fn(tokens [1,L] float) -> last logits (chainable scalar)
    lengths = jnp.asarray([WINDOW // 2], jnp.int32) - 1

    def prefill_fn(toks, lp=lengths, d=dec):
        last, _caches = d._prefill_logits_fn(d._weights, toks, lp)
        return last

    # decode step: fn(token [SLOTS,1] float, pos, caches) -> logits
    caches = dec.init_cache(SLOTS)
    pos = jnp.full((SLOTS,), WINDOW // 2, jnp.int32)

    def step_fn(tok, pos, caches, d=dec):
        logits, _ = d._step_fn(d._weights, tok, pos, caches)
        return logits

    tokd = jnp.asarray(np.ones((SLOTS, 1), np.float32))
    wind = jnp.asarray(window)
    prefills[name] = (prefill_fn, (wind,), opts)
    steps[name] = (step_fn, (tokd, pos, caches), opts)
    print(f"{name}: built in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

w_per_tok = DEPTH * (2 * WIDTH * WIDTH + 2 * WIDTH * (KV * 128)
                     + 3 * WIDTH * max(1, int(WIDTH * 8 / 3) // 16 * 16))
params = w_per_tok + 2 * WIDTH * VOCAB
print(f"width {WIDTH} depth {DEPTH} heads {HEADS}/{KV} "
      f"~{params/1e6:.0f}M matmul params", file=sys.stderr, flush=True)

res_p = {k: [] for k in CONFIGS}
res_d = {k: [] for k in CONFIGS}
for rnd in range(2):
    cf = chip_speed_factor()
    print(f"-- round {rnd} chip factor {cf:.2f}", file=sys.stderr,
          flush=True)
    for name in CONFIGS:
        fn, args, opts = prefills[name]
        dt = measure_device_time(fn, *args, iters=10,
                                 compiler_options=opts)
        res_p[name].append(dt)
        gfl = 2 * (WINDOW // 2) * params / dt / 1e12
        print(f"  prefill {name}: {dt*1e3:.3f} ms ({gfl:.1f} TFLOP/s)",
              file=sys.stderr, flush=True)
    for name in CONFIGS:
        fn, args, opts = steps[name]
        dt = measure_device_time(fn, *args, iters=10,
                                 compiler_options=opts)
        res_d[name].append(dt)
        print(f"  decode  {name}: {dt*1e3:.3f} ms "
              f"= {SLOTS/dt:.0f} tok/s at {SLOTS} slots",
              file=sys.stderr, flush=True)

print("medians (prefill / decode):", file=sys.stderr)
for name in CONFIGS:
    tp = sorted(res_p[name])[len(res_p[name]) // 2]
    td = sorted(res_d[name])[len(res_d[name]) // 2]
    print(f"  {name}: {tp*1e3:.3f} ms / {td*1e3:.3f} ms "
          f"({SLOTS/td:.0f} tok/s)", file=sys.stderr)
