"""E2E decode A/B: kv_prefix-sliced attention reads vs full-window.

At window 2048 the bf16 KV read is ~1.07 GB/step (slots 8, 0.9B base
preset) regardless of how much of the window is occupied; a young pool
(positions < 256) under kv_prefix=256 reads 1/8th. Both variants run
int8w weights + bf16-KV + scratch blocks + sample_cap=64 (the current
best config) so the prefix effect is isolated. Positions are re-primed
to 32 each reading so the whole chain stays inside the rung
(token-exact regime). Interleaved rounds, chained blocks, one fetch
per reading (llm_base_decode.py method).

Usage: python scripts/kv_prefix_ab.py   (real chip, ~10 min cold)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/simpleinfer_tpu/xla"))

from simpleinfer_tpu import Engine, EngineConfig
from simpleinfer_tpu.profiling import chip_speed_factor
from simpleinfer_tpu.zoo import build_llama
from simpleinfer_tpu.zoo.generate import CachedDecoder

VARIANT = os.environ.get("SI_LLM_VARIANT", "base")
WINDOW = int(os.environ.get("SI_LLM_WINDOW", "2048"))
SLOTS = int(os.environ.get("SI_LLM_SLOTS", "8"))
BLOCK = int(os.environ.get("SI_LLM_BLOCK", "32"))
NB = int(os.environ.get("SI_LLM_NB", "6"))
ROUNDS = int(os.environ.get("SI_LLM_ROUNDS", "3"))
PREFIX = int(os.environ.get("SI_KV_PREFIX", "256"))
VOCAB = 32000

print(f"building {VARIANT} window {WINDOW}", file=sys.stderr)
graph, _, _ = build_llama(VARIANT, batch=1, seq_len=WINDOW,
                          vocab_size=VOCAB)
eng = Engine(EngineConfig(compute_dtype="bfloat16",
                          quant="int8w")).load_model(None, graph=graph)
print("engine loaded", file=sys.stderr)

# token-exact A/B precondition: every chained block's reads must fit
# the rung (start pos 32 + NB blocks of BLOCK <= PREFIX). Env overrides
# that violate it would silently benchmark a WRONG-read computation.
assert 32 + NB * BLOCK <= PREFIX, (
    f"rung coverage violated: 32 + NB*BLOCK = {32 + NB * BLOCK} > "
    f"PREFIX = {PREFIX}; lower SI_LLM_NB/SI_LLM_BLOCK or raise "
    f"SI_KV_PREFIX")

dec = CachedDecoder(eng, kv_dtype="bfloat16", scratch_blocks=True,
                    sample_cap=64)
cache = dec.init_cache(SLOTS)
t_arr = np.full(SLOTS, 0.8, np.float32)
k_arr = np.full(SLOTS, 40, np.int32)
p_arr = np.full(SLOTS, 0.95, np.float32)
key = jax.random.PRNGKey(0)

variants = [("full-window", None), (f"prefix-{PREFIX}", PREFIX)]
for label, pfx in variants:
    t0 = time.perf_counter()
    toks, last, cache = dec.decode_block(
        np.ones(SLOTS), np.full(SLOTS, 32, np.int32), cache, key, 1,
        t_arr, k_arr, p_arr, BLOCK, pfx)
    np.asarray(toks)
    print(f"{label}: block compiled+run in "
          f"{time.perf_counter() - t0:.0f} s", file=sys.stderr)

results = {label: [] for label, _ in variants}
for rnd in range(ROUNDS):
    for label, pfx in variants:
        last = np.ones(SLOTS, np.int64)
        pos = np.full(SLOTS, 32, np.int32)   # re-primed: chain ends at
        t0 = time.perf_counter()             # 32 + NB*BLOCK = 224 < 256
        for i in range(NB):
            toks, last, cache = dec.decode_block(
                last, pos, cache, key, 2 + rnd * NB * BLOCK + i * BLOCK,
                t_arr, k_arr, p_arr, BLOCK, pfx)
            pos = np.minimum(pos + BLOCK, WINDOW - 1)
        np.asarray(toks)        # ONE fetch for the whole chain
        wall = time.perf_counter() - t0
        ms_tok = wall / (NB * BLOCK) * 1e3
        tps = SLOTS * NB * BLOCK / wall
        results[label].append(tps)
        print(f"round {rnd} {label}: {wall * 1e3:.0f} ms = "
              f"{ms_tok:.2f} ms/tok-step = {tps:.0f} tok/s",
              file=sys.stderr, flush=True)

factor = chip_speed_factor()
med = {k: float(np.median(v)) for k, v in results.items()}
full, pref = med["full-window"], med[f"prefix-{PREFIX}"]
print(f"chip_speed_factor {factor:.3f}", file=sys.stderr)
print(f"medians: {med}  prefix/full = {pref / full:.2f}x",
      file=sys.stderr)
print(f'{{"metric": "llama_{VARIANT}_w{WINDOW}_kv_prefix_speedup", '
      f'"value": {pref / full:.3f}, "unit": "x", '
      f'"full_toks": {full:.0f}, "prefix_toks": {pref:.0f}, '
      f'"chip_speed_factor": {factor:.3f}}}')
