"""E2E decode A/B: full-vocab sampler vs sample_cap in the 0.9B step.

scripts/sampling_probe.py isolates the sampler kernel; this measures
what the cap is worth inside the real jitted decode block at the
best-known 0.9B serving config (int8w weights, bf16 KV + scratch
blocks, slots 8, window 512 — docs/PERF.md "Slot scaling" section).
One engine, two CachedDecoders (cap None vs 64), interleaved rounds,
chained-block enqueue with ONE fetch per reading (the
llm_base_decode.py method). Sampling params are serving-typical
(t=0.8, top_k=40, top_p=0.95 — inside the cap's exact regime).

Usage: python scripts/sample_cap_ab.py   (real chip, ~10 min cold)
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
WINDOW = int(os.environ.get("SI_LLM_WINDOW", "512"))
SLOTS = int(os.environ.get("SI_LLM_SLOTS", "8"))
BLOCK = int(os.environ.get("SI_LLM_BLOCK", "32"))
NB = int(os.environ.get("SI_LLM_NB", "6"))
ROUNDS = int(os.environ.get("SI_LLM_ROUNDS", "3"))
CAP = int(os.environ.get("SI_SAMPLE_CAP", "64"))
VOCAB = 32000

print(f"building {VARIANT} window {WINDOW}", file=sys.stderr)
graph, _, _ = build_llama(VARIANT, batch=1, seq_len=WINDOW,
                          vocab_size=VOCAB)
eng = Engine(EngineConfig(compute_dtype="bfloat16",
                          quant="int8w")).load_model(None, graph=graph)
print("engine loaded", file=sys.stderr)

t_arr = np.full(SLOTS, 0.8, np.float32)
k_arr = np.full(SLOTS, 40, np.int32)
p_arr = np.full(SLOTS, 0.95, np.float32)
key = jax.random.PRNGKey(0)

decs, state = {}, {}
for label, cap in (("full-sort", None), (f"cap-{CAP}", CAP)):
    dec = CachedDecoder(eng, kv_dtype="bfloat16", scratch_blocks=True,
                        sample_cap=cap)
    c = dec.init_cache(SLOTS)
    t0 = time.perf_counter()
    toks, last, c = dec.decode_block(
        np.ones(SLOTS), np.zeros(SLOTS, np.int32), c, key, 1,
        t_arr, k_arr, p_arr, BLOCK)
    np.asarray(toks)
    print(f"{label}: block compiled+run in "
          f"{time.perf_counter() - t0:.0f} s", file=sys.stderr)
    decs[label] = dec
    state[label] = (last, np.full(SLOTS, 1, np.int32), c)

results = {k: [] for k in decs}
for rnd in range(ROUNDS):
    for label, dec in decs.items():
        last, pos, c = state[label]
        t0 = time.perf_counter()
        for i in range(NB):
            toks, last, c = dec.decode_block(
                last, pos, c, key, 2 + rnd * NB * BLOCK + i * BLOCK,
                t_arr, k_arr, p_arr, BLOCK)
            pos = np.minimum(pos + BLOCK, WINDOW - 1)
        np.asarray(toks)        # ONE fetch for the whole chain
        wall = time.perf_counter() - t0
        state[label] = (last, pos, c)
        ms_tok = wall / (NB * BLOCK) * 1e3
        tps = SLOTS * NB * BLOCK / wall
        results[label].append(tps)
        print(f"round {rnd} {label}: {wall * 1e3:.0f} ms = "
              f"{ms_tok:.2f} ms/tok-step = {tps:.0f} tok/s",
              file=sys.stderr, flush=True)

factor = chip_speed_factor()
med = {k: float(np.median(v)) for k, v in results.items()}
full, capped = med["full-sort"], med[f"cap-{CAP}"]
print(f"chip_speed_factor {factor:.3f}", file=sys.stderr)
print(f"medians: {med}  cap/full = {capped / full:.2f}x",
      file=sys.stderr)
print(f'{{"metric": "llama_{VARIANT}_decode_sample_cap_speedup", '
      f'"value": {capped / full:.3f}, "unit": "x", '
      f'"full_toks": {full:.0f}, "capped_toks": {capped:.0f}, '
      f'"chip_speed_factor": {factor:.3f}}}')
