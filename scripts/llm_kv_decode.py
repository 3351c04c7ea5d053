"""KV-cache dtype A/B at the KV-bound decode regime.

At "base" (0.9B) with window 2048, the per-step cache read is the
dominant decode cost: f32 KV = 16L x 2 x [8,8,2048,64] x 4B = 2.15 GB
per step vs ~0.95 GB of int8w weights. Storage dtype converts
~directly into tok/s there:

    f32 KV  -> bf16 KV (half)  -> int8 KV (quarter + per-vector scales)

ONE int8w engine, one decoder per kv_dtype sharing it, interleaved
rounds (docs/PERF.md drift discipline), chained-block enqueue with a
single fetch per reading (same method as llm_base_decode.py).
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
NB = int(os.environ.get("SI_LLM_NB", "4"))
ROUNDS = int(os.environ.get("SI_LLM_ROUNDS", "3"))
# (kv_dtype, scratch_blocks): scratch stops rewriting the big cache
# every scan step (frozen cache + per-block scratch, merged once)
CONFIGS = (("float32", False), ("float32", True),
           ("bfloat16", False), ("bfloat16", True),
           ("int8", False), ("int8", True))
_sel = os.environ.get("SI_LLM_CONFIGS")  # e.g. "float32,bfloat16+scratch"
if _sel:
    want = set(_sel.split(","))
    CONFIGS = tuple((kd, sc) for kd, sc in CONFIGS
                    if kd + ("+scratch" if sc else "") in want)

print(f"building {VARIANT} window {WINDOW} (one int8w engine, one "
      f"decoder per kv_dtype)", file=sys.stderr)
graph, _, _ = build_llama(VARIANT, batch=1, seq_len=WINDOW,
                          vocab_size=32000)
t0 = time.perf_counter()
eng = Engine(EngineConfig(compute_dtype="bfloat16",
                          quant="int8w")).load_model(None, graph=graph)
print(f"engine loaded in {time.perf_counter() - t0:.0f} s",
      file=sys.stderr)

t_arr = np.zeros(SLOTS, np.float32)
k_arr = np.zeros(SLOTS, np.int32)
p_arr = np.ones(SLOTS, np.float32)
key = jax.random.PRNGKey(0)

state = {}
for kd, scr in CONFIGS:
    label = kd + ("+scratch" if scr else "")
    dec = CachedDecoder(eng, kv_dtype=kd, scratch_blocks=scr)
    c = dec.init_cache(SLOTS)
    t0 = time.perf_counter()
    toks, last, c = dec.decode_block(
        np.ones(SLOTS), np.zeros(SLOTS, np.int32), c, key, 1,
        t_arr, k_arr, p_arr, BLOCK)
    np.asarray(toks)
    print(f"{label}: block compiled+run in {time.perf_counter() - t0:.0f}"
          " s", file=sys.stderr)
    state[label] = (dec, last, np.full(SLOTS, 1, np.int32), c)

results = {k: [] for k in state}
for rnd in range(ROUNDS):
    for label in state:
        dec, last, pos, c = state[label]
        t0 = time.perf_counter()
        for i in range(NB):
            toks, last, c = dec.decode_block(
                last, pos, c, key, 2 + rnd * NB * BLOCK + i * BLOCK,
                t_arr, k_arr, p_arr, BLOCK)
            pos = np.minimum(pos + BLOCK, WINDOW - 1)
        np.asarray(toks)        # ONE fetch per reading
        wall = time.perf_counter() - t0
        state[label] = (dec, last, pos, c)
        ms_tok = wall / (NB * BLOCK) * 1e3
        tps = SLOTS * NB * BLOCK / wall
        results[label].append(tps)
        print(f"round {rnd} kv={label}: {wall * 1e3:.0f} ms / {NB} blocks "
              f"= {ms_tok:.2f} ms/tok-step = {tps:.0f} tok/s",
              file=sys.stderr)

factor = chip_speed_factor()
print(f"chip_speed_factor {factor:.3f}", file=sys.stderr)
med = {k: float(np.median(v)) for k, v in results.items()}
print(f"medians: {med}", file=sys.stderr)
best = max(med, key=med.get)
print(f"best: {best} at {med[best]:.0f} tok/s "
      f"= {med[best] / med['float32']:.2f}x over float32 baseline",
      file=sys.stderr)
print(f'{{"metric": "llama_base_w{WINDOW}_decode_toks_per_s", '
      f'"value": {med[best]:.1f}, "unit": "tok/s", '
      f'"best_config": "{best}", '
      f'"speedup_vs_f32": {med[best] / med["float32"]:.2f}, '
      f'"chip_speed_factor": {factor:.3f}}}')
