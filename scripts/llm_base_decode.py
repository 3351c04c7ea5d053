"""Decode throughput at llama-1B scale ("base" preset): bf16 vs int8w.

At 0.9B params the decode step is weight-bandwidth-bound (each step
reads every weight once; batch 8 amortizes nothing on the HBM side),
so int8-weight storage should approach 2x bf16 — the classic
weight-only-quant decode win that is invisible on the dispatch-bound
"small" preset (docs/PERF.md).

Method: both engines built from ONE graph in one process, measured
interleaved (docs/PERF.md drift discipline). Each reading enqueues NB
decode blocks chained device-to-device (decode_block's last-token
output feeds the next dispatch) and fetches only the final tokens, so
per-reading host cost is one RTT — wall/NB/K approximates the
per-token device time to within the ~3 ms enqueue overhead per block.
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
VOCAB = 32000

print(f"building {VARIANT} window {WINDOW} (one graph, two engines)",
      file=sys.stderr)
graph, _, _ = build_llama(VARIANT, batch=1, seq_len=WINDOW,
                          vocab_size=VOCAB)
t_arr = np.zeros(SLOTS, np.float32)
k_arr = np.zeros(SLOTS, np.int32)
p_arr = np.ones(SLOTS, np.float32)
key = jax.random.PRNGKey(0)

QUANTS = [q.strip() for q in os.environ.get(
    "SI_LLM_QUANTS", "bf16,int8w").split(",") if q.strip()]
decs, caches = {}, {}
for label in QUANTS:
    quant = None if label == "bf16" else label
    t0 = time.perf_counter()
    eng = Engine(EngineConfig(compute_dtype="bfloat16",
                              quant=quant)).load_model(None, graph=graph)
    decs[label] = CachedDecoder(eng)
    caches[label] = decs[label].init_cache(SLOTS)
    print(f"{label}: engine loaded in {time.perf_counter() - t0:.0f} s",
          file=sys.stderr)

# compile the block executable per engine OUT of the timed window
for label, dec in decs.items():
    t0 = time.perf_counter()
    toks, last, caches[label] = dec.decode_block(
        np.ones(SLOTS), np.zeros(SLOTS, np.int32), caches[label], key, 1,
        t_arr, k_arr, p_arr, BLOCK)
    np.asarray(toks)
    print(f"{label}: block compiled+run in {time.perf_counter() - t0:.0f}"
          " s", file=sys.stderr)
    caches[label] = (toks, last, caches[label])

state = {k: (v[1], np.full(SLOTS, 1, np.int32), v[2])
         for k, v in caches.items()}
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
        print(f"round {rnd} {label}: {wall * 1e3:.0f} ms / {NB} blocks "
              f"= {ms_tok:.2f} ms/tok-step = {tps:.0f} tok/s",
              file=sys.stderr)

factor = chip_speed_factor()
print(f"chip_speed_factor {factor:.3f}", file=sys.stderr)
med = {k: float(np.median(v)) for k, v in results.items()}
base = med.get("bf16") or next(iter(med.values()))
print("medians: " + "  ".join(
    f"{k} {v:.0f} tok/s ({v / base:.2f}x vs bf16)"
    for k, v in med.items()), file=sys.stderr)
print(f'{{"metric": "llama_base_decode_toks_per_s", '
      f'"value": {max(med.values()):.1f}, "unit": "tok/s", '
      f'"int8w_speedup": {med.get("int8w", 0) / base:.2f}, '
      f'"chip_speed_factor": {factor:.3f}}}')
