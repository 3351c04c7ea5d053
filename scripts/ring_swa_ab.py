"""Ring-stored sliding-window decode rate vs full attention (aged).

The ring bounds a sliding op's KV cache AND its per-step attention
read by the window W instead of the compiled length: an aged pool
decodes at the same rate forever. This measures the 0.9B preset at
w2048, pool aged to position ~1500, interleaved:

  full-attn  : standard model, full-window reads (no rung covers)
  sliding-ring: sliding_window=256 -> 320-slot ring cache

Different SEMANTICS (banded vs full attention) — this is a throughput
comparison of the two model families at the same scale, not a parity
check; the ring model also uses 2048/320 = 6.4x less KV memory.
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
SLOTS = int(os.environ.get("SI_LLM_SLOTS", "32"))
SW = int(os.environ.get("SI_SWA_WINDOW", "256"))
BLOCK = int(os.environ.get("SI_LLM_BLOCK", "32"))
NB = int(os.environ.get("SI_LLM_NB", "4"))
ROUNDS = int(os.environ.get("SI_LLM_ROUNDS", "3"))
AGED = WINDOW - NB * BLOCK - 8
VOCAB = 32000

print(f"{VARIANT} w{WINDOW} slots {SLOTS} sw {SW}", file=sys.stderr)
cfg = EngineConfig(compute_dtype="bfloat16", quant="int8w")
decs = {}
for name, sw in (("full-attn", None), ("sliding-ring", SW)):
    g, _, _ = build_llama(VARIANT, batch=1, seq_len=WINDOW,
                          vocab_size=VOCAB, sliding_window=sw)
    eng = Engine(cfg).load_model(None, graph=g)
    decs[name] = CachedDecoder(eng, kv_dtype="bfloat16",
                               scratch_blocks=True, sample_cap=64)
    leaf = jax.tree_util.tree_leaves(decs[name].init_cache(1))[0]
    print(f"{name}: cache length {leaf.shape[2]}", file=sys.stderr)

key = jax.random.PRNGKey(0)
t_arr = np.full(SLOTS, 0.8, np.float32)
k_arr = np.full(SLOTS, 40, np.int32)
p_arr = np.full(SLOTS, 0.95, np.float32)
pos0 = np.full(SLOTS, AGED, np.int32)


def run_chain(dec, cache, seq0):
    last = np.ones(SLOTS, np.int64)
    pos = pos0.copy()
    t0 = time.perf_counter()
    for i in range(NB):
        toks, last, cache = dec.decode_block(
            last, pos, cache, key, seq0 + i * BLOCK, t_arr, k_arr,
            p_arr, BLOCK)
        pos = np.minimum(pos + BLOCK, WINDOW - 1)
    np.asarray(toks)
    return time.perf_counter() - t0, cache


caches = {}
for name, dec in decs.items():
    caches[name] = dec.init_cache(SLOTS)
    t0 = time.perf_counter()
    _, caches[name] = run_chain(dec, caches[name], 1)
    print(f"compile {name}: {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

res = {n: [] for n in decs}
for rnd in range(ROUNDS):
    for name, dec in decs.items():
        wall, caches[name] = run_chain(dec, caches[name], 100 + rnd)
        tps = SLOTS * NB * BLOCK / wall
        res[name].append(tps)
        print(f"round {rnd} {name}: "
              f"{wall / (NB * BLOCK) * 1e3:.2f} ms/tok-step = "
              f"{tps:.0f} tok/s", file=sys.stderr, flush=True)

factor = chip_speed_factor()
med = {k: float(np.median(v)) for k, v in res.items()}
gain = med["sliding-ring"] / med["full-attn"]
print(f"chip_speed_factor {factor:.3f}; medians {med}", file=sys.stderr)
print(f'{{"metric": "llama_{VARIANT}_w{WINDOW}_sliding_ring_aged_gain", '
      f'"value": {gain:.3f}, "unit": "x", '
      f'"medians_tps": {str({k: round(v) for k, v in med.items()}).replace(chr(39), chr(34))}, '
      f'"chip_speed_factor": {factor:.3f}}}')
