"""Per-row decode attention (Pallas) vs XLA rungs on a MIXED-AGE pool.

The kv_prefix rung ladder is pool-GLOBAL: one long-lived row drags
every row's attention read back to the full window (serving/llm.py
choose_prefix takes max over live rows). kernels/decode_attn reads
each row's OWN occupied prefix, so a young pool's rate should survive
one old neighbour. This script measures exactly that scenario at the
0.9B preset, plus a young-only pool where the rung ladder is at its
best (the kernel must not lose much there to be a default candidate).

Variants per pool shape, interleaved rounds:
  xla-full    : scratch blocks, full-window reads (the rung-less floor)
  xla-rung    : scratch blocks, kv_prefix = smallest rung covering the
                pool max (mixed pool: the OLD row forces full window)
  pallas      : decode_attn="pallas" per-row kernel

Method: docs/PERF.md discipline — chained blocks, ONE fetch per
reading, rounds interleaved within the same minutes, chip factor.
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
KV = os.environ.get("SI_LLM_KV", "int8")   # the kernel's headline case
YOUNG = 64                                  # young rows' position
OLD = WINDOW - NB * BLOCK - 8               # the one old row
VOCAB = 32000

print(f"building {VARIANT} w{WINDOW} slots {SLOTS} kv {KV}",
      file=sys.stderr)
graph, _, _ = build_llama(VARIANT, batch=1, seq_len=WINDOW,
                          vocab_size=VOCAB)
eng = Engine(EngineConfig(compute_dtype="bfloat16",
                          quant="int8w")).load_model(None, graph=graph)
print("engine loaded", file=sys.stderr)

key = jax.random.PRNGKey(0)
t_arr = np.full(SLOTS, 0.8, np.float32)
k_arr = np.full(SLOTS, 40, np.int32)
p_arr = np.full(SLOTS, 0.95, np.float32)


def rung_for(maxpos):
    # smallest pow2 rung covering maxpos + NB*BLOCK (the serving
    # choose_prefix rule), full window if none
    need = maxpos + NB * BLOCK
    for p in (128, 256, 512, 1024):
        if p >= need:
            return p
    return None


def make_decoder(mode):
    if mode == "pallas":
        return CachedDecoder(eng, kv_dtype=KV, scratch_blocks=True,
                             sample_cap=64, decode_attn="pallas")
    return CachedDecoder(eng, kv_dtype=KV, scratch_blocks=True,
                         sample_cap=64)


def run_chain(dec, pos0, prefix, seq0):
    last = np.ones(SLOTS, np.int64)
    pos = pos0.copy()
    t0 = time.perf_counter()
    for i in range(NB):
        toks, last, run_chain.cache = dec.decode_block(
            last, pos, run_chain.cache, key, seq0 + i * BLOCK,
            t_arr, k_arr, p_arr, BLOCK, prefix)
        pos = np.minimum(pos + BLOCK, WINDOW - 1)
    np.asarray(toks)
    return time.perf_counter() - t0


POOLS = {
    "young": np.full(SLOTS, YOUNG, np.int32),
    "mixed": np.array([OLD] + [YOUNG] * (SLOTS - 1), np.int32),
}
# pallas-rung: the kernel with the rung as a STATIC grid bound
# (max_len) — per-row skipping AND rung-sized grids (round-3)
VARIANTS = ["xla-full", "xla-rung", "pallas", "pallas-rung"]
decs = {"xla": make_decoder("xla"), "pallas": make_decoder("pallas")}

# compile everything out of band
for pool_name, pos0 in POOLS.items():
    for vn in VARIANTS:
        dec = decs["pallas" if vn.startswith("pallas") else "xla"]
        prefix = (rung_for(int(pos0.max()))
                  if vn.endswith("rung") else None)
        run_chain.cache = dec.init_cache(SLOTS)
        t0 = time.perf_counter()
        run_chain(dec, pos0, prefix, 1)
        print(f"compile {pool_name}/{vn} (prefix {prefix}): "
              f"{time.perf_counter() - t0:.0f} s", file=sys.stderr,
              flush=True)

results = {(p, v): [] for p in POOLS for v in VARIANTS}
for rnd in range(ROUNDS):
    for pool_name, pos0 in POOLS.items():
        for vn in VARIANTS:
            dec = decs["pallas" if vn.startswith("pallas") else "xla"]
            prefix = (rung_for(int(pos0.max()))
                      if vn.endswith("rung") else None)
            run_chain.cache = dec.init_cache(SLOTS)
            wall = run_chain(dec, pos0, prefix, 100 + rnd)
            tps = SLOTS * NB * BLOCK / wall
            results[(pool_name, vn)].append(tps)
            print(f"round {rnd} {pool_name}/{vn}: "
                  f"{wall / (NB * BLOCK) * 1e3:.2f} ms/tok-step = "
                  f"{tps:.0f} tok/s", file=sys.stderr, flush=True)

factor = chip_speed_factor()
med = {f"{p}/{v}": float(np.median(r)) for (p, v), r in results.items()}
print(f"chip_speed_factor {factor:.3f}", file=sys.stderr)
for k, v in med.items():
    print(f"median {k}: {v:.0f} tok/s", file=sys.stderr)
mixed_gain = med["mixed/pallas"] / med["mixed/xla-rung"]
print(f'{{"metric": "llama_{VARIANT}_w{WINDOW}_decode_attn_mixed_gain", '
      f'"value": {mixed_gain:.3f}, "unit": "x", '
      f'"medians": {str(med).replace(chr(39), chr(34))}, '
      f'"chip_speed_factor": {factor:.3f}}}')
