"""Per-HLO-op profile of the llama decode step ([slots,1]).

The "small" decode step measures 3.6-3.9 ms/token-step on chip —
far above both its weight-read roofline (~60 us) and a per-op
overhead estimate for ~150 small ops. This profiles one step_sample
executable with xprof hlo_stats to attribute the time: suspects are
the per-layer KV-cache scatter updates (`.at[rows,:,pos,:].set` — XLA
scatters are slow on TPU), the [8,1,E] matmul fusions, or something
else entirely. Evidence decides the optimization (QKV fusion vs
one-hot cache update vs nothing).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/simpleinfer_tpu/xla"))

from simpleinfer_tpu import Engine, EngineConfig
from simpleinfer_tpu.profiling import format_hlo_stats
from simpleinfer_tpu.zoo import build_llama
from simpleinfer_tpu.zoo.generate import CachedDecoder

VARIANT = os.environ.get("SI_LLM_VARIANT", "small")
WINDOW = int(os.environ.get("SI_LLM_WINDOW", "256"))
SLOTS = int(os.environ.get("SI_LLM_SLOTS", "8"))
ITERS = int(os.environ.get("SI_LLM_ITERS", "20"))

graph, _, _ = build_llama(VARIANT, batch=1, seq_len=WINDOW,
                          vocab_size=32000)
eng = Engine(EngineConfig(compute_dtype="bfloat16")).load_model(
    None, graph=graph)
dec = CachedDecoder(eng)
key = jax.random.PRNGKey(0)
t_arr = np.zeros(SLOTS, np.float32)
k_arr = np.zeros(SLOTS, np.int32)
p_arr = np.ones(SLOTS, np.float32)
caches = dec.init_cache(SLOTS)

from simpleinfer_tpu.profiling import hlo_stats, trace

BLOCK = int(os.environ.get("SI_LLM_PROFILE_BLOCK", "0"))
pos = np.full(SLOTS, 64, np.int32)
if BLOCK:
    # profile the production executable: the lax.scan decode block
    last, _l, caches = dec.decode_block(
        np.ones(SLOTS), pos, caches, key, 0, t_arr, k_arr, p_arr,
        BLOCK)   # compile outside the trace
    np.asarray(last)
    last = _l
    with trace("/tmp/si_llm_step_profile") as d:
        for i in range(ITERS):
            toks, last, caches = dec.decode_block(
                last, pos, caches, key, 1 + i * BLOCK, t_arr, k_arr,
                p_arr, BLOCK)
        np.asarray(toks)
    rows = hlo_stats(d)
    print(format_hlo_stats(rows, top=40, iters=ITERS * BLOCK))
else:
    # drive the REAL donated step executable (re-jitting a pure wrapper
    # would lose cache donation and bill every scatter a cache copy)
    toks = np.ones((SLOTS, 1))
    tok, caches = dec.step_sample(toks, pos, caches, key, 0, t_arr,
                                  k_arr, p_arr)  # compile
    np.asarray(tok)
    with trace("/tmp/si_llm_step_profile") as d:
        for i in range(ITERS):
            tok, caches = dec.step_sample(toks, pos, caches, key, i,
                                          t_arr, k_arr, p_arr)
        np.asarray(tok)
    rows = hlo_stats(d)
    print(format_hlo_stats(rows, top=40, iters=ITERS))
