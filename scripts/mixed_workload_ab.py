"""Mixed-age SERVICE workload: long chats next to short chats.

The substrate A/B (scripts/decode_attn_ab.py) showed the per-row
kernel 2.52x on a mixed-age pool; the uniform-aging service run showed
1.13x (rung-friendly). This script measures the REALISTIC shape the
auto policy exists for: a few long-lived requests occupy rows to deep
positions while a stream of short requests churns through the other
slots. Under decode_attn="xla" the old rows block every rung and ALL
short requests pay full-window reads; under "auto" the kernel reads
per-row and the short stream keeps its young-pool rate.

Method: interleaved variants, same seeded workload; short-request
throughput and latency are the headline (the long requests are the
backdrop). int8 KV (the kernel's headline dtype), w2048, slots 32.
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
from simpleinfer_tpu.serving.llm import GenerationService
from simpleinfer_tpu.zoo import build_llama

VARIANT = os.environ.get("SI_LLM_VARIANT", "base")
WINDOW = int(os.environ.get("SI_LLM_WINDOW", "2048"))
SLOTS = int(os.environ.get("SI_LLM_SLOTS", "32"))
ROUNDS = int(os.environ.get("SI_LLM_ROUNDS", "2"))
N_LONG = int(os.environ.get("SI_MIX_LONG", "4"))
LONG_NEW = int(os.environ.get("SI_MIX_LONG_NEW", "1700"))
SHORT_NEW = int(os.environ.get("SI_MIX_SHORT_NEW", "48"))
N_SHORT = int(os.environ.get("SI_MIX_SHORT", "64"))
AGE_TO = int(os.environ.get("SI_MIX_AGE_TO", "1100"))
VOCAB = 32000

print(f"{VARIANT} w{WINDOW} slots {SLOTS}: {N_LONG} long x {LONG_NEW} "
      f"+ {N_SHORT} short x {SHORT_NEW}", file=sys.stderr)
graph, _, _ = build_llama(VARIANT, batch=1, seq_len=WINDOW,
                          vocab_size=VOCAB)
eng = Engine(EngineConfig(compute_dtype="bfloat16",
                          quant="int8w")).load_model(None, graph=graph)
print("engine loaded", file=sys.stderr)
rng = np.random.default_rng(0)


def run(attn):
    svc = GenerationService(eng, slots=SLOTS, decode_horizon=16,
                            kv_dtype="int8", prefill_ladder=(256,),
                            decode_attn=attn)
    svc.warmup().start()
    # throwaway to settle compile/admission
    svc.submit(rng.integers(1, VOCAB, size=16).tolist(),
               max_new=16, temperature=0.8, top_k=40).result(timeout=900)
    # backdrop: long-lived rows age DETERMINISTICALLY past the top
    # rung (1024) before the short stream starts — the first version
    # of this script slept a fixed 6 s, the longs only reached ~700,
    # and the whole A/B measured a rung-covered pool (1.00x, both
    # legs; kept in the log as a method note)
    base_tokens = svc.stats.tokens_out
    longs = [svc.submit(rng.integers(1, VOCAB, size=64).tolist(),
                        max_new=LONG_NEW, temperature=0.8, top_k=40)
             for _ in range(N_LONG)]
    need = N_LONG * (AGE_TO - 64)
    while svc.stats.tokens_out - base_tokens < need:
        time.sleep(0.5)
    t0 = time.perf_counter()
    shorts = [svc.submit(rng.integers(1, VOCAB, size=16).tolist(),
                         max_new=SHORT_NEW, temperature=0.8, top_k=40)
              for _ in range(N_SHORT)]
    outs = [f.result(timeout=1800) for f in shorts]
    wall = time.perf_counter() - t0
    for f in longs:
        f.result(timeout=1800)
    lat = svc.stats.mean_latency_ms
    svc.stop()
    toks = sum(SHORT_NEW for _ in outs)
    return toks / wall, lat


res = {"xla": [], "auto": []}
for rnd in range(ROUNDS):
    for attn in ("xla", "auto"):
        tps, lat = run(attn)
        res[attn].append(tps)
        print(f"round {rnd} {attn}: short-stream {tps:.0f} tok/s, "
              f"mean latency {lat:.0f} ms", file=sys.stderr, flush=True)

factor = chip_speed_factor()
med = {k: float(np.median(v)) for k, v in res.items()}
gain = med["auto"] / med["xla"]
print(f"chip_speed_factor {factor:.3f}; medians {med}", file=sys.stderr)
print(f'{{"metric": "llama_{VARIANT}_w{WINDOW}_mixed_workload_gain", '
      f'"value": {gain:.3f}, "unit": "x", '
      f'"short_stream_tps": {str({k: round(v) for k, v in med.items()}).replace(chr(39), chr(34))}, '
      f'"chip_speed_factor": {factor:.3f}}}')
