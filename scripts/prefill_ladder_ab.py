"""Admission-prefill bucket ladder A/B (mixed-length prompts).

Admission pads a wave's prompts to one width; before round-3 that
width was always the compiled window, so a single long prompt (or just
a long window) inflated every short wave's admission dispatch. The
prefill ladder admits each wave at the smallest bucket covering its
longest prompt. Two measurements, interleaved:

1. Direct: the fused-admission dispatch (prefill_install) wall at
   bucket widths vs the full window, same short prompt.
2. Service: mixed 16/256-token prompts through GenerationService with
   prefill_ladder auto vs None (ladder off) — tok/s + mean latency.

Method: docs/PERF.md — interleaved rounds, chip factor. Admission
walls are single dispatches (~RTT + device time); the RTT component
(~26-33 ms) is constant across variants, so deltas are device time.
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
from simpleinfer_tpu.zoo.generate import CachedDecoder

VARIANT = os.environ.get("SI_LLM_VARIANT", "base")
WINDOW = int(os.environ.get("SI_LLM_WINDOW", "2048"))
SLOTS = int(os.environ.get("SI_LLM_SLOTS", "8"))
ROUNDS = int(os.environ.get("SI_LLM_ROUNDS", "3"))
VOCAB = 32000

print(f"building {VARIANT} w{WINDOW}", file=sys.stderr)
graph, _, _ = build_llama(VARIANT, batch=1, seq_len=WINDOW,
                          vocab_size=VOCAB)
eng = Engine(EngineConfig(compute_dtype="bfloat16",
                          quant="int8w")).load_model(None, graph=graph)
print("engine loaded", file=sys.stderr)
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)

# ---- 1. direct admission dispatch at each bucket width ---------------------
dec = CachedDecoder(eng, kv_dtype="bfloat16", scratch_blocks=True,
                    sample_cap=64)
caches = dec.init_cache(SLOTS)
t_a = np.zeros(SLOTS, np.float32)
k_a = np.zeros(SLOTS, np.int32)
p_a = np.ones(SLOTS, np.float32)
rows = np.arange(SLOTS, dtype=np.int32)
WIDTHS = [w for w in (64, 256, 1024, WINDOW) if w <= WINDOW]
PLEN = 16

for w in WIDTHS:  # compile out of band
    win = np.zeros((SLOTS, w), np.float32)
    win[:, :PLEN] = rng.integers(1, VOCAB, size=(SLOTS, PLEN))
    t0 = time.perf_counter()
    tok, caches = dec.prefill_install(win, np.full(SLOTS, PLEN), key, 0,
                                      t_a, k_a, p_a, caches, rows)
    np.asarray(tok)
    print(f"compile prefill w={w}: {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

walls = {w: [] for w in WIDTHS}
for rnd in range(ROUNDS * 2):
    for w in WIDTHS:
        win = np.zeros((SLOTS, w), np.float32)
        win[:, :PLEN] = rng.integers(1, VOCAB, size=(SLOTS, PLEN))
        t0 = time.perf_counter()
        tok, caches = dec.prefill_install(win, np.full(SLOTS, PLEN),
                                          key, rnd, t_a, k_a, p_a,
                                          caches, rows)
        np.asarray(tok)
        walls[w].append((time.perf_counter() - t0) * 1e3)
med_w = {w: float(np.median(v)) for w, v in walls.items()}
for w, ms in med_w.items():
    print(f"admission dispatch (P={PLEN}, bucket {w}): {ms:.1f} ms",
          file=sys.stderr)

# ---- 2. service with mixed 16/256-token prompts -----------------------------
MAXNEW = 32
NREQ = 2 * SLOTS


def run_service(ladder):
    svc = GenerationService(eng, slots=SLOTS, decode_horizon=16,
                            kv_dtype="bfloat16",
                            prefill_ladder=ladder)
    svc.warmup().start()
    svc.submit(rng.integers(1, VOCAB, size=16).tolist(),
               max_new=MAXNEW, temperature=0.8,
               top_k=40).result(timeout=900)
    svc.stats = type(svc.stats)()
    t0 = time.perf_counter()
    futs = []
    for i in range(NREQ):
        plen = 256 if i % 4 == 0 else 16    # mixed spread
        futs.append(svc.submit(
            rng.integers(1, VOCAB, size=plen).tolist(),
            max_new=MAXNEW, temperature=0.8, top_k=40))
    outs = [f.result(timeout=900) for f in futs]
    wall = time.perf_counter() - t0
    lat = svc.stats.mean_latency_ms
    svc.stop()
    toks = sum(MAXNEW for _ in outs)
    return toks / wall, lat


res = {"ladder": [], "off": []}
lats = {"ladder": [], "off": []}
for rnd in range(ROUNDS):
    for name, ladder in (("ladder", "auto"), ("off", None)):
        tps, lat = run_service(ladder)
        res[name].append(tps)
        lats[name].append(lat)
        print(f"round {rnd} service {name}: {tps:.0f} tok/s, "
              f"mean latency {lat:.0f} ms", file=sys.stderr, flush=True)

factor = chip_speed_factor()
med = {k: float(np.median(v)) for k, v in res.items()}
medl = {k: float(np.median(v)) for k, v in lats.items()}
gain = med["ladder"] / med["off"]
print(f"chip_speed_factor {factor:.3f}", file=sys.stderr)
print(f"medians: {med} latency {medl}", file=sys.stderr)
print(f'{{"metric": "llama_{VARIANT}_w{WINDOW}_prefill_ladder_gain", '
      f'"value": {gain:.3f}, "unit": "x", '
      f'"dispatch_ms": {str({k: round(v, 1) for k, v in med_w.items()}).replace(chr(39), chr(34))}, '
      f'"service_tps": {str({k: round(v) for k, v in med.items()}).replace(chr(39), chr(34))}, '
      f'"latency_ms": {str({k: round(v) for k, v in medl.items()}).replace(chr(39), chr(34))}, '
      f'"chip_speed_factor": {factor:.3f}}}')
