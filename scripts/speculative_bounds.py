"""Speculative decoding on-chip bounds (no real weights available).

With random zoo weights a small draft never matches the target
(acceptance ~0), so the true production rate is unmeasurable here
(BASELINE_RESULTS.md blocker). What IS measurable, interleaved:

  plain     : target-only chained block decode (the standing substrate)
  spec-upper: SpeculativeDecoder with draft == TARGET (acceptance 1.0
              by construction) — the ceiling: k tokens per
              draft-block + verify + fetch round, but the "draft" here
              costs a full target block, so the REAL ceiling with a
              cheap draft lies between this and k x verify-rate
  spec-floor: a small random draft (acceptance ~0) — every round pays
              draft + verify for ~1 token; the worst case

Real-weight acceptance (e.g. llama-1B + llama-68M distilled pairs
publish 0.6-0.8) would land between the bounds; the loop itself and
its losslessness are CI-pinned (tests/test_speculative.py).
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
from simpleinfer_tpu.zoo.speculative import SpeculativeDecoder

TARGET = os.environ.get("SI_SPEC_TARGET", "base")
DRAFT = os.environ.get("SI_SPEC_DRAFT", "small")
WINDOW = int(os.environ.get("SI_LLM_WINDOW", "512"))
N = int(os.environ.get("SI_SPEC_BATCH", "8"))
K = int(os.environ.get("SI_SPEC_K", "4"))
STEPS = int(os.environ.get("SI_SPEC_STEPS", "96"))
ROUNDS = int(os.environ.get("SI_LLM_ROUNDS", "3"))
VOCAB = 32000

print(f"target {TARGET} draft {DRAFT} w{WINDOW} n{N} k{K}",
      file=sys.stderr)
tg, _, _ = build_llama(TARGET, batch=1, seq_len=WINDOW,
                       vocab_size=VOCAB)
dg, _, _ = build_llama(DRAFT, batch=1, seq_len=WINDOW, vocab_size=VOCAB,
                       seed=3)
cfg = EngineConfig(compute_dtype="bfloat16", quant="int8w")
target = Engine(cfg).load_model(None, graph=tg)
draft = Engine(cfg).load_model(None, graph=dg)
print("engines loaded", file=sys.stderr)

rng = np.random.default_rng(0)
prompt = rng.integers(1, VOCAB, size=(N, 16))

plain = CachedDecoder(target, kv_dtype="bfloat16", scratch_blocks=True,
                      sample_cap=64)
variants = {
    "spec-upper": SpeculativeDecoder(target, target, k=K),
    "spec-floor": SpeculativeDecoder(target, draft, k=K),
}

# compile out of band
t0 = time.perf_counter()
plain.generate(prompt, steps=STEPS)
print(f"plain compiled+run {time.perf_counter() - t0:.0f}s",
      file=sys.stderr, flush=True)
for name, spec in variants.items():
    t0 = time.perf_counter()
    spec.generate(prompt, steps=STEPS)
    print(f"{name} compiled+run {time.perf_counter() - t0:.0f}s "
          f"(acceptance {spec.acceptance:.2f})", file=sys.stderr,
          flush=True)

res = {"plain": [], "spec-upper": [], "spec-floor": []}
for rnd in range(ROUNDS):
    t0 = time.perf_counter()
    plain.generate(prompt, steps=STEPS)
    res["plain"].append(N * STEPS / (time.perf_counter() - t0))
    for name, spec in variants.items():
        t0 = time.perf_counter()
        spec.generate(prompt, steps=STEPS)
        res[name].append(N * STEPS / (time.perf_counter() - t0))
    print(f"round {rnd}: " + ", ".join(
        f"{k} {v[-1]:.0f} tok/s" for k, v in res.items()),
        file=sys.stderr, flush=True)

factor = chip_speed_factor()
med = {k: float(np.median(v)) for k, v in res.items()}
acc = {k: v.acceptance for k, v in variants.items()}
print(f"chip_speed_factor {factor:.3f}; medians {med}; "
      f"acceptance {acc}", file=sys.stderr)
print(f'{{"metric": "llama_{TARGET}_speculative_upper_vs_plain", '
      f'"value": {med["spec-upper"] / med["plain"]:.3f}, "unit": "x", '
      f'"medians_tps": {str({k: round(v) for k, v in med.items()}).replace(chr(39), chr(34))}, '
      f'"chip_speed_factor": {factor:.3f}}}')
