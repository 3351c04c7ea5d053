"""LLM decode/prefill wall-clock on the real chip.

Quantifies the serving overhaul (batched prefill + fused sampling +
device-side block decode):
- per-step decode wall (the [slots,1] step executable, token fetch)
- BLOCK decode: K tokens per dispatch via lax.scan
  (CachedDecoder.decode_block) vs the per-token loop
- whole-prompt prefill: ONE batched-prefill dispatch vs stepping the
  prompt token-by-token (what admission cost before 2026-08-18)
- GenerationService end-to-end tokens/s, decode_horizon 1 vs K

Wall numbers on the relay-attached chip are dominated by the ~26 ms
dispatch RTT (docs/PERF.md) — the point is the DISPATCH-COUNT ratio,
which carries to any deployment.
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
from simpleinfer_tpu.zoo import build_llama
from simpleinfer_tpu.zoo.generate import CachedDecoder

VARIANT = os.environ.get("SI_LLM_VARIANT", "small")
QUANT = os.environ.get("SI_LLM_QUANT") or None  # int8w: ~2x decode at
                                                # weight-bound scales
KV = os.environ.get("SI_LLM_KV") or None        # KV storage dtype
SCRATCH = bool(int(os.environ.get("SI_LLM_SCRATCH", "1")))
WINDOW = int(os.environ.get("SI_LLM_WINDOW", "256"))
SLOTS = int(os.environ.get("SI_LLM_SLOTS", "8"))
DECODE_ATTN = os.environ.get("SI_LLM_DECODE_ATTN", "xla")
PROMPT = 64

graph, in_name, out_name = build_llama(VARIANT, batch=1, seq_len=WINDOW,
                                       vocab_size=32000)
cfg = EngineConfig(compute_dtype="bfloat16", quant=QUANT)
eng = Engine(cfg).load_model(None, graph=graph)
# the SUBSTRATE decoder carries the same knobs the service variants
# run with, so the service/substrate ratio compares like with like
# the substrate decoder takes only xla/pallas; the service-level
# "auto" policy maps to the xla substrate here
dec = CachedDecoder(eng, kv_dtype=KV, scratch_blocks=SCRATCH,
                    sample_cap=64,
                    decode_attn="pallas" if DECODE_ATTN == "pallas"
                    else "xla")
print(f"model {VARIANT} window {WINDOW} slots {SLOTS} quant {QUANT} "
      f"kv {KV} scratch {SCRATCH}", file=sys.stderr)

rng = np.random.default_rng(0)
prompt = rng.integers(1, 32000, size=(1, PROMPT))

# ---- decode step wall (slots batch) --------------------------------------
key = jax.random.PRNGKey(0)
caches = dec.init_cache(SLOTS)
t_arr = np.zeros(SLOTS, np.float32)
k_arr = np.zeros(SLOTS, np.int32)
p_arr = np.ones(SLOTS, np.float32)
toks = np.ones((SLOTS, 1))
tok, caches = dec.step_sample(toks, np.zeros(SLOTS, np.int32), caches,
                              key, 0, t_arr, k_arr, p_arr)  # compile
np.asarray(tok)
N = 50
t0 = time.perf_counter()
for i in range(1, N + 1):
    tok, caches = dec.step_sample(toks, np.full(SLOTS, i, np.int32),
                                  caches, key, i, t_arr, k_arr, p_arr)
    np.asarray(tok)  # the service fetches the token each step
step_ms = (time.perf_counter() - t0) / N * 1e3
print(f"decode step [{SLOTS},1]: {step_ms:.1f} ms "
      f"= {SLOTS / step_ms * 1e3:.0f} tok/s at full occupancy",
      file=sys.stderr)

# ---- block decode: K tokens per dispatch ----------------------------------
BLOCK = int(os.environ.get("SI_LLM_BLOCK", "32"))
pos0 = np.full(SLOTS, PROMPT, np.int32)
toks_b, _last, caches = dec.decode_block(np.ones(SLOTS), pos0, caches,
                                         key, 1, t_arr, k_arr, p_arr,
                                         BLOCK)  # compile
np.asarray(toks_b)
NB = max(4, N // BLOCK * 2)
t0 = time.perf_counter()
for i in range(NB):
    toks_b, _last, caches = dec.decode_block(
        np.ones(SLOTS), pos0, caches, key, 1 + i * BLOCK, t_arr, k_arr,
        p_arr, BLOCK)
    np.asarray(toks_b)  # the host fetches [SLOTS, K] ints per block
blk_ms = (time.perf_counter() - t0) / NB * 1e3
blk_tps = SLOTS * BLOCK / blk_ms * 1e3
print(f"decode block [{SLOTS},{BLOCK}]: {blk_ms:.1f} ms/block = "
      f"{blk_ms / BLOCK:.2f} ms/tok-step = {blk_tps:.0f} tok/s "
      f"at full occupancy -> {step_ms / (blk_ms / BLOCK):.1f}x over "
      f"per-token", file=sys.stderr)

# ---- prefill: batched vs token-by-token -----------------------------------
window = np.zeros((1, WINDOW), np.float32)
window[0, :PROMPT] = prompt
t1 = np.ones(1, np.float32) * 0
k1 = np.zeros(1, np.int32)
p1 = np.ones(1, np.float32)
tok, rc = dec.prefill_sample(window, np.array([PROMPT]), key, 0,
                             t1, k1, p1)  # compile
np.asarray(tok)
t0 = time.perf_counter()
for _ in range(5):
    tok, rc = dec.prefill_sample(window, np.array([PROMPT]), key, 0,
                                 t1, k1, p1)
    np.asarray(tok)
pre_ms = (time.perf_counter() - t0) / 5 * 1e3
print(f"batched prefill P={PROMPT}: {pre_ms:.1f} ms (1 dispatch)",
      file=sys.stderr)

c1 = dec.init_cache(1)
_, c1 = dec.step(prompt[:, :1], np.zeros(1, np.int32), c1)  # compile
t0 = time.perf_counter()
for t in range(PROMPT):
    lg, c1 = dec.step(prompt[:, t:t + 1], np.full(1, t, np.int32), c1)
np.asarray(lg)
stepwise_ms = (time.perf_counter() - t0) * 1e3
print(f"stepwise prefill P={PROMPT}: {stepwise_ms:.1f} ms "
      f"({PROMPT} dispatches) -> batched is "
      f"{stepwise_ms / pre_ms:.1f}x", file=sys.stderr)

# ---- service end-to-end: horizon 1 vs K -----------------------------------
from simpleinfer_tpu.serving.llm import GenerationService

MAXNEW = int(os.environ.get("SI_LLM_MAXNEW", "48"))
results = {}
H = int(os.environ.get("SI_LLM_HORIZON", "16"))


def _knob(name, default="auto"):
    # "" -> the service default ("auto"); "off" -> None; "a,b" -> tuple;
    # int -> int
    v = os.environ.get(name, "")
    if not v:
        return default
    if v.lower() in ("off", "none", "0"):
        return None
    if "," in v:
        return tuple(int(x) for x in v.split(","))
    return int(v)


CAP = _knob("SI_LLM_SAMPLE_CAP")      # sampler cap; default auto
LADDER = _knob("SI_LLM_PREFIX")       # kv-prefix rungs; default auto
PREFILL = _knob("SI_LLM_PREFILL")     # admission buckets; default auto
VARIANTS = os.environ.get(
    "SI_LLM_SERVICE_VARIANTS",
    "h1,h%d,h%d-pipelined,h%d-adaptive" % (H, H, H)).split(",")
import re as _re

for label in VARIANTS:
    m = _re.match(r"h(\d+)", label)
    horizon = int(m.group(1)) if m else H
    adaptive = "adaptive" in label
    pipelined = "pipelined" in label
    # "-kernel" in a label flips that variant to the auto attention
    # policy (per-row kernel on rung-blocked pools) for in-run A/Bs
    attn = "auto" if "kernel" in label else DECODE_ATTN
    svc = GenerationService(eng, slots=SLOTS, decode_horizon=horizon,
                            adaptive_horizon=adaptive,
                            pipelined=pipelined, kv_dtype=KV,
                            scratch_blocks=SCRATCH,
                            sample_cap=CAP,
                            kv_prefix_ladder=LADDER,
                            prefill_ladder=PREFILL,
                            decode_attn=attn)
    # compile the admission executable and the full adaptive block
    # ladder OUT of the timed window (each CachedDecoder compiles its
    # own; the ladder's in-band cold compiles once cost 40 s here)
    svc.warmup().start()
    svc.submit(rng.integers(1, 32000, size=PROMPT).tolist(),
               max_new=MAXNEW, temperature=0.8,
               top_k=40).result(timeout=600)
    svc.stats = type(svc.stats)()
    t0 = time.perf_counter()
    futs = [svc.submit(rng.integers(1, 32000, size=PROMPT).tolist(),
                       max_new=MAXNEW, temperature=0.8, top_k=40)
            for _ in range(2 * SLOTS)]
    outs = [f.result(timeout=600) for f in futs]
    wall = time.perf_counter() - t0
    svc.stop()
    tokens = sum(len(o) - PROMPT for o in outs)
    results[label] = tokens / wall
    capped = (svc.stats.capped_steps / max(1, svc.stats.steps))
    print(f"service {label}: {len(futs)} reqs x {MAXNEW} new "
          f"tok in {wall:.1f} s = {tokens / wall:.0f} tok/s, occupancy "
          f"{svc.stats.mean_occupancy:.2f}, prefills "
          f"{svc.stats.prefills}, capped {capped:.0%}, mean latency "
          f"{svc.stats.mean_latency_ms:.0f} ms", file=sys.stderr,
          flush=True)
best = max(results.values())
ratio = best / blk_tps if blk_tps else float("nan")
print(f"service/substrate: best {best:.0f} vs block-decode "
      f"{blk_tps:.0f} tok/s = {ratio:.2f}", file=sys.stderr)
print(f'{{"metric": "llm_decode_toks_per_s", '
      f'"value": {best:.1f}, "unit": "tok/s", '
      f'"substrate_blk_tps": {blk_tps:.0f}, '
      f'"service_over_substrate": {ratio:.3f}}}')
