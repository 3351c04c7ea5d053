"""int4w serving-density receipt: aggregate decode tok/s at MATCHED HBM.

int4w is slower PER STEP than int8w (0.87x — docs/PERF.md: per-op
weights can't amortize the kernel call), but it halves weight HBM. At a
fixed weights+KV budget the freed bytes buy concurrent rows:

    budget = int8w weights (W8) + S8 x kv_bytes
    int4w slots S4 = S8 + (W8 - W4) / kv_bytes

This script measures aggregate decode tok/s of (int8w, S8) vs
(int4w, S4) on the 0.9B preset — the TieredGenerationService framing
(round-4 tiered receipt) applied to the weight side.

Usage: SI_LLM_SLOTS=8 python scripts/int4_density_receipt.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/simpleinfer_tpu/xla"))

from simpleinfer_tpu import Engine, EngineConfig  # noqa: E402
from simpleinfer_tpu.profiling import chip_speed_factor  # noqa: E402
from simpleinfer_tpu.quant.tensor import (Quantized4Tensor,  # noqa: E402
                                          QuantizedTensor)
from simpleinfer_tpu.zoo import build_llama  # noqa: E402
from simpleinfer_tpu.zoo.generate import CachedDecoder  # noqa: E402

VARIANT = os.environ.get("SI_LLM_VARIANT", "base")
WINDOW = int(os.environ.get("SI_LLM_WINDOW", "512"))
S8 = int(os.environ.get("SI_LLM_SLOTS", "8"))
BLOCK = int(os.environ.get("SI_LLM_BLOCK", "32"))
NB = int(os.environ.get("SI_LLM_NB", "6"))
ROUNDS = int(os.environ.get("SI_LLM_ROUNDS", "3"))
VOCAB = 32000


def weight_bytes(eng):
    total = 0
    for d in eng._device_weights.values():
        for w in d.values():
            if isinstance(w, QuantizedTensor):
                total += w.data.nbytes + w.scale.nbytes
            elif isinstance(w, Quantized4Tensor):
                total += w.packed.nbytes + w.scale.nbytes
            else:
                total += w.nbytes
    return total


graph, _, _ = build_llama(VARIANT, batch=1, seq_len=WINDOW,
                          vocab_size=VOCAB)
engines = {}
for label in ("int8w", "int4w"):
    t0 = time.perf_counter()
    engines[label] = Engine(EngineConfig(
        compute_dtype="bfloat16", quant=label)).load_model(
            None, graph=graph)
    print(f"{label}: loaded in {time.perf_counter() - t0:.0f} s, "
          f"weights {weight_bytes(engines[label]) / 2**30:.2f} GiB",
          file=sys.stderr, flush=True)

dec8 = CachedDecoder(engines["int8w"])
dec4 = CachedDecoder(engines["int4w"])
kv_per_slot = dec8.cache_nbytes(1)
w8, w4 = weight_bytes(engines["int8w"]), weight_bytes(engines["int4w"])
S4 = S8 + int((w8 - w4) // kv_per_slot)
print(f"kv/slot {kv_per_slot / 2**20:.1f} MiB; freed "
      f"{(w8 - w4) / 2**30:.2f} GiB -> int4w slots {S8} + "
      f"{S4 - S8} = {S4}", file=sys.stderr, flush=True)

key = jax.random.PRNGKey(0)
variants = {"int8w": (dec8, S8), "int4w": (dec4, S4)}
state = {}
for label, (dec, slots) in variants.items():
    t_arr = np.zeros(slots, np.float32)
    k_arr = np.zeros(slots, np.int32)
    p_arr = np.ones(slots, np.float32)
    cache = dec.init_cache(slots)
    t0 = time.perf_counter()
    toks, last, cache = dec.decode_block(
        np.ones(slots), np.zeros(slots, np.int32), cache, key, 1,
        t_arr, k_arr, p_arr, BLOCK)
    np.asarray(toks)
    print(f"{label} slots={slots}: block compiled+run in "
          f"{time.perf_counter() - t0:.0f} s", file=sys.stderr,
          flush=True)
    state[label] = (last, np.full(slots, 1, np.int32), cache,
                    t_arr, k_arr, p_arr, slots)

results = {k: [] for k in variants}
for rnd in range(ROUNDS):
    for label, (dec, slots) in variants.items():
        last, pos, c, t_arr, k_arr, p_arr, slots = state[label]
        t0 = time.perf_counter()
        for i in range(NB):
            toks, last, c = dec.decode_block(
                last, pos, c, key, 2 + rnd * NB * BLOCK + i * BLOCK,
                t_arr, k_arr, p_arr, BLOCK)
            pos = np.minimum(pos + BLOCK, WINDOW - 1)
        np.asarray(toks)
        wall = time.perf_counter() - t0
        state[label] = (last, pos, c, t_arr, k_arr, p_arr, slots)
        tps = slots * NB * BLOCK / wall
        results[label].append(tps)
        print(f"round {rnd} {label} slots={slots}: {wall * 1e3:.0f} ms "
              f"-> {tps:.0f} aggregate tok/s", file=sys.stderr,
              flush=True)

factor = chip_speed_factor()
med = {k: float(np.median(v)) for k, v in results.items()}
print(f"chip_speed_factor {factor:.3f}", file=sys.stderr)
print(f"medians: int8w(S{S8}) {med['int8w']:.0f} tok/s  "
      f"int4w(S{S4}) {med['int4w']:.0f} tok/s -> "
      f"{med['int4w'] / med['int8w']:.2f}x at matched HBM",
      file=sys.stderr, flush=True)
print(f'{{"metric": "int4w_density_aggregate_speedup", '
      f'"value": {med["int4w"] / med["int8w"]:.3f}, "unit": "x", '
      f'"slots": [{S8}, {S4}], '
      f'"chip_speed_factor": {factor:.3f}}}')
