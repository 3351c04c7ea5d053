"""On-device sampler cost: full-vocab sort vs capped top-k vs argmax.

The LLM decode step fuses zoo/sampling.sample_logits, which sorts the
whole [N, V] logits row every step (argsort + gather + cumsum + gumbel
at V=32000). This probe measures that kernel in isolation on the real
chip against the statically-capped variant (lax.top_k(cap) + one exact
full-vocab logsumexp) and a pure argmax floor, at the serving batch
shapes, to decide whether sampling is a material slice of the ~4 ms
batch-scaled decode-step cost (docs/PERF.md "Remaining gap").

Interleaved rounds (variants measured seconds apart, repeated) per the
measurement discipline in docs/PERF.md.

Usage: python scripts/sampling_probe.py   (real chip, ~2 min)
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/simpleinfer_tpu/xla"))

from simpleinfer_tpu.profiling import chip_speed_factor, measure_device_time
from simpleinfer_tpu.zoo.sampling import sample_logits

V = 32000
ROUNDS = 3


def main():
    key = jax.random.PRNGKey(0)
    print(f"chip factor: {chip_speed_factor():.2f}", file=sys.stderr)
    for n in (8, 32):
        rng = np.random.default_rng(n)
        logits = jnp.asarray(
            rng.standard_normal((n, V)) * 3.0, jnp.float32)
        temp = jnp.full((n,), 0.8, jnp.float32)
        topk = jnp.full((n,), 40, jnp.int32)
        topp = jnp.full((n,), 0.95, jnp.float32)

        def full(x):
            return sample_logits(x, key, temp, topk, topp)

        def capped(x):
            return sample_logits(x, key, temp, topk, topp, cap=64)

        def greedy(x):
            return jnp.argmax(x, axis=-1).astype(jnp.int32)

        variants = [("full-sort", full), ("cap-64", capped),
                    ("argmax", greedy)]
        times = {name: [] for name, _ in variants}
        for r in range(ROUNDS):
            for name, fn in variants:
                t = measure_device_time(fn, logits, iters=100,
                                        precompile=(r == 0))
                times[name].append(t * 1e6)
                print(f"  [N={n} r{r}] {name:10s} {t * 1e6:8.1f} us",
                      file=sys.stderr, flush=True)
        for name, _ in variants:
            med = float(np.median(times[name]))
            print(f"N={n:3d} {name:10s} median {med:8.1f} us",
                  flush=True)
    print(f"chip factor after: {chip_speed_factor():.2f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
