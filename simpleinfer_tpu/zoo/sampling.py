"""On-device token sampling: temperature / top-k / top-p (nucleus).

The reference (zpye/SimpleInfer) has no generation at all — this is
superset capability backing zoo/generate.py and serving/llm.py. The
sampler is a pure jax function so it fuses into the jitted decode step
(zoo/generate.CachedDecoder): the step returns the sampled token [N]
instead of logits [N, V], cutting the per-step host fetch from V floats
to one int — which matters on a relay-attached chip where every
dispatch costs ~26 ms and bytes ride the same link (docs/PERF.md).

Semantics follow the de-facto HF convention: logits are divided by
temperature first, then top-k keeps the k highest-scoring tokens, then
top-p keeps the smallest prefix of the (sorted) distribution whose
cumulative mass reaches p (the first token always survives), and the
sample is drawn from the renormalized survivors via Gumbel-max.
`temperature <= 0` short-circuits to greedy argmax. All three knobs are
PER-ROW arrays so one step batch can mix requests with different
sampling settings (continuous batching, serving/llm.py).
"""
from __future__ import annotations

import numpy as np


def sample_logits(logits, key, temperature, top_k, top_p, cap=None):
    """Sample one token per row.

    logits: [N, V] float; key: jax PRNG key; temperature: [N] float
    (<=0 means greedy); top_k: [N] int (0 means off); top_p: [N] float
    (1.0 means off). Returns [N] int32 token ids.

    cap: optional STATIC int — restrict the candidate set to the cap
    highest-scoring tokens via `lax.top_k` instead of sorting the full
    vocabulary. The full-vocab softmax denominator is still computed
    exactly (one logsumexp reduce), so the kept probabilities are the
    true full-vocab probabilities and the result is DISTRIBUTION-EXACT
    whenever every sampled row has 0 < top_k <= cap (or is greedy);
    nucleus-only rows (top_k == 0, top_p < 1) are approximated by
    truncation to the top-cap candidates. The Gumbel draw is [N, cap]
    instead of [N, V], so capped and uncapped streams differ even in
    the exact regime — pick one per deployment (CachedDecoder's
    sample_cap) rather than switching mid-stream. Motivation: the full
    kernel's [N, V] argsort + gather + cumsum dominates the LLM decode
    step at V=32000 (docs/PERF.md).
    """
    import jax
    import jax.numpy as jnp

    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if cap is not None and cap < v:
        t = jnp.maximum(temperature.astype(jnp.float32), 1e-6)[:, None]
        lse = jax.scipy.special.logsumexp(logits / t, axis=-1)  # [N]
        vals, idx = jax.lax.top_k(logits, cap)                  # [N, cap]
        svals = vals / t
        probs = jnp.exp(svals - lse[:, None])  # exact full-vocab probs
        ranks = jnp.arange(cap, dtype=jnp.int32)[None, :]
        k_eff = jnp.where(top_k > 0, top_k, v).astype(jnp.int32)[:, None]
        keep = ranks < k_eff
        keep &= (jnp.cumsum(probs, axis=-1) - probs) \
            < top_p.astype(jnp.float32)[:, None]
        masked = jnp.where(keep, svals, -jnp.inf)
        g = jax.random.gumbel(key, masked.shape, dtype=jnp.float32)
        choice = jnp.argmax(masked + g, axis=-1)
        sampled = jnp.take_along_axis(
            idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
        return jnp.where(temperature <= 0.0, greedy, sampled)

    # sort descending once; both filters are rank predicates on it
    order = jnp.argsort(-logits, axis=-1)                    # [N, V]
    sorted_l = jnp.take_along_axis(logits, order, axis=-1)
    t = jnp.maximum(temperature.astype(jnp.float32), 1e-6)[:, None]
    scaled = sorted_l / t

    ranks = jnp.arange(v, dtype=jnp.int32)[None, :]
    k_eff = jnp.where(top_k > 0, top_k, v).astype(jnp.int32)[:, None]
    keep = ranks < k_eff
    probs = jax.nn.softmax(scaled, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose PRECEDING cumulative mass is < p: the smallest
    # prefix reaching p survives, and rank 0 always does (cum-probs=0)
    keep &= (cum - probs) < top_p.astype(jnp.float32)[:, None]

    masked = jnp.where(keep, scaled, -jnp.inf)
    g = jax.random.gumbel(key, masked.shape, dtype=jnp.float32)
    choice = jnp.argmax(masked + g, axis=-1)                 # sorted space
    sampled = jnp.take_along_axis(
        order, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


def sample_logits_np(logits, rng, temperature, top_k, top_p):
    """NumPy reference of sample_logits (per-row loop, true categorical
    draw instead of Gumbel-max — same distribution, different stream).
    The test oracle; also usable host-side."""
    logits = np.asarray(logits, np.float64)
    n, v = logits.shape
    out = np.zeros(n, np.int32)
    for i in range(n):
        if temperature[i] <= 0.0:
            out[i] = int(np.argmax(logits[i]))
            continue
        scaled = logits[i] / max(float(temperature[i]), 1e-6)
        order = np.argsort(-scaled, kind="stable")
        s = scaled[order]
        keep = np.ones(v, bool)
        if top_k[i] > 0:
            keep &= np.arange(v) < int(top_k[i])
        p = np.exp(s - s.max())
        p /= p.sum()
        keep &= (np.cumsum(p) - p) < float(top_p[i])
        p = np.where(keep, p, 0.0)
        p /= p.sum()
        out[i] = int(order[rng.choice(v, p=p)])
    return out
