"""Sampling (temperature/top-k/top-p) + batched-prefill decode tests.

Oracle discipline mirrors the reference's kernel-vs-scalar-reference
pattern (SURVEY.md §4.1): the jax sampler is checked against closed
properties (greedy limits, support sets) and against the numpy
reference's support; prefill is checked token-for-token and
cache-for-cache against step-by-step decode.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpleinfer_tpu.zoo.sampling import sample_logits, sample_logits_np


def _rand_logits(n=4, v=50, seed=0):
    return np.random.default_rng(seed).normal(size=(n, v)).astype(
        np.float32) * 3.0


def _gpt_engine(seq_len=24, vocab=40):
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_gpt

    graph, _, _ = build_gpt(variant="nano", batch=1, seq_len=seq_len,
                            vocab_size=vocab, depth=2, width=32,
                            num_heads=4)
    return Engine().load_model(None, graph=graph)


# ---- sampler properties ---------------------------------------------------

def test_sampler_greedy_at_zero_temperature():
    logits = _rand_logits()
    n = logits.shape[0]
    tok = sample_logits(jnp.asarray(logits), jax.random.PRNGKey(0),
                        jnp.zeros(n), jnp.zeros(n, jnp.int32),
                        jnp.ones(n))
    np.testing.assert_array_equal(np.asarray(tok),
                                  logits.argmax(-1))


def test_sampler_topk1_and_tiny_topp_are_greedy():
    logits = _rand_logits(seed=1)
    n = logits.shape[0]
    for key in range(5):
        tok = sample_logits(jnp.asarray(logits), jax.random.PRNGKey(key),
                            jnp.full(n, 0.9), jnp.ones(n, jnp.int32),
                            jnp.ones(n))
        np.testing.assert_array_equal(np.asarray(tok), logits.argmax(-1))
        # top_p below the max token's probability keeps only rank 0
        tok = sample_logits(jnp.asarray(logits), jax.random.PRNGKey(key),
                            jnp.full(n, 0.7), jnp.zeros(n, jnp.int32),
                            jnp.full(n, 1e-9))
        np.testing.assert_array_equal(np.asarray(tok), logits.argmax(-1))


def test_sampler_respects_topk_support():
    logits = _rand_logits(n=3, v=64, seed=2)
    n = logits.shape[0]
    k = 5
    allowed = np.argsort(-logits, axis=-1)[:, :k]
    for key in range(20):
        tok = np.asarray(sample_logits(
            jnp.asarray(logits), jax.random.PRNGKey(key),
            jnp.full(n, 1.3), jnp.full(n, k, jnp.int32), jnp.ones(n)))
        for i in range(n):
            assert tok[i] in allowed[i]


def test_sampler_respects_topp_support():
    logits = _rand_logits(n=3, v=64, seed=3)
    n = logits.shape[0]
    p = 0.6
    # allowed = smallest prefix of the sorted softmax reaching mass p
    order = np.argsort(-logits, axis=-1)
    s = np.take_along_axis(logits, order, -1).astype(np.float64)
    probs = np.exp(s - s.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    keep = (np.cumsum(probs, -1) - probs) < p
    for key in range(20):
        tok = np.asarray(sample_logits(
            jnp.asarray(logits), jax.random.PRNGKey(key),
            jnp.ones(n), jnp.zeros(n, jnp.int32), jnp.full(n, p)))
        for i in range(n):
            assert tok[i] in order[i][keep[i]]


def test_sampler_per_row_settings_mix():
    """One batch can mix greedy and sampled rows (the serving shape)."""
    logits = _rand_logits(n=4, v=32, seed=4)
    temp = jnp.asarray([0.0, 1.0, 0.0, 2.0])
    topk = jnp.asarray([0, 3, 0, 0], jnp.int32)
    topp = jnp.asarray([1.0, 1.0, 1.0, 0.5])
    allowed1 = np.argsort(-logits[1])[:3]
    for key in range(10):
        tok = np.asarray(sample_logits(jnp.asarray(logits),
                                       jax.random.PRNGKey(key),
                                       temp, topk, topp))
        assert tok[0] == logits[0].argmax()
        assert tok[2] == logits[2].argmax()
        assert tok[1] in allowed1


def test_sampler_numpy_reference_support_matches():
    """The numpy reference and the jax sampler draw from the SAME
    support (different streams): over many draws each only ever emits
    tokens the other can emit."""
    logits = _rand_logits(n=2, v=16, seed=5)
    n = logits.shape[0]
    t = np.full(n, 1.0, np.float32)
    k = np.full(n, 4, np.int32)
    p = np.full(n, 0.9, np.float32)
    rng = np.random.default_rng(0)
    np_support = [set() for _ in range(n)]
    jax_support = [set() for _ in range(n)]
    for it in range(60):
        a = sample_logits_np(logits, rng, t, k, p)
        b = np.asarray(sample_logits(jnp.asarray(logits),
                                     jax.random.PRNGKey(it),
                                     jnp.asarray(t), jnp.asarray(k),
                                     jnp.asarray(p)))
        for i in range(n):
            np_support[i].add(int(a[i]))
            jax_support[i].add(int(b[i]))
    for i in range(n):
        assert jax_support[i] <= np_support[i] or \
            np_support[i] <= jax_support[i]


def test_sampler_capped_greedy_and_topk_support():
    """cap: greedy rows equal the full kernel; sampled rows with
    top_k <= cap stay inside the top_k support (the exact regime)."""
    logits = _rand_logits(n=4, v=64, seed=7)
    n = logits.shape[0]
    temp = jnp.asarray([0.0, 1.1, 0.0, 0.9])
    topk = jnp.asarray([0, 5, 0, 3], jnp.int32)
    topp = jnp.ones(n)
    allowed = np.argsort(-logits, axis=-1)
    for key in range(15):
        tok = np.asarray(sample_logits(
            jnp.asarray(logits), jax.random.PRNGKey(key), temp, topk,
            topp, cap=8))
        assert tok[0] == logits[0].argmax()
        assert tok[2] == logits[2].argmax()
        assert tok[1] in allowed[1, :5]
        assert tok[3] in allowed[3, :3]


def test_sampler_capped_distribution_exact_in_topk_regime():
    """With 0 < top_k <= cap the capped kernel must draw from the TRUE
    full-vocab renormalized top-k distribution: empirical frequencies
    over many keys match the analytical probabilities."""
    logits = _rand_logits(n=1, v=32, seed=8)
    k, t, draws = 4, 1.0, 600
    counts = np.zeros(32)
    for key in range(draws):
        tok = int(np.asarray(sample_logits(
            jnp.asarray(logits), jax.random.PRNGKey(key),
            jnp.full(1, t), jnp.full(1, k, jnp.int32), jnp.ones(1),
            cap=8))[0])
        counts[tok] += 1
    order = np.argsort(-logits[0])
    p = np.exp(logits[0].astype(np.float64) / t)
    want = np.zeros(32)
    want[order[:k]] = p[order[:k]] / p[order[:k]].sum()
    np.testing.assert_allclose(counts / draws, want, atol=0.07)
    assert counts[order[k:]].sum() == 0


def test_sampler_capped_nucleus_truncates_to_cap():
    """top_k=0 + top_p<1 under a cap: documented approximation — the
    draw is confined to the top-cap candidates, never outside."""
    logits = _rand_logits(n=2, v=64, seed=9)
    n = logits.shape[0]
    allowed = np.argsort(-logits, axis=-1)[:, :6]
    for key in range(20):
        tok = np.asarray(sample_logits(
            jnp.asarray(logits), jax.random.PRNGKey(key),
            jnp.full(n, 2.0), jnp.zeros(n, jnp.int32),
            jnp.full(n, 0.95), cap=6))
        for i in range(n):
            assert tok[i] in allowed[i]


def test_sampler_cap_at_or_above_vocab_matches_uncapped():
    """cap >= V falls back to the full kernel bit-for-bit."""
    logits = _rand_logits(n=3, v=24, seed=10)
    n = logits.shape[0]
    t = jnp.full(n, 1.3)
    k = jnp.asarray([0, 4, 9], jnp.int32)
    p = jnp.asarray([0.9, 1.0, 0.6])
    for key in range(10):
        a = np.asarray(sample_logits(jnp.asarray(logits),
                                     jax.random.PRNGKey(key), t, k, p))
        b = np.asarray(sample_logits(jnp.asarray(logits),
                                     jax.random.PRNGKey(key), t, k, p,
                                     cap=24))
        c = np.asarray(sample_logits(jnp.asarray(logits),
                                     jax.random.PRNGKey(key), t, k, p,
                                     cap=99))
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)


def test_sampler_distribution_shifts_with_temperature():
    """Higher temperature spreads the draw: unique-token count over a
    fixed key set must not shrink when temperature rises."""
    logits = _rand_logits(n=1, v=32, seed=6)
    uniques = []
    for t in (0.2, 2.0):
        seen = {int(np.asarray(sample_logits(
            jnp.asarray(logits), jax.random.PRNGKey(key),
            jnp.full(1, t), jnp.zeros(1, jnp.int32), jnp.ones(1)))[0])
            for key in range(40)}
        uniques.append(len(seen))
    assert uniques[1] >= uniques[0]


# ---- batched prefill ------------------------------------------------------

def test_prefill_matches_stepwise_decode():
    """One-dispatch prefill must reproduce step-by-step prefill: same
    caches (where defined) and the same next token."""
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    dec = CachedDecoder(eng)
    prompt = np.array([[3, 7, 11, 2, 9]])
    n, p = prompt.shape

    # stepwise: feed prompt tokens one at a time
    caches = dec.init_cache(n)
    logits = None
    for t in range(p):
        logits, caches = dec.step(prompt[:, t:t + 1],
                                  np.full(n, t, np.int32), caches)
    want_next = np.asarray(jnp.argmax(logits[:, 0, :], -1))

    window = np.zeros((n, dec._window), np.float32)
    window[:, :p] = prompt
    last, pre_caches = dec.prefill(window, np.full(n, p))
    got_next = np.asarray(jnp.argmax(last, -1))
    np.testing.assert_array_equal(got_next, want_next)

    for name in caches:
        for j in (0, 1):  # k, v
            a = np.asarray(caches[name][j])[:, :, :p, :]
            b = np.asarray(pre_caches[name][j])[:, :, :p, :]
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_prefill_batched_rows_with_mixed_lengths():
    """Batched prefill with different per-row lengths must equal
    per-row solo prefill (padding must not leak — causality)."""
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    dec = CachedDecoder(eng)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 40, size=p) for p in (3, 7)]
    window = np.zeros((2, dec._window), np.float32)
    lengths = np.array([len(q) for q in prompts])
    for i, q in enumerate(prompts):
        window[i, :len(q)] = q
    last, _ = dec.prefill(window, lengths)

    for i, q in enumerate(prompts):
        solo = np.zeros((1, dec._window), np.float32)
        solo[0, :len(q)] = q
        want, _ = dec.prefill(solo, lengths[i:i + 1])
        np.testing.assert_allclose(np.asarray(last)[i], np.asarray(want)[0],
                                   rtol=1e-5, atol=1e-5)


def test_generate_uses_prefill_and_matches_greedy():
    from simpleinfer_tpu.zoo import greedy_generate
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    dec = CachedDecoder(eng)
    prompt = np.array([[5, 1, 8]])
    want = greedy_generate(eng, prompt, steps=8)
    got = dec.generate(prompt, steps=8)
    np.testing.assert_array_equal(got, want)


def test_generate_sampled_topk1_is_greedy_and_seed_reproducible():
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    dec = CachedDecoder(eng)
    prompt = np.array([[5, 1, 8]])
    greedy = dec.generate(prompt, steps=6)
    got = dec.generate(prompt, steps=6, temperature=0.8, top_k=1)
    np.testing.assert_array_equal(got, greedy)

    a = dec.generate(prompt, steps=6, temperature=1.2, top_k=8, seed=7)
    b = dec.generate(prompt, steps=6, temperature=1.2, top_k=8, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 3 + 6)
    assert (a[0, :3] == prompt[0]).all()


def test_generate_sample_cap_exact_regime_and_greedy():
    """sample_cap threads through prefill + the jitted decode block:
    greedy streams are unchanged vs the uncapped decoder, top_k<=cap
    sampled streams are seed-reproducible and inside the vocab."""
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    dec_full = CachedDecoder(eng)
    dec_cap = CachedDecoder(eng, sample_cap=8)
    prompt = np.array([[5, 1, 8]])
    np.testing.assert_array_equal(dec_cap.generate(prompt, steps=6),
                                  dec_full.generate(prompt, steps=6))
    got = dec_cap.generate(prompt, steps=6, temperature=0.8, top_k=1)
    np.testing.assert_array_equal(got, dec_full.generate(prompt, steps=6))
    a = dec_cap.generate(prompt, steps=6, temperature=1.2, top_k=8, seed=7)
    b = dec_cap.generate(prompt, steps=6, temperature=1.2, top_k=8, seed=7)
    np.testing.assert_array_equal(a, b)
    assert ((a >= 0) & (a < 40)).all()

    with pytest.raises(ValueError):
        CachedDecoder(eng, sample_cap=0)


# ---- service sampling -----------------------------------------------------

def test_generation_service_sampled_requests():
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    svc = GenerationService(eng, slots=2, seed=3).start()
    futs = [svc.submit([4, 8, 2], max_new=5, temperature=0.9, top_k=6)
            for _ in range(3)]
    outs = [f.result(timeout=60) for f in futs]
    svc.stop()
    for out in outs:
        assert out.shape == (3 + 5,)
        np.testing.assert_array_equal(out[:3], [4, 8, 2])
        assert ((out >= 0) & (out < 40)).all()
    assert svc.stats.prefills == 3
    assert svc.stats.completed == 3


def test_generation_service_sample_cap():
    """sample_cap service: greedy results equal the uncapped service;
    out-of-regime sampled requests still complete (truncated draw) and
    log the one-shot warning."""
    import logging

    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    svc = GenerationService(eng, slots=2, seed=3)
    ref = GenerationService(eng, slots=2, seed=3, sample_cap=8)
    svc.start()
    ref.start()
    try:
        a = svc.submit([4, 8, 2], max_new=5).result(timeout=60)
        b = ref.submit([4, 8, 2], max_new=5).result(timeout=60)
        np.testing.assert_array_equal(a, b)
        logger = logging.getLogger("simpleinfer_tpu.serving.llm")
        records = []
        handler = logging.Handler()
        handler.emit = records.append
        logger.addHandler(handler)
        try:
            out = ref.submit([4, 8], max_new=4, temperature=1.0,
                             top_p=0.9).result(timeout=60)
            assert out.shape == (2 + 4,)
            ref.submit([4, 8], max_new=2, temperature=1.0,
                       top_p=0.9).result(timeout=60)
        finally:
            logger.removeHandler(handler)
        assert len(records) == 1  # warned once, not per request
    finally:
        svc.stop()
        ref.stop()


def test_generation_service_rejects_bad_params():
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    svc = GenerationService(eng, slots=1).start()
    with pytest.raises(ValueError):
        svc.submit([1], max_new=0)
    with pytest.raises(ValueError):
        svc.submit([1], max_new=2, top_p=1.5)
    with pytest.raises(ValueError):
        svc.submit([1], max_new=2, top_k=-1)
    svc.stop()


# ---- auto fast-path selection (round-3) ------------------------------------

def test_generation_service_auto_cap_greedy_matches_off():
    """Auto cap mode with an all-greedy pool: every decode block rides
    the capped sampler (distribution-exact -> for greedy rows literally
    the same argmax) and the token streams equal the uncapped service."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine(vocab=100)   # vocab > DEFAULT_SAMPLE_CAP
    prompts = [[4, 8, 2], [7, 1], [3, 3, 9, 5]]

    def run(cap):
        svc = GenerationService(eng, slots=2, seed=3,
                                sample_cap=cap).start()
        outs = [svc.submit(p, max_new=5).result(timeout=120)
                for p in prompts]
        stats = svc.stats
        svc.stop()
        return outs, stats

    got, stats_auto = run("auto")
    want, stats_off = run(None)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert stats_auto.capped_steps == stats_auto.steps > 0
    assert stats_off.capped_steps == 0


def test_generation_service_auto_cap_nucleus_forces_exact_path():
    """A live nucleus-only row must force the exact full-vocab sampler
    (no truncation, no warning) for the blocks it is live in."""
    import logging

    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine(vocab=100)
    svc = GenerationService(eng, slots=2, seed=3)
    logger = logging.getLogger("simpleinfer_tpu.serving.llm")
    records = []
    handler = logging.Handler()
    handler.emit = records.append
    logger.addHandler(handler)
    svc.start()
    try:
        futs = [svc.submit([4, 8], max_new=6, temperature=1.0,
                           top_p=0.9),          # nucleus-only
                svc.submit([5, 1, 2], max_new=6)]  # greedy
        outs = [f.result(timeout=120) for f in futs]
    finally:
        logger.removeHandler(handler)
        svc.stop()
    for out in outs:
        assert ((out >= 0) & (out < 100)).all()
    # the nucleus row was live for at least one block -> that block was
    # dispatched uncapped; auto mode never truncates, so no warning
    assert svc.stats.capped_steps < svc.stats.steps
    assert not records


def test_generation_service_auto_cap_exact_above_vocab():
    """cap >= vocab: sampling.py ignores the cap, so the auto fast path
    is stream-identical to the bit-stable substrate even for SAMPLED
    requests (same gumbels — the [N, V] draw shape is unchanged)."""
    from simpleinfer_tpu.serving.llm import GenerationService
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()            # vocab 40 < DEFAULT_SAMPLE_CAP
    svc = GenerationService(eng, slots=2)
    assert svc._cap_mode == "auto"
    dec = CachedDecoder(eng)
    want = dec.generate(np.asarray([[4, 8, 2]]), steps=4)[0]
    svc.start()
    out = svc.submit([4, 8, 2], max_new=4).result(timeout=60)
    svc.stop()
    np.testing.assert_array_equal(out, want)
    assert svc.stats.capped_steps == svc.stats.steps


def test_generation_service_auto_prefix_ladder():
    """kv_prefix_ladder='auto' derives {window/8, /4, /2} rungs >= 64
    and still produces the bit-stable substrate's greedy tokens."""
    from simpleinfer_tpu.serving.llm import GenerationService
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine(seq_len=128)
    svc = GenerationService(eng, slots=2, decode_horizon=4)
    assert svc._prefix_ladder == [64]
    dec = CachedDecoder(eng)
    want = dec.generate(np.asarray([[4, 8, 2]]), steps=6)[0]
    svc.start()
    got = svc.submit([4, 8, 2], max_new=6).result(timeout=120)
    svc.stop()
    np.testing.assert_array_equal(got, want)


def test_decode_block_per_call_cap_override():
    """decode_block(sample_cap=...) flips the sampler per dispatch on
    one decoder: greedy rows are token-identical either way, and each
    distinct cap gets its own cached executable."""
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine(vocab=100)
    dec = CachedDecoder(eng)
    n = 2
    key = jax.random.PRNGKey(0)
    t = np.zeros(n, np.float32)
    k = np.zeros(n, np.int32)
    p = np.ones(n, np.float32)
    window = np.zeros((n, dec._window), np.float32)
    window[:, :3] = [[4, 8, 2]] * n

    def run(cap):
        caches = dec.init_cache(n)
        tok, caches = dec.prefill_install(
            window, np.full(n, 3, np.int32), key, 0, t, k, p, caches,
            np.arange(n, dtype=np.int32), sample_cap=cap)
        toks, _last, caches = dec.decode_block(
            np.asarray(tok), np.full(n, 3, np.int32), caches, key, 1,
            t, k, p, 4, sample_cap=cap)
        return np.concatenate([np.asarray(tok)[:, None],
                               np.asarray(toks)], axis=1)

    a = run(None)
    b = run(8)
    np.testing.assert_array_equal(a, b)
    assert (4, None, None, False) in dec._block_fns
    assert (4, None, 8, False) in dec._block_fns


def test_cached_decoder_generate_truncation_warns_once():
    """Direct CachedDecoder.generate callers with a fixed sample_cap and
    a nucleus-only request get the one-shot truncation warning."""
    import logging

    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine(vocab=100)
    dec = CachedDecoder(eng, sample_cap=8)
    logger = logging.getLogger("simpleinfer_tpu.zoo.generate")
    records = []
    handler = logging.Handler()
    handler.emit = records.append
    logger.addHandler(handler)
    try:
        dec.generate(np.asarray([[4, 8, 2]]), steps=3, temperature=1.0,
                     top_p=0.9)
        dec.generate(np.asarray([[4, 8, 2]]), steps=3, temperature=1.0,
                     top_p=0.9)
    finally:
        logger.removeHandler(handler)
    assert len(records) == 1


# ---- prefill bucket ladder (round-3) ---------------------------------------

def test_prefill_install_bucketed_matches_full_window():
    """prefill_install at a bucket width < window: the sampled token,
    the decode continuation, and the written cache prefix must equal
    the full-window admission (causality makes the result independent
    of padding width). Both attention lineages."""
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    for builder in ("gpt", "llama"):
        if builder == "gpt":
            eng = _gpt_engine(seq_len=128, vocab=100)
        else:
            from simpleinfer_tpu import Engine
            from simpleinfer_tpu.zoo import build_llama

            graph, _, _ = build_llama("nano", batch=1, seq_len=128,
                                      vocab_size=100)
            eng = Engine().load_model(None, graph=graph)
        dec = CachedDecoder(eng)
        n = 2
        key = jax.random.PRNGKey(0)
        t = np.zeros(n, np.float32)
        k = np.zeros(n, np.int32)
        p = np.ones(n, np.float32)
        prompt = [4, 8, 2, 9, 1]

        def admit(width):
            caches = dec.init_cache(n)
            window = np.zeros((n, width), np.float32)
            window[:, :len(prompt)] = prompt
            tok, caches = dec.prefill_install(
                window, np.full(n, len(prompt), np.int32), key, 0,
                t, k, p, caches, np.arange(n, dtype=np.int32))
            toks, _last, caches = dec.decode_block(
                np.asarray(tok), np.full(n, len(prompt), np.int32),
                caches, key, 1, t, k, p, 4)
            return np.asarray(tok), np.asarray(toks), caches

        tok_b, toks_b, caches_b = admit(16)
        tok_f, toks_f, caches_f = admit(128)
        np.testing.assert_array_equal(tok_b, tok_f)
        np.testing.assert_array_equal(toks_b, toks_f)
        # the occupied cache prefix matches to f32 ulp compounding
        # (the narrower reduce retiles attention partial sums feeding
        # later layers' k/v — the scratch-mode 1e-4 discipline); the
        # tail may hold stale data in the bucketed pool, never read
        # before overwritten
        import jax as _jax
        for name in caches_b:
            for a, b in zip(_jax.tree_util.tree_leaves(caches_b[name]),
                            _jax.tree_util.tree_leaves(caches_f[name])):
                np.testing.assert_allclose(
                    np.asarray(a)[:, :, :len(prompt) + 5],
                    np.asarray(b)[:, :, :len(prompt) + 5],
                    rtol=1e-4, atol=1e-5)


def test_prefill_install_rejects_overlong_rows():
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine(seq_len=64)
    dec = CachedDecoder(eng)
    caches = dec.init_cache(1)
    window = np.zeros((1, 8), np.float32)
    with pytest.raises(ValueError):
        dec.prefill_install(window, np.array([12], np.int32),
                            jax.random.PRNGKey(0), 0,
                            np.zeros(1, np.float32),
                            np.zeros(1, np.int32),
                            np.ones(1, np.float32), caches,
                            np.zeros(1, np.int32))
    with pytest.raises(ValueError):
        dec.prefill_install(np.zeros((1, 128), np.float32),
                            np.array([2], np.int32),
                            jax.random.PRNGKey(0), 0,
                            np.zeros(1, np.float32),
                            np.zeros(1, np.int32),
                            np.ones(1, np.float32), caches,
                            np.zeros(1, np.int32))


def test_generation_service_prefill_ladder_buckets_admissions():
    """Default auto prefill ladder: short-prompt waves admit at the
    64-wide bucket, not the full window, and completions equal the
    ladder-off service."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine(seq_len=128, vocab=100)
    prompts = [[4, 8, 2], [7, 1, 3, 3, 9], [5] * 70]  # one LONG prompt

    def run(ladder):
        svc = GenerationService(eng, slots=2, decode_horizon=2,
                                prefill_ladder=ladder)
        widths = []
        orig = svc._dec.prefill_install

        def spy(tokens, *a, **kw):
            widths.append(int(np.asarray(tokens).shape[1]))
            return orig(tokens, *a, **kw)

        svc._dec.prefill_install = spy
        svc.start()
        outs = [svc.submit(p, max_new=4).result(timeout=120)
                for p in prompts]     # sequential: one wave each
        svc.stop()
        return outs, widths

    got, widths = run("auto")
    assert svc_ladder_expect(widths), widths
    want, widths_off = run(None)
    assert all(w == 128 for w in widths_off), widths_off
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def svc_ladder_expect(widths):
    # short prompts (3, 5 tokens) -> 64-bucket; the 70-token prompt
    # exceeds every sub-window bucket -> full window 128
    return sorted(widths) == [64, 64, 128]
