"""Speculative decoding tests.

Oracle discipline (SURVEY.md §4.1): decode_chunk_verify is checked
against the single-token step path (an independent implementation of
the same math), and SpeculativeDecoder against target-only greedy
decode — greedy speculation is LOSSLESS, so equality is exact, with
any draft.
"""
import numpy as np
import pytest

import jax

from simpleinfer_tpu import Engine
from simpleinfer_tpu.zoo import build_gpt, build_llama
from simpleinfer_tpu.zoo.generate import CachedDecoder
from simpleinfer_tpu.zoo.speculative import SpeculativeDecoder


def _llama(seq_len=32, vocab=50, depth=2, seed=0):
    graph, _, _ = build_llama("nano", batch=1, seq_len=seq_len,
                              vocab_size=vocab, depth=depth, seed=seed)
    return Engine().load_model(None, graph=graph)


def _gpt(seq_len=32, vocab=50):
    graph, _, _ = build_gpt(variant="nano", batch=1, seq_len=seq_len,
                            vocab_size=vocab, depth=2, width=32,
                            num_heads=4)
    return Engine().load_model(None, graph=graph)


@pytest.mark.parametrize("maker", [_llama, _gpt])
@pytest.mark.parametrize("kv_dtype", [None, "int8"])
def test_decode_chunk_verify_matches_stepwise(maker, kv_dtype):
    """Feeding K tokens through the cache in one dispatch must produce
    each position's greedy token AND the same cache the step-by-step
    path builds (to quantization/ulp)."""
    eng = maker()
    dec = CachedDecoder(eng, kv_dtype=kv_dtype)
    n, p = 2, 4
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, 50, size=(n, p))
    window = np.zeros((n, dec._window), np.float32)
    window[:, :p] = prompt
    key = jax.random.PRNGKey(0)
    z = np.zeros(n, np.float32)
    iz = np.zeros(n, np.int32)
    o = np.ones(n, np.float32)

    feed = rng.integers(1, 50, size=(n, 4))   # arbitrary chunk tokens

    # chunk path
    _, caches = dec.prefill_sample(window, np.full(n, p), key, 0, z,
                                   iz, o)
    g, caches = dec.decode_chunk_verify(feed, np.full(n, p, np.int32),
                                        caches)
    g = np.asarray(g)

    # stepwise oracle
    _, c2 = dec.prefill_sample(window, np.full(n, p), key, 0, z, iz, o)
    want = []
    for j in range(4):
        logits, c2 = dec.step(feed[:, j:j + 1], np.full(n, p + j,
                                                        np.int32), c2)
        want.append(np.argmax(np.asarray(logits)[:, 0, :], axis=-1))
    want = np.stack(want, axis=1)
    np.testing.assert_array_equal(g, want)

    # caches agree on the occupied prefix
    for name in caches:
        for a, b in zip(jax.tree_util.tree_leaves(caches[name]),
                        jax.tree_util.tree_leaves(c2[name])):
            np.testing.assert_allclose(
                np.asarray(a)[:, :, :p + 4].astype(np.float32),
                np.asarray(b)[:, :, :p + 4].astype(np.float32),
                rtol=2e-4, atol=2e-4)


def test_speculative_equals_target_greedy_same_draft():
    """Draft == target: proposals always match, acceptance 100%, and
    the output equals target-only greedy exactly."""
    eng = _llama()
    want = CachedDecoder(eng).generate(np.asarray([[5, 1, 8], [2, 9, 3]]),
                                       steps=10)
    spec = SpeculativeDecoder(eng, eng, k=4)
    got = spec.generate(np.asarray([[5, 1, 8], [2, 9, 3]]), steps=10)
    np.testing.assert_array_equal(got, want)
    assert spec.acceptance == 1.0
    # full acceptance: ~steps/k rounds instead of steps
    assert spec.stats["rounds"] <= int(np.ceil(10 / (spec.k - 1))) + 1


@pytest.mark.parametrize("k", [2, 3, 5])
def test_speculative_lossless_with_weak_draft(k):
    """A DIFFERENT draft (other weights): acceptance is whatever it is,
    but the emitted stream must STILL equal target-only greedy — the
    lossless guarantee."""
    target = _llama(seed=0)
    draft = _llama(depth=1, seed=7)   # smaller, different weights
    want = CachedDecoder(target).generate(
        np.asarray([[5, 1, 8], [2, 9, 3], [4, 4, 4]]), steps=12)
    spec = SpeculativeDecoder(target, draft, k=k)
    got = spec.generate(np.asarray([[5, 1, 8], [2, 9, 3], [4, 4, 4]]),
                        steps=12)
    np.testing.assert_array_equal(got, want)
    assert 0.0 <= spec.acceptance <= 1.0


def test_speculative_eos_stops_rows():
    eng = _llama()
    ref = CachedDecoder(eng).generate(np.asarray([[4, 8]]), steps=10)[0]
    eos = int(ref[5])
    first = 2 + int(np.argmax(ref[2:] == eos))
    spec = SpeculativeDecoder(eng, eng, k=3)
    out = spec.generate(np.asarray([[4, 8]]), steps=10, eos_id=eos)
    np.testing.assert_array_equal(out[0, :first + 1], ref[:first + 1])
    # frozen after eos (padding zeros allowed beyond)
    assert out.shape[1] <= len(ref)


def test_speculative_validates():
    eng = _llama()
    with pytest.raises(ValueError, match="k must be"):
        SpeculativeDecoder(eng, eng, k=1)
    small = _llama(seq_len=16)
    with pytest.raises(ValueError, match="window"):
        SpeculativeDecoder(eng, small, k=4)   # draft window too small
    with pytest.raises(ValueError, match="exceeds"):
        SpeculativeDecoder(eng, eng, k=4).generate(
            np.asarray([[1, 2]]), steps=100)
