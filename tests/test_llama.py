"""Llama-family tests: si.RotaryAttention op, build_llama, KV-cache
decode with RoPE/GQA, serving.

Oracle discipline (SURVEY.md §4.1): the composite attention op is
checked against a float64 numpy loop oracle (the reference's
naive-loop-vs-kernel pattern); the decode path is checked
token-for-token against the full-window re-forward, which is an
independent implementation of the same math.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from simpleinfer_tpu import Engine, EngineConfig
from simpleinfer_tpu.ops import lower_operator
from simpleinfer_tpu.zoo import build_llama, greedy_generate
from simpleinfer_tpu.zoo.generate import CachedDecoder

from test_ops_extra import make_op

RNG = np.random.default_rng(21)


# ------------------------------------------------------------ numpy oracle
def _rope_tables(length, dim, theta):
    half = dim // 2
    inv = 1.0 / (theta ** (np.arange(half, dtype=np.float64) / half))
    freqs = np.arange(length, dtype=np.float64)[:, None] * inv
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb), np.sin(emb)


def _rope_rotate(x, cos, sin):
    half = x.shape[-1] // 2
    rot = np.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos + rot * sin


def rotary_attention_np(x, wq, wk, wv, wo, heads, kv_heads, theta,
                        bq=None, bk=None, bv=None):
    """float64 reference: x [N,L,E], weights in llama [out,in] layout."""
    x = x.astype(np.float64)
    n, l, e = x.shape
    d = e // heads
    group = heads // kv_heads

    def proj(w, b, h):
        y = x @ w.T.astype(np.float64)
        if b is not None:
            y = y + b
        return y.reshape(n, l, h, d).transpose(0, 2, 1, 3)

    q = proj(wq, bq, heads)
    k = proj(wk, bk, kv_heads)
    v = proj(wv, bv, kv_heads)
    cos, sin = _rope_tables(l, d, theta)
    q = _rope_rotate(q, cos, sin)
    k = _rope_rotate(k, cos, sin)
    k = np.repeat(k, group, axis=1)
    v = np.repeat(v, group, axis=1)
    s = np.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(d)
    mask = np.triu(np.ones((l, l), bool), k=1)
    s = np.where(mask, -1e30, s)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ctx = np.einsum("nhqk,nhkd->nhqd", p, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(n, l, heads * d)
    return ctx @ wo.T.astype(np.float64)


def _rotary_op(e, heads, kv_heads, theta=10000.0, bias=False, seed=0):
    rng = np.random.default_rng(seed)
    d = e // heads
    scale = 1.0 / np.sqrt(e)
    attrs = {
        "q_proj.weight": rng.standard_normal((heads * d, e)).astype(
            np.float32) * scale,
        "k_proj.weight": rng.standard_normal((kv_heads * d, e)).astype(
            np.float32) * scale,
        "v_proj.weight": rng.standard_normal((kv_heads * d, e)).astype(
            np.float32) * scale,
        "o_proj.weight": rng.standard_normal((e, heads * d)).astype(
            np.float32) * scale,
    }
    if bias:
        attrs["q_proj.bias"] = rng.standard_normal(heads * d).astype(
            np.float32) * 0.05
        attrs["k_proj.bias"] = rng.standard_normal(kv_heads * d).astype(
            np.float32) * 0.05
        attrs["v_proj.bias"] = rng.standard_normal(kv_heads * d).astype(
            np.float32) * 0.05
    op = make_op("si.RotaryAttention", params=dict(
        embed_dim=e, num_heads=heads, num_kv_heads=kv_heads,
        rope_theta=theta, bias=bias), attrs=attrs)
    return op, attrs


@pytest.mark.parametrize("heads,kv_heads,bias", [
    (4, 4, False),   # MHA
    (4, 2, False),   # GQA
    (8, 1, False),   # MQA extreme
    (4, 2, True),    # qwen2-style biases
])
def test_rotary_attention_vs_numpy_oracle(heads, kv_heads, bias):
    e, l, n = 32, 9, 2
    op, attrs = _rotary_op(e, heads, kv_heads, bias=bias, seed=3)
    impl = lower_operator(op, EngineConfig())
    x = RNG.standard_normal((n, l, e)).astype(np.float32)
    weights = {k: jnp.asarray(v) for k, v in impl.weights.items()}
    got = np.asarray(impl.apply(weights, jnp.asarray(x)))
    want = rotary_attention_np(
        x, attrs["q_proj.weight"], attrs["k_proj.weight"],
        attrs["v_proj.weight"], attrs["o_proj.weight"], heads, kv_heads,
        10000.0,
        bq=attrs.get("q_proj.bias"), bk=attrs.get("k_proj.bias"),
        bv=attrs.get("v_proj.bias"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_rotary_attention_validates():
    from simpleinfer_tpu.ir.graph import Parameter

    op, _ = _rotary_op(32, 4, 4)
    op.params["num_heads"] = Parameter.from_value(3)  # 32 % 3 != 0
    with pytest.raises(ValueError):
        lower_operator(op, EngineConfig())
    op, _ = _rotary_op(32, 4, 4)
    op.params["num_kv_heads"] = Parameter.from_value(3)  # 4 % 3 != 0
    with pytest.raises(ValueError):
        lower_operator(op, EngineConfig())


def test_rope_positions_matter():
    """Positions enter ONLY through RoPE here (no learned pos emb).
    Plain causal attention is permutation-INVARIANT over earlier (k,v)
    pairs — swapping tokens 0 and 1 cannot change position-3's output
    without positional encoding. With RoPE it must."""
    e, heads = 16, 2
    op, _ = _rotary_op(e, heads, heads, seed=5)
    impl = lower_operator(op, EngineConfig())
    weights = {k: jnp.asarray(v) for k, v in impl.weights.items()}
    x = RNG.standard_normal((1, 4, e)).astype(np.float32)
    x_swapped = x[:, [1, 0, 2, 3], :]
    out = np.asarray(impl.apply(weights, jnp.asarray(x)))
    out2 = np.asarray(impl.apply(weights, jnp.asarray(x_swapped)))
    assert np.abs(out[0, 3] - out2[0, 3]).max() > 1e-5


# ------------------------------------------------------------- engine e2e
def _llama_engine(seq_len=24, vocab=40, **kw):
    graph, _, _ = build_llama("nano", batch=1, seq_len=seq_len,
                              vocab_size=vocab, **kw)
    return Engine().load_model(None, graph=graph)


def test_llama_forward_finite_and_causal():
    eng = _llama_engine()
    ids = np.zeros((1, 24), np.float32)
    ids[0, :4] = [3, 7, 11, 2]
    out = eng.run({"0": ids})
    logits = out[next(iter(out))]
    assert logits.shape == (1, 24, 40)
    assert np.isfinite(np.asarray(logits)).all()
    # causality: changing a LATER token must not change earlier logits
    ids2 = ids.copy()
    ids2[0, 10] = 17
    logits2 = eng.run({"0": ids2})[next(iter(out))]
    np.testing.assert_allclose(np.asarray(logits)[0, :10],
                               np.asarray(logits2)[0, :10],
                               rtol=1e-5, atol=1e-6)


def test_llama_decode_matches_full_forward():
    """KV-cache decode (RoPE at per-row positions, GQA cache) must
    reproduce greedy_generate token-for-token."""
    eng = _llama_engine()
    prompt = np.array([[5, 1, 8]])
    want = greedy_generate(eng, prompt, steps=8)
    dec = CachedDecoder(eng)
    got = dec.generate(prompt, steps=8)
    np.testing.assert_array_equal(got, want)


def test_llama_gqa_decode_matches_full_forward():
    graph, _, _ = build_llama("nano", batch=1, seq_len=20, vocab_size=50,
                              num_heads=4, num_kv_heads=1, seed=9)
    eng = Engine().load_model(None, graph=graph)
    prompt = np.array([[9, 2, 4, 31]])
    want = greedy_generate(eng, prompt, steps=6)
    got = CachedDecoder(eng).generate(prompt, steps=6)
    np.testing.assert_array_equal(got, want)


def test_llama_prefill_matches_stepwise():
    eng = _llama_engine()
    dec = CachedDecoder(eng)
    prompt = np.array([[3, 7, 11, 2, 9]])
    n, p = prompt.shape
    caches = dec.init_cache(n)
    logits = None
    for t in range(p):
        logits, caches = dec.step(prompt[:, t:t + 1],
                                  np.full(n, t, np.int32), caches)
    want_next = np.asarray(jnp.argmax(logits[:, 0, :], -1))
    window = np.zeros((n, dec._window), np.float32)
    window[:, :p] = prompt
    last, pre_caches = dec.prefill(window, np.full(n, p))
    np.testing.assert_array_equal(np.asarray(jnp.argmax(last, -1)),
                                  want_next)
    for name in caches:
        for j in (0, 1):
            np.testing.assert_allclose(
                np.asarray(caches[name][j])[:, :, :p, :],
                np.asarray(pre_caches[name][j])[:, :, :p, :],
                rtol=1e-5, atol=1e-5)


def test_llama_blocked_decode_matches_per_token():
    """decode_block (K steps per dispatch) must reproduce the per-token
    path token-for-token — greedy AND sampled (the PRNG fold numbering
    is block-size-invariant by construction)."""
    eng = _llama_engine()
    dec = CachedDecoder(eng)
    prompt = np.array([[5, 1, 8], [2, 9, 3]])
    want = dec.generate(prompt, steps=9, block=1)
    for blk in (3, 4, 16):  # divides / straddles / overruns steps-1=8
        got = dec.generate(prompt, steps=9, block=blk)
        np.testing.assert_array_equal(got, want)
    sampled_want = dec.generate(prompt, steps=9, block=1,
                                temperature=0.9, top_k=7, seed=3)
    sampled_got = dec.generate(prompt, steps=9, block=4,
                               temperature=0.9, top_k=7, seed=3)
    np.testing.assert_array_equal(sampled_got, sampled_want)


def test_llama_blocked_decode_eos_early_exit():
    """eos rows are frozen host-side mid-block exactly as per-token."""
    eng = _llama_engine()
    dec = CachedDecoder(eng)
    prompt = np.array([[5, 1, 8]])
    base = dec.generate(prompt, steps=10, block=1)
    # pick the 3rd generated token as a fake eos so the exit lands
    # mid-block for block=4
    eos = int(base[0, prompt.shape[1] + 2])
    want = dec.generate(prompt, steps=10, eos_id=eos, block=1)
    got = dec.generate(prompt, steps=10, eos_id=eos, block=4)
    np.testing.assert_array_equal(got, want)


def test_llama_generation_service_horizon():
    """decode_horizon > 1 (K decode steps per dispatch) returns the same
    greedy completions as the per-token tick."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _llama_engine()
    dec = CachedDecoder(eng)
    prompts = [[4, 8, 2], [7, 1]]
    want = [dec.generate(np.asarray([p]), steps=6)[0] for p in prompts]
    svc = GenerationService(eng, slots=2, decode_horizon=3).start()
    futs = [svc.submit(p, max_new=6) for p in prompts]
    got = [f.result(timeout=60) for f in futs]
    svc.stop()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_llama_generation_service():
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _llama_engine()
    dec = CachedDecoder(eng)
    prompts = [[4, 8, 2], [7, 1]]
    want = [dec.generate(np.asarray([p]), steps=5)[0] for p in prompts]
    svc = GenerationService(eng, slots=2).start()
    futs = [svc.submit(p, max_new=5) for p in prompts]
    got = [f.result(timeout=60) for f in futs]
    svc.stop()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_prefill_install_matches_two_dispatch_form():
    """The fused admission (prefill_install) must equal prefill_sample +
    install_rows exactly — same sampling, same cache rows."""
    import jax

    eng = _llama_engine()
    dec = CachedDecoder(eng)
    n = 3
    window = np.zeros((n, dec._window), np.float32)
    window[0, :3] = [4, 8, 2]
    window[1, :2] = [7, 1]
    lengths = np.array([3, 2, 1], np.int32)
    rows = np.array([2, 0, n + 7], np.int32)  # last one = padding, dropped
    t = np.zeros(n, np.float32)
    k = np.zeros(n, np.int32)
    p = np.ones(n, np.float32)
    key = jax.random.PRNGKey(0)

    tok_a, rc = dec.prefill_sample(window, lengths, key, 1, t, k, p)
    pool_a = dec.install_rows(dec.init_cache(n), rc, rows)
    tok_b, pool_b = dec.prefill_install(window, lengths, key, 1, t, k, p,
                                        dec.init_cache(n), rows)
    np.testing.assert_array_equal(np.asarray(tok_a), np.asarray(tok_b))
    fa = jax.tree_util.tree_leaves(pool_a)
    fb = jax.tree_util.tree_leaves(pool_b)
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generation_service_adaptive_horizon_caps_blocks():
    """With requests WAITING, decode blocks are capped (pow2) at the
    nearest live deadline so freed slots admit promptly; completions
    stay identical to the per-token tick."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _llama_engine()
    dec = CachedDecoder(eng)
    prompts = [[4, 8, 2], [7, 1], [3, 3], [9]]
    want = [dec.generate(np.asarray([p]), steps=4)[0] for p in prompts]

    svc = GenerationService(eng, slots=1, decode_horizon=8,
                            adaptive_horizon=True)
    seen_ks = []
    orig = svc._dec.decode_block

    def spy(tokens, pos, caches, key, step0, t, k, p, k_steps,
            kv_prefix=None, **kw):
        seen_ks.append(int(k_steps))
        return orig(tokens, pos, caches, key, step0, t, k, p, k_steps,
                    kv_prefix, **kw)

    svc._dec.decode_block = spy
    svc.start()
    # 1 slot, 4 queued requests with max_new=4: while the queue is
    # non-empty the block must be capped at the remaining deadline
    # (< horizon 8), never decoding 7 garbage tail steps per request
    futs = [svc.submit(p, max_new=4) for p in prompts]
    got = [f.result(timeout=120) for f in futs]
    svc.stop()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert seen_ks, "decode_block never called"
    # with 3 waiting requests the first blocks are capped below horizon
    assert min(seen_ks) <= 4
    assert all(v <= 8 for v in seen_ks)
    assert all(v & (v - 1) == 0 for v in seen_ks)  # pow2 ladder


def test_generation_service_warmup_precompiles_ladder():
    """warmup() must compile the fused admission + every pow2 block
    size the adaptive scheduler can pick, so no cold compile lands
    inside the serving window (measured 40 s regression without it)."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _llama_engine()
    svc = GenerationService(eng, slots=2, decode_horizon=8,
                            adaptive_horizon=True)
    svc.warmup()
    cap = GenerationService.DEFAULT_SAMPLE_CAP
    # auto-cap warmup: the capped block ladder (the expected common
    # path) plus the uncapped full-horizon fallback
    assert set(svc._dec._block_fns) == {
        (1, None, cap, False), (2, None, cap, False),
        (4, None, cap, False), (8, None, cap, False),
        (8, None, None, False)}
    # non-adaptive service: only the fixed horizon compiles (both caps)
    svc2 = GenerationService(eng, slots=2, decode_horizon=8)
    svc2.warmup()
    assert set(svc2._dec._block_fns) == {(8, None, cap, False),
                                         (8, None, None, False)}
    # prefix ladder: each rung compiles at the horizon (capped primary)
    svc3 = GenerationService(eng, slots=2, decode_horizon=8,
                             kv_prefix_ladder=(12, 16))
    svc3.warmup()
    assert set(svc3._dec._block_fns) == {
        (8, None, cap, False), (8, 12, cap, False), (8, 16, cap, False),
        (8, None, None, False)}
    # service still produces correct greedy output after warmup
    dec = CachedDecoder(eng)
    want = dec.generate(np.asarray([[4, 8, 2]]), steps=5)[0]
    svc.start()
    got = svc.submit([4, 8, 2], max_new=5).result(timeout=60)
    svc.stop()
    np.testing.assert_array_equal(got, want)


def test_llama_kv_cache_dtypes():
    """Quantized KV caches: bfloat16 halves and int8 quarters the cache
    read; decode must stay numerically close to the f32-cache path
    (per-vector int8 scales bound the k/v error at ~0.4% of each
    vector's max) and EXACT in structure (prefill produces the same
    cache pytree the decode steps consume, so prefill+decode ==
    decode-from-scratch within quantization error)."""
    import jax.numpy as jnp

    eng = _llama_engine()
    ref = CachedDecoder(eng)
    prompt = np.array([[5, 1, 8], [2, 9, 3]])
    want_logits = None
    for kv_dtype in (None, "bfloat16", "int8"):
        dec = CachedDecoder(eng, kv_dtype=kv_dtype)
        n, p = prompt.shape
        caches = dec.init_cache(n)
        if kv_dtype == "int8":
            leaves = next(iter(caches.values()))
            assert len(leaves) == 4
            assert leaves[0].dtype == jnp.int8
            assert leaves[1].shape == leaves[0].shape[:-1] + (1,)
        logits = None
        for t in range(p):
            logits, caches = dec.step(prompt[:, t:t + 1],
                                      np.full(n, t, np.int32), caches)
        got = np.asarray(logits[:, 0, :], np.float32)
        if kv_dtype is None:
            want_logits = got
        else:
            # quantization noise must stay small relative to logit scale
            denom = max(1e-6, float(np.abs(want_logits).max()))
            err = np.abs(got - want_logits).max() / denom
            assert err < (0.02 if kv_dtype == "bfloat16" else 0.05), \
                f"{kv_dtype}: rel err {err}"

        # prefill produces the same cache structure decode consumes:
        # greedy continuation via generate() must run end-to-end
        out = dec.generate(prompt, steps=5)
        assert out.shape == (2, 3 + 5)
        ref_out = ref.generate(prompt, steps=5)
        if kv_dtype == "bfloat16":
            # tiny-model logits are well-separated; bf16 cache should
            # not flip the greedy argmax here
            np.testing.assert_array_equal(out, ref_out)


def test_llama_kv_int8_service_roundtrip():
    """GenerationService(kv_dtype='int8'): admission scatter-install
    must handle the 4-leaf quantized cache pytree; completions match
    the solo int8-cache decode exactly (same cache layout end-to-end)."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _llama_engine()
    dec = CachedDecoder(eng, kv_dtype="int8")
    prompts = [[4, 8, 2], [7, 1]]
    want = [dec.generate(np.asarray([p]), steps=6)[0] for p in prompts]
    # scratch_blocks=False: the int8 per-step path quantizes WITHIN-
    # block appends before they are re-read, while scratch mode reads
    # them unquantized from the f32 scratch — genuinely different
    # logits, so the solo-oracle equality needs the bit-stable path
    svc = GenerationService(eng, slots=2, decode_horizon=4,
                            kv_dtype="int8",
                            scratch_blocks=False).warmup().start()
    futs = [svc.submit(p, max_new=6) for p in prompts]
    got = [f.result(timeout=120) for f in futs]
    svc.stop()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_llama_scratch_blocks_match_per_step():
    """scratch_blocks mode: frozen-cache + per-block scratch attention
    must (a) produce the same greedy tokens as the per-step block path
    on this model, and (b) leave near-identical cache contents — the
    merge writes the same k/v vectors the per-step path wrote, up to
    f32 ulp effects compounding through layers (a layer's k/v depends
    on earlier layers' attention outputs, whose score summation order
    differs between the two paths)."""
    import jax

    eng = _llama_engine()
    ref = CachedDecoder(eng)
    fast = CachedDecoder(eng, scratch_blocks=True)
    prompt = np.array([[5, 1, 8], [2, 9, 3]])

    want = ref.generate(prompt, steps=9, block=4)
    got = fast.generate(prompt, steps=9, block=4)
    np.testing.assert_array_equal(got, want)
    # sampled streams too (same PRNG folds; tiny-model logits are
    # well-separated so the ulp-level score reorder cannot flip draws)
    want_s = ref.generate(prompt, steps=9, block=4, temperature=0.9,
                          top_k=7, seed=3)
    got_s = fast.generate(prompt, steps=9, block=4, temperature=0.9,
                          top_k=7, seed=3)
    np.testing.assert_array_equal(got_s, want_s)

    # cache contents: run one block on identical prefilled caches
    n, p = prompt.shape
    window = np.zeros((n, ref._window), np.float32)
    window[:, :p] = prompt
    t = np.zeros(n, np.float32)
    k = np.zeros(n, np.int32)
    pp = np.ones(n, np.float32)
    key = jax.random.PRNGKey(0)
    tok_a, ca = ref.prefill_sample(window, np.full(n, p), key, 0, t, k, pp)
    tok_b, cb = fast.prefill_sample(window, np.full(n, p), key, 0, t, k,
                                    pp)
    np.testing.assert_array_equal(np.asarray(tok_a), np.asarray(tok_b))
    pos = np.full(n, p, np.int32)
    _, _, ca = ref.decode_block(tok_a, pos, ca, key, 1, t, k, pp, 4)
    _, _, cb = fast.decode_block(tok_b, pos, cb, key, 1, t, k, pp, 4)
    for name in ca:
        for a, b in zip(ca[name], cb[name]):
            a, b = np.asarray(a), np.asarray(b)
            # compare the written region (0..p+4); beyond it both are 0
            np.testing.assert_allclose(a[:, :, :p + 4, :],
                                       b[:, :, :p + 4, :], rtol=1e-4,
                                       atol=1e-5)


def test_llama_decode_block_kv_prefix_token_exact():
    """A static kv_prefix covering pos + K reproduces the full-window
    block TOKEN-FOR-TOKEN: the positions it drops were exp-underflowed
    to exact zeros under the mask, so no f32 sum changes. Checked for
    the per-step and scratch paths across KV dtypes, greedy + sampled,
    and across a chain of blocks at different rungs."""
    import jax

    eng = _llama_engine()
    prompt = np.array([[5, 1, 8], [2, 9, 3]])
    n, p = prompt.shape
    t = np.full(n, 0.9, np.float32)
    k = np.full(n, 7, np.int32)
    pp = np.ones(n, np.float32)
    key = jax.random.PRNGKey(0)
    for kv_dtype, scratch in ((None, False), ("bfloat16", False),
                              (None, True), ("int8", True)):
        ref = CachedDecoder(eng, kv_dtype=kv_dtype,
                            scratch_blocks=scratch)
        fast = CachedDecoder(eng, kv_dtype=kv_dtype,
                             scratch_blocks=scratch)
        window = np.zeros((n, ref._window), np.float32)
        window[:, :p] = prompt
        tok_a, ca = ref.prefill_sample(window, np.full(n, p), key, 0,
                                       t, k, pp)
        tok_b, cb = fast.prefill_sample(window, np.full(n, p), key, 0,
                                        t, k, pp)
        pos = np.full(n, p, np.int32)
        # rung 8 covers pos 3 + K 4; then rung 16 covers the next block
        wa, _, ca = ref.decode_block(tok_a, pos, ca, key, 1, t, k, pp, 4)
        wb, _, cb = fast.decode_block(tok_b, pos, cb, key, 1, t, k, pp,
                                      4, kv_prefix=8)
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))
        pos2 = pos + 4
        wa, _, ca = ref.decode_block(wa[:, -1], pos2, ca, key, 5, t, k,
                                     pp, 4)
        wb, _, cb = fast.decode_block(wb[:, -1], pos2, cb, key, 5, t, k,
                                      pp, 4, kv_prefix=16)
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))

    dec = CachedDecoder(eng)
    with pytest.raises(ValueError):
        dec.decode_block(np.ones(n), np.zeros(n, np.int32),
                         dec.init_cache(n), key, 1, t, k, pp, 4,
                         kv_prefix=0)
    with pytest.raises(ValueError):
        dec.decode_block(np.ones(n), np.zeros(n, np.int32),
                         dec.init_cache(n), key, 1, t, k, pp, 4,
                         kv_prefix=dec._window + 1)


def test_llama_generation_service_kv_prefix_ladder():
    """The prefix-laddered service returns the same completions as the
    plain service (greedy, deterministic), while dispatching at least
    one sub-window rung."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _llama_engine()
    dec = CachedDecoder(eng)
    prompts = [[4, 8, 2], [7, 1]]
    want = [dec.generate(np.asarray([q]), steps=6)[0] for q in prompts]
    svc = GenerationService(eng, slots=2, decode_horizon=3,
                            kv_prefix_ladder=(12, 16)).warmup().start()
    seen = []
    orig = svc._dec.decode_block
    svc._dec.decode_block = lambda *a, **kw: (
        seen.append(a[9] if len(a) > 9 else kw.get("kv_prefix")),
        orig(*a, **kw))[1]
    try:
        futs = [svc.submit(q, max_new=6) for q in prompts]
        outs = [f.result(timeout=120) for f in futs]
    finally:
        svc.stop()
    for out, w in zip(outs, want):
        np.testing.assert_array_equal(out, w)
    assert any(v in (12, 16) for v in seen), seen

    with pytest.raises(ValueError):
        GenerationService(eng, kv_prefix_ladder=(0,))


def test_llama_scratch_blocks_int8_and_service():
    """scratch_blocks composes with the int8 KV codec (quantize at
    merge) and with the pipelined service."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _llama_engine()
    ref = CachedDecoder(eng, kv_dtype="int8")
    fast = CachedDecoder(eng, kv_dtype="int8", scratch_blocks=True)
    prompt = np.array([[5, 1, 8]])
    want = ref.generate(prompt, steps=8, block=4)
    got = fast.generate(prompt, steps=8, block=4)
    np.testing.assert_array_equal(got, want)

    svc = GenerationService(eng, slots=2, decode_horizon=4,
                            scratch_blocks=True).warmup().start()
    solo = CachedDecoder(eng, scratch_blocks=True)
    w = solo.generate(np.asarray([[7, 2, 9]]), steps=5)[0]
    out = svc.submit([7, 2, 9], max_new=5).result(timeout=120)
    svc.stop()
    np.testing.assert_array_equal(out, w)


def test_llama_tp_decode_on_sim_mesh():
    """Tensor-parallel KV-cache decode on the simulated mesh: a
    model=4 engine (Megatron-sharded wq/wk/wv/wo, kv-head-sharded
    caches) must produce the single-device token stream, and the step
    executable must contain a cross-device collective (the
    row-parallel wo reduce)."""
    import jax

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.config import MeshConfig
    from simpleinfer_tpu.zoo import build_llama

    graph, _, _ = build_llama("micro", batch=1, seq_len=32,
                              vocab_size=64)
    ref_eng = Engine(EngineConfig()).load_model(None, graph=graph)
    want = CachedDecoder(ref_eng).generate(
        np.asarray([[5, 1, 8], [2, 9, 3]]), steps=8, block=4)

    tp_eng = Engine(EngineConfig(mesh=MeshConfig(model=4))).load_model(
        None, graph=graph)
    dec = CachedDecoder(tp_eng)
    got = dec.generate(np.asarray([[5, 1, 8], [2, 9, 3]]), steps=8,
                       block=4)
    np.testing.assert_array_equal(got, want)

    # caches actually shard over the model axis
    caches = dec.init_cache(2)
    leaf = next(iter(caches.values()))[0]
    spec = leaf.sharding.spec
    assert spec[1] == "model", spec

    # the compiled step contains a collective (GSPMD's wo reduce)
    toks = np.ones((2, 1))
    pos = np.zeros(2, np.int32)
    lowered = jax.jit(dec._step_fn).lower(
        dec._weights, jax.numpy.asarray(toks, jax.numpy.float32),
        jax.numpy.asarray(pos, jax.numpy.int32), caches)
    hlo = lowered.compile().as_text()
    assert ("all-reduce" in hlo or "all-gather" in hlo
            or "reduce-scatter" in hlo), "no collective in TP step"


def test_llama_tp_decode_rejects_data_axis():
    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.config import MeshConfig
    from simpleinfer_tpu.zoo import build_llama

    graph, _, _ = build_llama("nano", batch=2, seq_len=16, vocab_size=32)
    eng = Engine(EngineConfig(mesh=MeshConfig(data=2))).load_model(
        None, graph=graph)
    with pytest.raises(ValueError, match="DP engine pool"):
        CachedDecoder(eng)


def test_llama_tp_generation_service():
    """The continuous-batching service runs unchanged on a TP engine:
    admission scatter-install and decode blocks operate on kv-head-
    sharded caches (GSPMD), completions match the single-device run."""
    from simpleinfer_tpu.config import MeshConfig
    from simpleinfer_tpu.serving.llm import GenerationService

    graph, _, _ = build_llama("micro", batch=1, seq_len=32,
                              vocab_size=64)
    ref_eng = Engine(EngineConfig()).load_model(None, graph=graph)
    want = CachedDecoder(ref_eng).generate(np.asarray([[5, 1, 8]]),
                                           steps=6)[0]
    tp_eng = Engine(EngineConfig(mesh=MeshConfig(model=4))).load_model(
        None, graph=graph)
    svc = GenerationService(tp_eng, slots=2, decode_horizon=3).start()
    got = svc.submit([5, 1, 8], max_new=6).result(timeout=120)
    svc.stop()
    np.testing.assert_array_equal(got, want)


def test_llama_fuse_qkv_matches_unfused():
    """fuse_qkv (one concatenated qkv matmul per step) must reproduce
    the unfused decode exactly — bf16 and int8w engines (quantized
    fusion concats per-channel scales)."""
    for quant in (None, "int8w"):
        graph, _, _ = build_llama("nano", batch=1, seq_len=24,
                                  vocab_size=40)
        eng = Engine(EngineConfig(quant=quant)).load_model(None,
                                                           graph=graph)
        prompt = np.array([[5, 1, 8], [2, 9, 3]])
        want = CachedDecoder(eng, fuse_qkv=False).generate(
            prompt, steps=8, block=4)
        got = CachedDecoder(eng, fuse_qkv=True).generate(
            prompt, steps=8, block=4)
        np.testing.assert_array_equal(got, want)


# ---- explicit ring TP (EngineConfig.tp_mode="ring", round-3) ---------------

def test_llama_ring_tp_forward_and_decode_parity():
    """tp_mode='ring' routes the attention output projections through
    the explicit shard_map collective-matmul (parallel/tp.py): forward
    logits match the GSPMD engine to ulp, KV-cache decode tokens match
    the single-device run, and the compiled step's reduce is a
    collective-permute RING — no all-reduce."""
    import jax
    import jax.numpy as jnp

    from simpleinfer_tpu.config import MeshConfig
    from simpleinfer_tpu.zoo import build_llama

    graph, in_name, out_name = build_llama("micro", batch=1, seq_len=32,
                                           vocab_size=64)
    ref_eng = Engine(EngineConfig()).load_model(None, graph=graph)
    want_tokens = CachedDecoder(ref_eng).generate(
        np.asarray([[5, 1, 8], [2, 9, 3]]), steps=8, block=4)

    ring_eng = Engine(EngineConfig(mesh=MeshConfig(model=4),
                                   tp_mode="ring")).load_model(
        None, graph=graph)
    gspmd_eng = Engine(EngineConfig(mesh=MeshConfig(model=4))).load_model(
        None, graph=graph)

    ids = np.zeros((1, 32), np.float32)
    ids[0, :4] = [3, 7, 11, 2]
    a = ring_eng.run({in_name: ids})[out_name]
    b = gspmd_eng.run({in_name: ids})[out_name]
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    dec = CachedDecoder(ring_eng)
    got = dec.generate(np.asarray([[5, 1, 8], [2, 9, 3]]), steps=8,
                       block=4)
    np.testing.assert_array_equal(got, want_tokens)

    # the compiled decode step carries the explicit ring, not GSPMD's
    # all-reduce (the wo reduce is the only model-axis collective here)
    caches = dec.init_cache(2)
    lowered = jax.jit(dec._step_fn).lower(
        dec._weights, jnp.asarray(np.ones((2, 1)), jnp.float32),
        jnp.asarray(np.zeros(2, np.int32)), caches)
    hlo = lowered.compile().as_text()
    assert "collective-permute" in hlo, "explicit ring missing"
    # the only all-reduces left must be the RMSNorm variance scalars
    # ([N,1] per row) — the wo projection's embed-sized reduce is the
    # ring's job and must NOT appear as a GSPMD all-reduce
    import re

    for shape in re.findall(r"f32\[([\d,]+)\]\{[^}]*\} all-reduce",
                            hlo):
        dims = [int(v) for v in shape.split(",")]
        assert int(np.prod(dims)) <= 2, \
            f"embed-sized GSPMD all-reduce leaked into ring TP: {shape}"


def test_gpt_ring_tp_forward_parity():
    """The nn.MultiheadAttention lineage under ring TP: engine forward
    equals the GSPMD TP engine."""
    from simpleinfer_tpu.config import MeshConfig
    from simpleinfer_tpu.zoo import build_gpt

    graph, in_name, out_name = build_gpt(
        variant="nano", batch=1, seq_len=16, vocab_size=50, depth=2,
        width=32, num_heads=4)
    ring_eng = Engine(EngineConfig(mesh=MeshConfig(model=4),
                                   tp_mode="ring")).load_model(
        None, graph=graph)
    gspmd_eng = Engine(EngineConfig(mesh=MeshConfig(model=4))).load_model(
        None, graph=graph)
    ids = np.zeros((1, 16), np.float32)
    ids[0, :5] = [3, 7, 11, 2, 9]
    a = ring_eng.run({in_name: ids})[out_name]
    b = gspmd_eng.run({in_name: ids})[out_name]
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_ring_tp_indivisible_heads_falls_back():
    """Heads not divisible by the model axis: ring TP falls back to the
    GSPMD path per-op instead of failing (shard_map needs even shards)."""
    from simpleinfer_tpu.config import MeshConfig
    from simpleinfer_tpu.zoo import build_llama

    # nano: 4 heads; model=8 does not divide them
    graph, in_name, out_name = build_llama("nano", batch=1, seq_len=16,
                                           vocab_size=64)
    eng = Engine(EngineConfig(mesh=MeshConfig(model=8),
                              tp_mode="ring")).load_model(None,
                                                          graph=graph)
    ids = np.zeros((1, 16), np.float32)
    ids[0, :3] = [5, 1, 8]
    ref = Engine(EngineConfig()).load_model(None, graph=graph)
    a = eng.run({in_name: ids})[out_name]
    b = ref.run({in_name: ids})[out_name]
    # sharded-vs-single-device reduce orders: ulp-level agreement
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


# ---- Pallas per-row decode attention (decode_attn="pallas", round-3) -------

@pytest.mark.parametrize("kv_dtype", [None, "bfloat16", "int8"])
def test_llama_pallas_decode_attn_matches_xla(kv_dtype):
    """decode_attn='pallas' (per-row frozen-cache reads + in-register
    dequant) must produce the XLA scratch path's greedy tokens on this
    model for every cache dtype."""
    eng = _llama_engine()
    prompt = np.array([[5, 1, 8], [2, 9, 3]])
    ref = CachedDecoder(eng, kv_dtype=kv_dtype, scratch_blocks=True)
    want = ref.generate(prompt, steps=8, block=4)
    fast = CachedDecoder(eng, kv_dtype=kv_dtype, scratch_blocks=True,
                         decode_attn="pallas")
    got = fast.generate(prompt, steps=8, block=4)
    np.testing.assert_array_equal(got, want)


def test_gpt_pallas_decode_attn_matches_xla():
    """The nn.MultiheadAttention lineage through the kernel path."""
    from simpleinfer_tpu.zoo import build_gpt

    graph, _, _ = build_gpt(variant="nano", batch=1, seq_len=24,
                            vocab_size=40, depth=2, width=32,
                            num_heads=4)
    eng = Engine().load_model(None, graph=graph)
    prompt = np.array([[4, 8, 2]])
    want = CachedDecoder(eng, scratch_blocks=True).generate(
        prompt, steps=8, block=4)
    got = CachedDecoder(eng, scratch_blocks=True,
                        decode_attn="pallas").generate(
        prompt, steps=8, block=4)
    np.testing.assert_array_equal(got, want)


def test_pallas_decode_attn_validates():
    eng = _llama_engine()
    with pytest.raises(ValueError, match="scratch_blocks"):
        CachedDecoder(eng, decode_attn="pallas")
    with pytest.raises(ValueError, match="'xla' or 'pallas'"):
        CachedDecoder(eng, decode_attn="flash")
    from simpleinfer_tpu.config import MeshConfig

    graph, _, _ = build_llama("micro", batch=1, seq_len=16,
                              vocab_size=64)
    tp_eng = Engine(EngineConfig(mesh=MeshConfig(model=4))).load_model(
        None, graph=graph)
    with pytest.raises(ValueError, match="single-device"):
        CachedDecoder(tp_eng, scratch_blocks=True, decode_attn="pallas")


def test_generation_service_pallas_decode_attn():
    """Service on the kernel path: mixed-depth pool (continuous
    batching, mid-flight admissions) completes with the XLA-path
    tokens; the auto kv_prefix ladder is dropped (per-row reads
    supersede pool-global rungs)."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _llama_engine()
    prompts = [[4, 8, 2], [7, 1], [3, 3, 9], [9, 4]]

    def run(attn):
        svc = GenerationService(eng, slots=2, decode_horizon=4,
                                decode_attn=attn).start()
        outs = [svc.submit(p, max_new=6).result(timeout=120)
                for p in prompts]
        svc.stop()
        return outs, svc

    got, svc_p = run("pallas")
    want, _ = run("xla")
    assert svc_p._prefix_ladder == []
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


# ---- sliding-window attention (mistral-family, round-3) --------------------

def test_sliding_window_vs_numpy_oracle():
    """Banded causal mask: position q attends keys (q-W, q]. Checked
    against the float64 oracle with the band applied."""
    e, heads, l, n, w = 32, 4, 12, 2, 5
    op, attrs = _rotary_op(e, heads, heads, seed=11)
    from simpleinfer_tpu.ir.graph import Parameter

    op.params["sliding_window"] = Parameter.from_value(w)
    impl = lower_operator(op, EngineConfig())
    assert impl.decode_info["sliding_window"] == w
    x = RNG.standard_normal((n, l, e)).astype(np.float32)
    weights = {k: jnp.asarray(v) for k, v in impl.weights.items()}
    got = np.asarray(impl.apply(weights, jnp.asarray(x)))

    # banded float64 oracle (rotary_attention_np with extra band)
    xx = x.astype(np.float64)
    d = e // heads

    def proj(wname, h):
        y = xx @ attrs[wname].T.astype(np.float64)
        return y.reshape(n, l, h, d).transpose(0, 2, 1, 3)

    q = proj("q_proj.weight", heads)
    k = proj("k_proj.weight", heads)
    v = proj("v_proj.weight", heads)
    cos, sin = _rope_tables(l, d, 10000.0)
    q, k = _rope_rotate(q, cos, sin), _rope_rotate(k, cos, sin)
    s = np.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(d)
    qi = np.arange(l)[:, None]
    ki = np.arange(l)[None, :]
    s = np.where((ki <= qi) & (ki > qi - w), s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ctx = np.einsum("nhqk,nhkd->nhqd", p, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(n, l, e)
    want = ctx @ attrs["o_proj.weight"].T.astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("scratch", [False, True])
def test_sliding_window_decode_matches_full_forward(scratch):
    """KV-cache decode with the band (per-step and scratch paths) must
    reproduce greedy_generate on a sliding-window model — positions
    beyond the band genuinely change nothing."""
    graph, _, _ = build_llama("nano", batch=1, seq_len=24, vocab_size=50,
                              sliding_window=6, seed=4)
    eng = Engine().load_model(None, graph=graph)
    prompt = np.array([[9, 2, 4, 31]])
    want = greedy_generate(eng, prompt, steps=12)
    got = CachedDecoder(eng, scratch_blocks=scratch).generate(
        prompt, steps=12, block=4)
    np.testing.assert_array_equal(got, want)


def test_sliding_window_chunk_and_speculative():
    """decode_chunk_verify and SpeculativeDecoder respect the band."""
    from simpleinfer_tpu.zoo.speculative import SpeculativeDecoder

    graph, _, _ = build_llama("nano", batch=1, seq_len=32, vocab_size=50,
                              sliding_window=5, seed=6)
    eng = Engine().load_model(None, graph=graph)
    want = CachedDecoder(eng).generate(np.asarray([[5, 1, 8]]), steps=10)
    spec = SpeculativeDecoder(eng, eng, k=3)
    got = spec.generate(np.asarray([[5, 1, 8]]), steps=10)
    np.testing.assert_array_equal(got, want)
    assert spec.acceptance == 1.0


def test_sliding_window_rejects_pallas_decode():
    graph, _, _ = build_llama("nano", batch=1, seq_len=24, vocab_size=50,
                              sliding_window=6)
    eng = Engine().load_model(None, graph=graph)
    with pytest.raises(ValueError, match="sliding-window"):
        CachedDecoder(eng, scratch_blocks=True, decode_attn="pallas")


def test_banded_kernel_gated_off_under_mesh(monkeypatch):
    """Round-4 advisor (medium): a pallas_call inside a
    GSPMD-partitioned program cannot be partitioned, so the banded
    flash auto-dispatch must fall back to the XLA banded path whenever
    the engine has a mesh — even past the profitability crossover with
    the kernel available. Proven by making the kernel entry raise: the
    mesh config must never reach it, the mesh-free config must."""
    import simpleinfer_tpu.kernels.attention as KA
    import simpleinfer_tpu.ops.attention as A
    from simpleinfer_tpu.config import MeshConfig
    from simpleinfer_tpu.ir.graph import Parameter

    def boom(*a, **k):
        raise RuntimeError("banded kernel dispatched")

    monkeypatch.setattr(A, "_pallas_ok", lambda: True)
    monkeypatch.setattr(KA, "flash_attention", boom)
    e, heads, l, sw = 16, 2, 1536, 256   # past the L=1536 crossover
    x = RNG.standard_normal((1, l, e)).astype(np.float32)

    op, _ = _rotary_op(e, heads, heads, seed=21)
    op.params["sliding_window"] = Parameter.from_value(sw)
    impl = lower_operator(op, EngineConfig(mesh=MeshConfig(model=2)))
    weights = {k: jnp.asarray(v) for k, v in impl.weights.items()}
    out = np.asarray(impl.apply(weights, jnp.asarray(x)))  # no raise
    assert out.shape == (1, l, e)

    op, _ = _rotary_op(e, heads, heads, seed=21)
    op.params["sliding_window"] = Parameter.from_value(sw)
    impl = lower_operator(op, EngineConfig())
    weights = {k: jnp.asarray(v) for k, v in impl.weights.items()}
    with pytest.raises(RuntimeError, match="banded kernel dispatched"):
        impl.apply(weights, jnp.asarray(x))


def test_causal_ctx_banded_gated_off_under_mesh(monkeypatch):
    """Same gate at the decoder-prefill site (zoo/generate._causal_ctx,
    the other round-4 advisor dispatch): mesh -> XLA banded path."""
    import importlib

    import simpleinfer_tpu.kernels.attention as KA
    from simpleinfer_tpu.zoo.generate import _causal_ctx

    # kernels/__init__ re-exports a `matmul` FUNCTION shadowing the
    # module attribute; importlib reaches the module itself
    KM = importlib.import_module("simpleinfer_tpu.kernels.matmul")

    def boom(*a, **k):
        raise RuntimeError("banded kernel dispatched")

    monkeypatch.setattr(KM, "pallas_supported", lambda: True)
    monkeypatch.setattr(KA, "flash_attention", boom)
    n, h, l, d, sw = 1, 2, 1536, 8, 256
    qh = jnp.asarray(RNG.standard_normal((n, h, l, d)), jnp.float32)
    kh = jnp.asarray(RNG.standard_normal((n, h, l, d)), jnp.float32)
    vh = jnp.asarray(RNG.standard_normal((n, h, l, d)), jnp.float32)
    out = _causal_ctx(qh, kh, vh, d, False, sliding_window=sw,
                      mesh=object())          # any live mesh: XLA path
    assert out.shape == (n, h, l, d)
    with pytest.raises(RuntimeError, match="banded kernel dispatched"):
        _causal_ctx(qh, kh, vh, d, False, sliding_window=sw, mesh=None)


@pytest.mark.parametrize("kv_dtype", [None, "bfloat16", "int8"])
def test_cache_nbytes_matches_materialized(kv_dtype):
    """cache_nbytes (analytic accounting, round-4 advisor: counting
    bytes must not allocate a second pool) equals the materialized
    pool's bytes exactly, for every KV storage layout."""
    import jax

    graph, _, _ = build_llama("nano", batch=1, seq_len=24, vocab_size=50,
                              sliding_window=6, seed=3)
    eng = Engine().load_model(None, graph=graph)
    dec = CachedDecoder(eng, kv_dtype=kv_dtype)
    for batch in (1, 3):
        caches = dec.init_cache(batch)
        want = sum(leaf.nbytes
                   for leaf in jax.tree_util.tree_leaves(caches))
        assert dec.cache_nbytes(batch) == want


def test_generation_service_auto_attn_policy():
    """decode_attn='auto': rung blocks while a rung covers the pool,
    the per-row kernel once rows age past every rung (slots >=
    KERNEL_MIN_SLOTS threshold). Completions stay correct (kernel path is
    ulp-equal to XLA; pinned empirically)."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _llama_engine(seq_len=128)
    GenerationService.KERNEL_MIN_SLOTS  # exists
    want = CachedDecoder(eng).generate(np.asarray([[5, 1, 8]]), steps=80)

    svc = GenerationService.__new__(GenerationService)  # bypass slots gate
    svc.__init__(eng, slots=2, decode_horizon=8, decode_attn="auto")
    svc._attn_auto = svc._dec.kernel_ok   # force the policy for 2 slots
    seen = []
    orig = svc._dec.decode_block

    def spy(*a, **kw):
        seen.append((kw.get("kv_prefix", a[9] if len(a) > 9 else None),
                     kw.get("attn_impl", "default")))
        return orig(*a, **kw)

    svc._dec.decode_block = spy
    svc.start()
    got = svc.submit([5, 1, 8], max_new=80).result(timeout=300)
    svc.stop()
    np.testing.assert_array_equal(got, want[0])
    # young phase dispatched rung blocks; the aged phase (pos past the
    # 64-rung) dispatched kernel blocks
    assert any(p is not None and a == "default" for p, a in seen), seen
    assert any(a == "pallas" for p, a in seen), seen


def test_generation_service_auto_attn_disabled_below_threshold():
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _llama_engine(seq_len=64)
    svc = GenerationService(eng, slots=2, decode_attn="auto")
    assert not svc._attn_auto   # 2 < KERNEL_MIN_SLOTS


# ---- ring-buffer KV storage for sliding-window ops (round-3) ---------------

import jax


def _swa_engine(seq_len=256, sw=32, vocab=60, **kw):
    graph, _, _ = build_llama("nano", batch=1, seq_len=seq_len,
                              vocab_size=vocab, sliding_window=sw,
                              seed=8, **kw)
    return Engine().load_model(None, graph=graph)


@pytest.mark.parametrize("kv_dtype,scratch", [
    # int8 + scratch is excluded from the block-size comparison: the
    # scratch path reads WITHIN-block keys unquantized (the documented
    # int8-scratch non-identity) — ring coverage for scratch comes
    # from the (None, True) dense case
    (None, False), (None, True), ("int8", False), ("bfloat16", False)])
def test_ring_cache_decode_matches_full_forward(kv_dtype, scratch):
    """Window 256 / sliding 32: the cache is a 96-slot RING (sw +
    headroom), yet decode reproduces greedy_generate (banded full
    forward) token-for-token deep past several ring turns."""
    eng = _swa_engine()
    dec = CachedDecoder(eng, kv_dtype=kv_dtype, scratch_blocks=scratch)
    leaf = jax.tree_util.tree_leaves(dec.init_cache(1))[0]
    assert leaf.shape[2] == 96, leaf.shape   # ring, not the window
    prompt = np.array([[9, 2, 4, 31, 7]])
    steps = 200                               # > 2 ring turns
    want = greedy_generate(eng, prompt, steps=steps)
    got = dec.generate(prompt, steps=steps, block=32)
    if kv_dtype in (None,):
        np.testing.assert_array_equal(got, want)
    else:
        # quantized/bf16 caches: same storage error as non-ring mode —
        # compare the two decode paths instead of the f32 forward
        ref = CachedDecoder(eng, kv_dtype=kv_dtype,
                            scratch_blocks=scratch)
        # per-step oracle: block=1 walks the same ring per token
        want2 = ref.generate(prompt, steps=steps, block=1)
        np.testing.assert_array_equal(got, want2)


def test_ring_cache_bucketed_prefill_and_service():
    """Bucketed admission + the serving loop over a ring cache."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _swa_engine()
    dec = CachedDecoder(eng)
    want = dec.generate(np.asarray([[5, 1, 8]]), steps=100)
    svc = GenerationService(eng, slots=2, decode_horizon=8).start()
    got = svc.submit([5, 1, 8], max_new=100).result(timeout=300)
    svc.stop()
    np.testing.assert_array_equal(got, want[0])


def test_ring_cache_speculative_lossless():
    from simpleinfer_tpu.zoo.speculative import SpeculativeDecoder

    eng = _swa_engine()
    want = CachedDecoder(eng).generate(np.asarray([[5, 1, 8]]),
                                       steps=120)
    spec = SpeculativeDecoder(eng, eng, k=4)
    got = spec.generate(np.asarray([[5, 1, 8]]), steps=120)
    np.testing.assert_array_equal(got, want)


def test_ring_cache_block_width_guard():
    eng = _swa_engine()
    dec = CachedDecoder(eng)
    caches = dec.init_cache(1)
    with pytest.raises(ValueError, match="ring"):
        dec.decode_block(np.ones(1), np.zeros(1, np.int32), caches,
                         jax.random.PRNGKey(0), 0,
                         np.zeros(1, np.float32), np.zeros(1, np.int32),
                         np.ones(1, np.float32), 128)
    with pytest.raises(ValueError, match="ring"):
        dec.decode_chunk_verify(np.ones((1, 80)), np.zeros(1, np.int32),
                                caches)


def test_alternating_sliding_layers_mixed_ring_caches():
    """gemma-2-style alternation: odd layers sliding (ring caches),
    even layers global (full-window caches) in ONE model; decode
    reproduces the full forward."""
    graph, _, _ = build_llama("nano", batch=1, seq_len=256,
                              vocab_size=60, sliding_window=32,
                              sliding_pattern="alternate", seed=8)
    eng = Engine().load_model(None, graph=graph)
    dec = CachedDecoder(eng, scratch_blocks=True)
    lengths = sorted({jax.tree_util.tree_leaves(c)[0].shape[2]
                      for c in dec.init_cache(1).values()})
    assert lengths == [96, 256], lengths     # ring AND full in one model
    prompt = np.array([[9, 2, 4, 31, 7]])
    want = greedy_generate(eng, prompt, steps=150)
    got = dec.generate(prompt, steps=150, block=32)
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="sliding_pattern"):
        build_llama("nano", sliding_window=8, sliding_pattern="every3")


def test_sliding_window_banded_flash_routing(monkeypatch):
    """With the band gate open, the RotaryAttention op routes through
    the banded flash kernel (interpreted here; compiled on-chip under
    SI_TPU_TESTS in test_kernels.py) and matches the XLA banded path."""
    from jax.experimental.pallas import tpu as pltpu

    import simpleinfer_tpu.kernels.attention as KA
    import simpleinfer_tpu.ops.attention as A
    from simpleinfer_tpu.ir.graph import Parameter

    e, heads, l, n, w = 32, 4, 160, 2, 40
    op, attrs = _rotary_op(e, heads, heads, seed=13)
    op.params["sliding_window"] = Parameter.from_value(w)
    impl = lower_operator(op, EngineConfig())
    x = RNG.standard_normal((n, l, e)).astype(np.float32)
    weights = {k: jnp.asarray(v) for k, v in impl.weights.items()}
    want = np.asarray(impl.apply(weights, jnp.asarray(x)))  # XLA band

    taken = {}
    real_flash = KA.flash_attention

    def spy(q, k, v, **kw):
        taken["sliding_window"] = kw.get("sliding_window")
        return real_flash(q, k, v, **kw)

    monkeypatch.setattr(A, "_pallas_ok", lambda: True)
    monkeypatch.setattr(KA, "flash_band_profitable",
                        lambda lq, lk, sw: sw is not None)
    monkeypatch.setattr(KA, "flash_attention", spy)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(impl.apply(weights, jnp.asarray(x)))
    assert taken.get("sliding_window") == w   # kernel path WAS taken
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sliding_window_banded_flash_prefill_routing(monkeypatch):
    """CachedDecoder prefill (_causal_ctx) routes SWA models through
    the banded kernel when the gate opens, and the decoded stream is
    unchanged."""
    from jax.experimental.pallas import tpu as pltpu

    import importlib

    import simpleinfer_tpu.kernels.attention as KA

    # kernels/__init__ re-exports a `matmul` FUNCTION that shadows the
    # submodule attribute; fetch the module itself
    KM = importlib.import_module("simpleinfer_tpu.kernels.matmul")

    graph, _, _ = build_llama("nano", batch=2, seq_len=48, vocab_size=32,
                              sliding_window=8, seed=21)
    eng = Engine(EngineConfig()).load_model(None, graph=graph)
    prompt = np.asarray([[5, 1, 8, 2, 9, 3, 7, 4, 6, 2, 8, 1],
                         [3, 3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]])
    dec = CachedDecoder(eng)
    want = dec.generate(prompt, steps=10, block=5)

    calls = []
    real_flash = KA.flash_attention

    def spy(q, k, v, **kw):
        calls.append(kw.get("sliding_window"))
        return real_flash(q, k, v, **kw)

    monkeypatch.setattr(KM, "pallas_supported", lambda: True)
    monkeypatch.setattr(KA, "flash_band_profitable",
                        lambda lq, lk, sw: sw is not None)
    monkeypatch.setattr(KA, "flash_attention", spy)
    eng2 = Engine(EngineConfig()).load_model(None, graph=graph)
    dec2 = CachedDecoder(eng2)
    with pltpu.force_tpu_interpret_mode():
        got = dec2.generate(prompt, steps=10, block=5)
    assert 8 in calls                          # banded prefill WAS taken
    np.testing.assert_array_equal(got, want)   # stream unchanged


def test_rotary_attention_qk_norm_and_head_dim_oracle():
    """Qwen3 features at the op level: per-head q/k RMSNorm before RoPE
    + head_dim decoupled from embed/heads, vs a float64 numpy oracle."""
    from simpleinfer_tpu.ir.graph import Attribute, Parameter

    e, heads, kvh, d, l, n = 24, 4, 2, 16, 7, 2   # d*heads=64 != e
    rng = np.random.default_rng(33)
    op, attrs = _rotary_op(32, heads, kvh, seed=3)  # placeholder shapes
    # rebuild attrs at the decoupled geometry
    attrs = {
        "q_proj.weight": rng.standard_normal((heads * d, e)).astype(
            np.float32) * 0.1,
        "k_proj.weight": rng.standard_normal((kvh * d, e)).astype(
            np.float32) * 0.1,
        "v_proj.weight": rng.standard_normal((kvh * d, e)).astype(
            np.float32) * 0.1,
        "o_proj.weight": rng.standard_normal((e, heads * d)).astype(
            np.float32) * 0.1,
        "q_norm.weight": (1 + rng.standard_normal(d) * 0.2).astype(
            np.float32),
        "k_norm.weight": (1 + rng.standard_normal(d) * 0.2).astype(
            np.float32),
    }
    from test_ops_extra import make_op

    op = make_op("si.RotaryAttention", params=dict(
        embed_dim=e, num_heads=heads, num_kv_heads=kvh, head_dim=d,
        rope_theta=10000.0, qk_norm_eps=1e-6), attrs=attrs)
    impl = lower_operator(op, EngineConfig())
    assert impl.decode_info["head_dim"] == d
    x = rng.standard_normal((n, l, e)).astype(np.float32)
    weights = {k: jnp.asarray(v) for k, v in impl.weights.items()}
    got = np.asarray(impl.apply(weights, jnp.asarray(x)))

    # float64 oracle with qk-norm + rope + causal attention
    xx = x.astype(np.float64)

    def proj(wn, h):
        return (xx @ attrs[wn].T.astype(np.float64)).reshape(
            n, l, h, d).transpose(0, 2, 1, 3)

    def rmsn(t, wgt):
        v = np.mean(t * t, axis=-1, keepdims=True)
        return t / np.sqrt(v + 1e-6) * wgt.astype(np.float64)

    q = rmsn(proj("q_proj.weight", heads), attrs["q_norm.weight"])
    k = rmsn(proj("k_proj.weight", kvh), attrs["k_norm.weight"])
    v = proj("v_proj.weight", kvh)
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    t = np.arange(l)[:, None] * inv[None, :]
    cos = np.concatenate([np.cos(t), np.cos(t)], -1)
    sin = np.concatenate([np.sin(t), np.sin(t)], -1)

    def rope(t4):
        h = d // 2
        rot = np.concatenate([-t4[..., h:], t4[..., :h]], -1)
        return t4 * cos[None, None] + rot * sin[None, None]

    q, k = rope(q), rope(k)
    k = np.repeat(k, heads // kvh, axis=1)
    v = np.repeat(v, heads // kvh, axis=1)
    s = np.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(d)
    s = np.where(np.triu(np.ones((l, l), bool), k=1), -1e30, s)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ctx = np.einsum("nhqk,nhkd->nhqd", p, v).transpose(
        0, 2, 1, 3).reshape(n, l, heads * d)
    want = ctx @ attrs["o_proj.weight"].T.astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_build_llama_qk_norm_decode_matches_forward():
    """build_llama(qk_norm=True, head_dim=...) decodes token-equal to
    its own full forward (the qwen3-style zoo family end to end)."""
    graph, _, _ = build_llama("nano", batch=2, seq_len=32, vocab_size=40,
                              qk_norm=True, head_dim=24, seed=9)
    eng = Engine(EngineConfig(compute_dtype="float32")).load_model(
        None, graph=graph)
    prompt = np.asarray([[5, 1, 8, 2], [3, 3, 1, 4]])
    want = greedy_generate(eng, prompt, steps=10)
    got = CachedDecoder(eng).generate(prompt, steps=10, block=5)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("kw", [
    dict(qk_norm=True, head_dim=24),                       # qwen3-style
    dict(attn_scale=0.35, logit_softcap=20.0),             # gemma2-style
    dict(attn_scale=0.35, logit_softcap=20.0,
         sliding_window=6, sliding_pattern="alternate"),   # gemma2 full
])
def test_new_family_scratch_blocks_and_speculative(kw):
    """The qwen3/gemma2 attention features flow through EVERY decode
    machinery path: scratch-block decode, chunk verify (speculative
    self-draft, acceptance 1.0), token-equal to the plain forward."""
    from simpleinfer_tpu.zoo.speculative import SpeculativeDecoder

    graph, _, _ = build_llama("nano", batch=1, seq_len=32, vocab_size=50,
                              seed=12, **kw)
    eng = Engine(EngineConfig(compute_dtype="float32")).load_model(
        None, graph=graph)
    prompt = np.asarray([[5, 1, 8, 2]])
    want = greedy_generate(eng, prompt, steps=10)
    plain = CachedDecoder(eng).generate(prompt, steps=10)
    np.testing.assert_array_equal(plain, want)
    scratch = CachedDecoder(eng, scratch_blocks=True).generate(
        prompt, steps=10, block=5)
    np.testing.assert_array_equal(scratch, want)
    spec = SpeculativeDecoder(eng, eng, k=3)
    got = spec.generate(prompt, steps=10)
    np.testing.assert_array_equal(got, want)
    assert spec.acceptance == 1.0


def test_softcap_model_blocks_pallas_decode_kernel():
    """kernel_ok must exclude softcapped (gemma2) models — the per-row
    flash-decoding kernel has no tanh hook; dispatching it would
    silently change the math."""
    graph, _, _ = build_llama("nano", batch=1, seq_len=24, vocab_size=40,
                              logit_softcap=30.0, seed=3)
    eng = Engine().load_model(None, graph=graph)
    dec = CachedDecoder(eng, scratch_blocks=True)
    assert not dec.kernel_ok


def test_new_family_params_survive_pnnx_roundtrip(tmp_path):
    """The qwen3/gemma2 attention params (head_dim, qk_norm_eps,
    attn_scale, logit_softcap) and the q/k-norm weight attrs survive
    Graph.save -> Graph.load -> Engine, bit-identical logits — the
    .pnnx file surface stays complete as ops grow (ir.cpp:709-815
    grammar parity)."""
    from simpleinfer_tpu.ir.graph import Graph

    for kw in (dict(qk_norm=True, head_dim=24),
               dict(attn_scale=0.3, logit_softcap=25.0,
                    sliding_window=5)):
        graph, in_name, out_name = build_llama(
            "nano", batch=1, seq_len=12, vocab_size=32, seed=7, **kw)
        param = str(tmp_path / "m.pnnx.param")
        binp = str(tmp_path / "m.pnnx.bin")
        graph.save(param, binp)
        eng_a = Engine(EngineConfig(compute_dtype="float32")).load_model(
            None, graph=graph)
        eng_b = Engine(EngineConfig(compute_dtype="float32")).load_model(
            param, binp)
        ids = np.arange(12, dtype=np.float32)[None, :] % 31 + 1
        a = eng_a.run({in_name: ids})[out_name]
        b = eng_b.run({eng_b.input_names[0]: ids})[
            eng_b.output_names[0]]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---- int4w weight-only quantization (round-5 W4 serving dtype) -------------

def test_int4w_engine_decode_token_equal_to_forward():
    """quant='int4w': 2-D weights become group-wise nibble-packed
    Quantized4Tensor; KV-cache decode streams the same tokens as the
    whole-window forward ON THE SAME quantized engine (the internal
    consistency contract — absolute accuracy is checkpoint-dependent,
    the standard W4 tradeoff)."""
    from simpleinfer_tpu.quant.tensor import Quantized4Tensor

    graph, i, o = build_llama("nano", batch=1, seq_len=32,
                              vocab_size=64, depth=2, width=256,
                              num_heads=4, seed=0)
    eng = Engine(EngineConfig(compute_dtype="bfloat16",
                              quant="int4w")).load_model(None,
                                                         graph=graph)
    n4 = sum(isinstance(w, Quantized4Tensor)
             for d in eng._device_weights.values() for w in d.values())
    assert n4 > 0
    prompt = np.asarray([[5, 1, 8]])
    want = greedy_generate(eng, prompt, steps=10)
    for scratch in (False, True):
        got = CachedDecoder(eng, scratch_blocks=scratch).generate(
            prompt, steps=10, block=5)
        np.testing.assert_array_equal(got, want)


def test_int4w_qkv_fusion_preserves_tokens():
    """The decode-step wqkv concat has a Quantized4Tensor branch
    (out-channel concat of packed payloads + scale rows): fused and
    per-key projections must stream identical tokens."""
    graph, _, _ = build_llama("nano", batch=1, seq_len=24,
                              vocab_size=50, seed=4)
    eng = Engine(EngineConfig(compute_dtype="bfloat16",
                              quant="int4w")).load_model(None,
                                                         graph=graph)
    dec = CachedDecoder(eng, fuse_qkv=True)
    fused = any("wqkv" in d for d in dec._weights.values())
    assert fused, "int4w qkv fusion did not engage"
    prompt = np.asarray([[7, 2, 4]])
    want = greedy_generate(eng, prompt, steps=8)
    got = dec.generate(prompt, steps=8, block=4)
    np.testing.assert_array_equal(got, want)


def test_int4w_rejects_mesh():
    with pytest.raises(ValueError, match="int4w"):
        from simpleinfer_tpu import MeshConfig

        EngineConfig(quant="int4w", mesh=MeshConfig(model=2))


def test_proj_nlo_dispatches_int4_kernel(monkeypatch):
    """proj_nlo is THE int4w chokepoint: with a (mocked) TPU backend it
    must route Quantized4Tensor weights through matmul_int4w; in
    interpret mode the kernel result matches the dense-dequant einsum
    at bf16 tolerance."""
    import importlib

    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from simpleinfer_tpu.quant.tensor import (proj_nlo,
                                              quantize_int4_grouped)

    KM = importlib.import_module("simpleinfer_tpu.kernels.matmul")
    w = RNG.standard_normal((256, 192)).astype(np.float32) * 0.1
    q = quantize_int4_grouped(w, group=128)
    x = jnp.asarray(RNG.standard_normal((2, 5, 256)), jnp.float32)

    dense = np.asarray(proj_nlo(x, q, jnp.float32))  # CPU: einsum path

    monkeypatch.setattr(KM, "pallas_supported", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        kern = np.asarray(proj_nlo(x, q, jnp.float32))
    assert kern.shape == (2, 5, 192)
    np.testing.assert_allclose(kern, dense, atol=3e-2, rtol=3e-2)


def test_int4w_generation_service_smoke():
    """GenerationService over an int4w engine: full serving loop
    (admission, decode blocks, eos) streams tokens identical to the
    same engine's CachedDecoder."""
    from simpleinfer_tpu.serving.llm import GenerationService

    graph, _, _ = build_llama("nano", batch=1, seq_len=32,
                              vocab_size=64, depth=2, width=256,
                              num_heads=4, seed=0)
    eng = Engine(EngineConfig(compute_dtype="bfloat16",
                              quant="int4w")).load_model(None,
                                                         graph=graph)
    want = CachedDecoder(eng).generate(np.asarray([[5, 1, 8]]), steps=8)
    svc = GenerationService(eng, slots=2, decode_horizon=4).start()
    try:
        got = svc.submit([5, 1, 8], max_new=8).result(timeout=120)
    finally:
        svc.stop()
    np.testing.assert_array_equal(got, want[0])


# ---- neox/phi lineage (round-5: partial rotary + parallel residual) --------

def test_build_neox_decode_matches_forward():
    """build_neox (GPT-NeoX parallel-residual + partial rotary; phi-2
    form via shared_ln): KV-cache decode streams the same tokens as
    the whole-window forward — the plan-driven decode step handles the
    parallel wiring and rotary_dim flows through decode_info."""
    from simpleinfer_tpu.zoo import build_neox

    for shared, pct in ((False, 0.25), (True, 0.5)):
        graph, i, o = build_neox("nano", batch=1, seq_len=24,
                                 vocab_size=50, shared_ln=shared,
                                 head_bias=shared, rotary_pct=pct,
                                 seed=3)
        eng = Engine().load_model(None, graph=graph)
        prompt = np.asarray([[7, 2, 4]])
        want = greedy_generate(eng, prompt, steps=8)
        got = CachedDecoder(eng).generate(prompt, steps=8, block=4)
        np.testing.assert_array_equal(got, want)


def test_partial_rotary_param_roundtrip(tmp_path):
    """rotary_dim survives the .pnnx save/load surface bit-identically
    (the qwen3/gemma2 round-trip discipline) and actually changes the
    computation (partial != full rotary on the same weights)."""
    from simpleinfer_tpu.ir.graph import Graph  # noqa: F401

    graph, in_name, out_name = build_llama(
        "nano", batch=1, seq_len=12, vocab_size=32, seed=7,
        rotary_dim=8)
    param = str(tmp_path / "m.pnnx.param")
    binp = str(tmp_path / "m.pnnx.bin")
    graph.save(param, binp)
    eng_a = Engine(EngineConfig(compute_dtype="float32")).load_model(
        None, graph=graph)
    eng_b = Engine(EngineConfig(compute_dtype="float32")).load_model(
        param, binp)
    ids = np.arange(12, dtype=np.float32)[None, :] % 31 + 1
    a = eng_a.run({in_name: ids})[out_name]
    b = eng_b.run({eng_b.input_names[0]: ids})[eng_b.output_names[0]]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    full_graph, _, _ = build_llama("nano", batch=1, seq_len=12,
                                   vocab_size=32, seed=7)
    eng_f = Engine(EngineConfig(compute_dtype="float32")).load_model(
        None, graph=full_graph)
    f = eng_f.run({in_name: ids})[out_name]
    assert np.abs(np.asarray(a) - np.asarray(f)).max() > 1e-3


def test_rotary_dim_validation():
    from simpleinfer_tpu.ir.graph import Parameter

    op, _ = _rotary_op(32, 4, 4)
    op.params["rotary_dim"] = Parameter.from_value(3)   # odd
    with pytest.raises(ValueError, match="rotary_dim"):
        lower_operator(op, EngineConfig())
    op, _ = _rotary_op(32, 4, 4)
    op.params["rotary_dim"] = Parameter.from_value(10)  # > head_dim 8
    with pytest.raises(ValueError, match="rotary_dim"):
        lower_operator(op, EngineConfig())
