"""BLOOM/ALiBi-family tests: the alibi=1 switch on si.RotaryAttention,
build_bloom, the non-rotary KV-cache decode paths, and the HF converter.

Oracle discipline (SURVEY.md §4.1): the closed-form slopes are checked
against transformers' own build_alibi_tensor (the independent oracle);
decode paths are checked token-for-token against the full-window
re-forward; the converter is checked against the transformers forward.
"""
import numpy as np
import pytest

import jax

from simpleinfer_tpu import Engine
from simpleinfer_tpu.ops.attention import alibi_slopes
from simpleinfer_tpu.zoo import build_bloom, greedy_generate
from simpleinfer_tpu.zoo.generate import CachedDecoder


@pytest.mark.parametrize("heads", [1, 2, 4, 6, 8, 12, 16])
def test_alibi_slopes_match_transformers(heads):
    """Closed-form ladder == transformers build_alibi_tensor (the HF
    implementation BLOOM checkpoints were trained with), including the
    non-power-of-two interpolated heads (6, 12)."""
    import torch
    from transformers.models.bloom.modeling_bloom import (
        build_alibi_tensor)

    mask = torch.ones(1, 5)
    # HF returns slopes * cumulative key index: [N*H, 1, L]
    hf = build_alibi_tensor(mask, heads, torch.float32)
    hf_slopes = hf[:, 0, 1].reshape(heads).numpy()   # bias at k=1
    np.testing.assert_allclose(alibi_slopes(heads), hf_slopes,
                               rtol=1e-6)


def test_alibi_bias_changes_scores():
    """alibi=1 must actually bias the logits: same weights with and
    without the flag disagree beyond noise (the bias is position-
    dependent, so later positions diverge most)."""
    g1, in_name, out1 = build_bloom("nano", seq_len=12, vocab_size=32,
                                    seed=5)
    e1 = Engine().load_model(None, graph=g1)
    # strip the alibi param from every attention op -> plain no-rope
    # attention with identical weights
    g2, _, out2 = build_bloom("nano", seq_len=12, vocab_size=32, seed=5)
    for op in g2.ops:
        if op.type == "si.RotaryAttention":
            del op.params["alibi"]
    e2 = Engine().load_model(None, graph=g2)
    ids = np.arange(12, dtype=np.float32)[None, :] % 32
    a = np.asarray(e1.run({in_name: ids})[out1])
    b = np.asarray(e2.run({in_name: ids})[out2])
    assert np.abs(a - b)[0, -1].max() > 1e-3


def test_bloom_alibi_rejects_sliding_window():
    from simpleinfer_tpu.ir.graph import Parameter

    g, in_name, _ = build_bloom("nano", seq_len=8, vocab_size=32)
    for op in g.ops:
        if op.type == "si.RotaryAttention":
            op.params["sliding_window"] = Parameter.from_value(4)
    with pytest.raises(ValueError, match="mutually exclusive"):
        Engine().load_model(None, graph=g)


def _bloom_engine(seq_len=24, vocab=48):
    graph, _, _ = build_bloom("nano", seq_len=seq_len, vocab_size=vocab,
                              seed=9)
    return Engine().load_model(None, graph=graph)


def test_bloom_decode_matches_full_forward():
    """Per-step KV-cache decode (the _mha_decode alibi path: cache
    slot index = absolute key position) streams the same greedy tokens
    as re-running the full forward each step."""
    eng = _bloom_engine()
    prompt = np.array([[5, 1, 8], [2, 9, 3]])
    want = greedy_generate(eng, prompt, steps=10)
    got = CachedDecoder(eng).generate(prompt, steps=10)
    np.testing.assert_array_equal(got, want)


def test_bloom_blocked_and_scratch_decode_match():
    """Blocked decode and scratch_blocks mode (frozen + scratch score
    pieces each biased by their own absolute key positions) both
    reproduce the per-step tokens."""
    eng = _bloom_engine()
    prompt = np.array([[5, 1, 8], [2, 9, 3]])
    ref = CachedDecoder(eng)
    want = ref.generate(prompt, steps=9, block=1)
    np.testing.assert_array_equal(
        ref.generate(prompt, steps=9, block=3), want)
    scr = CachedDecoder(eng, scratch_blocks=True)
    np.testing.assert_array_equal(
        scr.generate(prompt, steps=9, block=3), want)


def test_bloom_kernel_ok_false():
    """The flash-decoding kernel has no position-bias hook: the auto
    attention policy must never dispatch it on an ALiBi model."""
    eng = _bloom_engine()
    dec = CachedDecoder(eng, scratch_blocks=True)
    assert dec.kernel_ok is False


def test_bloom_chunk_verify_matches_stepwise():
    """decode_chunk_verify (the _attn_chunk alibi path — speculative
    verification / chunked prefill substrate) matches the stepwise
    greedy tokens."""
    eng = _bloom_engine()
    dec = CachedDecoder(eng)
    n, p = 2, 4
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, 48, size=(n, p))
    window = np.zeros((n, dec._window), np.float32)
    window[:, :p] = prompt
    key = jax.random.PRNGKey(0)
    z = np.zeros(n, np.float32)
    iz = np.zeros(n, np.int32)
    o = np.ones(n, np.float32)
    feed = rng.integers(1, 48, size=(n, 4))

    _, caches = dec.prefill_sample(window, np.full(n, p), key, 0, z,
                                   iz, o)
    g, _ = dec.decode_chunk_verify(feed, np.full(n, p, np.int32),
                                   caches)
    _, c2 = dec.prefill_sample(window, np.full(n, p), key, 0, z, iz, o)
    want = []
    for j in range(4):
        logits, c2 = dec.step(feed[:, j:j + 1],
                              np.full(n, p + j, np.int32), c2)
        want.append(np.argmax(np.asarray(logits)[:, 0, :], axis=-1))
    np.testing.assert_array_equal(np.asarray(g),
                                  np.stack(want, axis=1))


def test_bloom_pnnx_roundtrip(tmp_path):
    """alibi param + o_proj.bias attr survive .pnnx.param/.bin
    save/load; the reloaded engine's logits are bit-identical."""
    from simpleinfer_tpu.ir.graph import Graph

    graph, in_name, out_name = build_bloom("nano", seq_len=8,
                                           vocab_size=32, seed=7)
    base = str(tmp_path / "bloom")
    graph.save(base + ".pnnx.param", base + ".pnnx.bin")
    g2 = Graph.load(base + ".pnnx.param", base + ".pnnx.bin")
    ops = [op for op in g2.ops if op.type == "si.RotaryAttention"]
    assert ops and all(op.params["alibi"].i == 1 for op in ops)
    assert all(op.has_attr("o_proj.bias") for op in ops)
    ids = np.arange(8, dtype=np.float32)[None, :] % 32
    a = Engine().load_model(None, graph=graph)
    b = Engine().load_model(None, graph=g2)
    np.testing.assert_array_equal(
        np.asarray(a.run({in_name: ids})[out_name]),
        np.asarray(b.run({in_name: ids})[out_name]))


# ---- HF converter parity (transformers as the independent oracle) ------

def _hf_bloom():
    import torch
    from transformers import BloomConfig, BloomForCausalLM

    torch.manual_seed(19)
    cfg = BloomConfig(vocab_size=64, hidden_size=48, n_layer=2,
                      n_head=6, initializer_range=0.2)
    return BloomForCausalLM(cfg).eval()


def test_hf_bloom_logits_parity():
    """Converted BLOOM (fused-qkv de-interleave, embedding LayerNorm,
    tanh-GELU, 6 = non-power-of-two alibi heads) matches the
    transformers forward, fp32 both sides."""
    import torch

    model = _hf_bloom()
    from simpleinfer_tpu.frontends.hf_llama import bloom_graph_from_hf

    graph, in_name, out_name = bloom_graph_from_hf(model, seq_len=16)
    eng = Engine().load_model(None, graph=graph)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     2, 6]], np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[
        out_name])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_hf_bloom_greedy_decode_token_parity():
    """KV-cache decode on the converted model streams the same greedy
    tokens as the HF forward loop (alibi through the decode_info
    path; init range 0.2 makes the stream position-varying rather
    than a fixed point)."""
    import torch

    model = _hf_bloom()
    from simpleinfer_tpu.frontends.hf_llama import bloom_graph_from_hf

    graph, in_name, out_name = bloom_graph_from_hf(model, seq_len=16)
    eng = Engine().load_model(None, graph=graph)
    prompt = [3, 7, 11]
    ids = list(prompt)
    for _ in range(8):
        with torch.no_grad():
            logits = model(torch.tensor([ids])).logits.numpy()
        ids.append(int(logits[0, -1].argmax()))
    assert len(set(ids[3:])) > 1      # guard: stream actually varies
    got = CachedDecoder(eng).generate(np.asarray([prompt]), steps=8,
                                      block=4)
    np.testing.assert_array_equal(got[0], np.asarray(ids))


def test_hf_bloom_rejects_other_families():
    from transformers import LlamaConfig, LlamaForCausalLM

    from simpleinfer_tpu.frontends.hf_llama import bloom_graph_from_hf

    cfg = LlamaConfig(vocab_size=32, hidden_size=16,
                      intermediate_size=32, num_hidden_layers=1,
                      num_attention_heads=2, num_key_value_heads=2)
    with pytest.raises(ValueError, match="bloom"):
        bloom_graph_from_hf(LlamaForCausalLM(cfg).eval())


# ---- Falcon (all three block wirings) ----------------------------------

def _hf_falcon(**kw):
    import torch
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(31)
    cfg = FalconConfig(vocab_size=64, hidden_size=32,
                       num_hidden_layers=2, num_attention_heads=4,
                       initializer_range=0.2, **kw)
    return FalconForCausalLM(cfg).eval()


@pytest.mark.parametrize("name,kw", [
    ("7b-mqa-parallel", {}),        # multi_query + shared-ln parallel
    ("40b-gqa-newarch", dict(new_decoder_architecture=True,
                             num_kv_heads=2)),
    ("rw-alibi-sequential", dict(alibi=True, parallel_attn=False,
                                 multi_query=False, bias=True)),
])
def test_hf_falcon_logits_and_decode_parity(name, kw):
    """Falcon's three shipped wirings: MQA + single-ln parallel
    residual (7B class), GQA + two-ln parallel (40B new arch, grouped
    fused-qkv de-interleave), and the sequential ALiBi falcon-rw class
    (alibi_scale=1/sqrt(d): the bias shares the score scaling —
    transformers' sdpa/mask-integration semantics; its eager falcon
    path double-adds alibi and is deliberately not matched). Logits +
    greedy-decode parity vs the transformers forward."""
    import torch

    from simpleinfer_tpu.frontends.hf_llama import falcon_graph_from_hf

    model = _hf_falcon(**kw)
    graph, in_name, out_name = falcon_graph_from_hf(model, seq_len=16)
    eng = Engine().load_model(None, graph=graph)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     2, 6]], np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[
        out_name])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    prompt = [3, 7, 11]
    ref = list(prompt)
    for _ in range(6):
        with torch.no_grad():
            lg = model(torch.tensor([ref])).logits.numpy()
        ref.append(int(lg[0, -1].argmax()))
    dec = CachedDecoder(eng).generate(np.asarray([prompt]), steps=6,
                                      block=3)
    np.testing.assert_array_equal(dec[0], np.asarray(ref))


def test_alibi_scale_param_roundtrip_and_effect():
    """alibi_scale flows through pnnx save/load and decode_info; a
    scale != 1 changes logits (the knob is live)."""
    from simpleinfer_tpu.ir.graph import Graph, Parameter
    from simpleinfer_tpu.zoo.builders import GraphBuilder

    def make(scale):
        b = GraphBuilder(3)
        ids = b.input([1, 8], name="0")
        x = b.embedding(ids, 32, 64)
        a = b.rotary_attention(x, 4, alibi=True, alibi_scale=scale)
        b.output(a)
        return b.build()

    g = make(0.25)
    op = next(o for o in g.ops if o.type == "si.RotaryAttention")
    assert op.params["alibi_scale"].f == 0.25
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        g.save(td + "/m.pnnx.param", td + "/m.pnnx.bin")
        g2 = Graph.load(td + "/m.pnnx.param", td + "/m.pnnx.bin")
    op2 = next(o for o in g2.ops if o.type == "si.RotaryAttention")
    assert abs(op2.params["alibi_scale"].f - 0.25) < 1e-7

    e1 = Engine().load_model(None, graph=make(0.25))
    e2 = Engine().load_model(None, graph=make(1.0))
    ids = (np.arange(8, dtype=np.float32) % 32)[None, :]
    o1 = np.asarray(e1.run({"0": ids})[e1.output_names[0]])
    o2 = np.asarray(e2.run({"0": ids})[e2.output_names[0]])
    assert np.abs(o1 - o2)[0, 1:].max() > 1e-4


# ---- MPT (explicit-slopes ALiBi) ---------------------------------------

def test_mpt_slopes_match_transformers():
    """MPT's slope ladder (odd-first non-power-of-two interpolation —
    different from BLOOM's) == transformers build_mpt_alibi_tensor,
    shipped via the explicit alibi_slopes attr."""
    from transformers.models.mpt.modeling_mpt import (
        build_mpt_alibi_tensor)

    from simpleinfer_tpu.frontends.hf_llama import mpt_slopes

    for h in (1, 2, 4, 6, 8, 12):
        t = build_mpt_alibi_tensor(h, 5).numpy()     # [H, 1, L]
        hf = t[:, 0, -1] - t[:, 0, -2]               # per-key slope
        np.testing.assert_allclose(mpt_slopes(h), hf, rtol=1e-6)
    # at the default alibi_bias_max=8 the two derivations coincide;
    # a non-default bias_max is where the explicit attr matters
    np.testing.assert_allclose(mpt_slopes(6), alibi_slopes(6),
                               rtol=1e-6)
    assert np.abs(mpt_slopes(4, alibi_bias_max=4)
                  - alibi_slopes(4)).max() > 1e-2


def test_hf_mpt_logits_and_decode_parity():
    """Converted MPT (bias-free Linears, weight-only LayerNorms,
    contiguous-thirds Wqkv split, explicit slopes attr through
    decode_info) — logits + greedy-decode parity vs the transformers
    forward."""
    import torch
    from transformers import MptConfig, MptForCausalLM

    from simpleinfer_tpu.frontends.hf_llama import mpt_graph_from_hf

    torch.manual_seed(37)
    cfg = MptConfig(vocab_size=64, d_model=48, n_heads=6, n_layers=2,
                    max_seq_len=32, initializer_range=0.2)
    model = MptForCausalLM(cfg).eval()
    graph, in_name, out_name = mpt_graph_from_hf(model, seq_len=16)
    eng = Engine().load_model(None, graph=graph)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     2, 6]], np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[
        out_name])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    prompt = [3, 7, 11]
    ref = list(prompt)
    for _ in range(6):
        with torch.no_grad():
            lg = model(torch.tensor([ref])).logits.numpy()
        ref.append(int(lg[0, -1].argmax()))
    dec = CachedDecoder(eng).generate(np.asarray([prompt]), steps=6,
                                      block=3)
    np.testing.assert_array_equal(dec[0], np.asarray(ref))


def test_alibi_slopes_attr_roundtrip():
    """The explicit alibi_slopes attr survives pnnx save/load and the
    scratch/chunk decode paths consume it (token-equal streams)."""
    from simpleinfer_tpu.ir.graph import Graph
    from simpleinfer_tpu.zoo.builders import GraphBuilder

    sl = np.asarray([0.5, 0.2, 0.1, 0.05], np.float32)

    def make():
        b = GraphBuilder(7)
        ids = b.input([2, 16], name="0")
        x = b.embedding(ids, 32, 64)
        a = b.rotary_attention(x, 4, alibi=True, alibi_slopes=sl)
        h = b.linear(a, 32, bias=False)
        b.output(h)
        return b.build()

    import tempfile
    g = make()
    with tempfile.TemporaryDirectory() as td:
        g.save(td + "/m.pnnx.param", td + "/m.pnnx.bin")
        g2 = Graph.load(td + "/m.pnnx.param", td + "/m.pnnx.bin")
    op2 = next(o for o in g2.ops if o.type == "si.RotaryAttention")
    np.testing.assert_array_equal(
        op2.attrs["alibi_slopes"].array(), sl)

    eng = Engine().load_model(None, graph=g2)
    prompt = np.array([[5, 1, 8], [2, 9, 3]])
    ref = CachedDecoder(eng)
    want = ref.generate(prompt, steps=8, block=1)
    scr = CachedDecoder(eng, scratch_blocks=True)
    np.testing.assert_array_equal(
        scr.generate(prompt, steps=8, block=4), want)


def test_bloom_generation_service_token_equal():
    """The continuous-batching GenerationService (auto attention
    policy, which must avoid the kernel on ALiBi models — kernel_ok
    False) streams the same greedy completions as the solo decoder
    for the BLOOM family."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _bloom_engine()
    dec = CachedDecoder(eng)
    prompts = [[4, 8, 2], [7, 1]]
    want = [dec.generate(np.asarray([p]), steps=6)[0] for p in prompts]
    svc = GenerationService(eng, slots=2, decode_horizon=3).start()
    try:
        futs = [svc.submit(p, max_new=6) for p in prompts]
        got = [f.result(timeout=60) for f in futs]
    finally:
        svc.stop()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
