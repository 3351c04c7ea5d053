"""Real-model parity: HF transformers llama-family -> engine.

The strongest oracle available in-container for the LLM path: an
actual `transformers` implementation (the de-facto RoPE/GQA reference)
run side by side with the converted engine, fp32 both sides.
"""
import os

import numpy as np
import pytest

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from simpleinfer_tpu import Engine
from simpleinfer_tpu.frontends.hf_llama import llama_graph_from_hf
from simpleinfer_tpu.zoo.generate import CachedDecoder


def _llama(tie=False, kv_heads=2):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(7)
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=kv_heads, max_position_embeddings=16,
        rope_theta=10000.0, tie_word_embeddings=tie)
    return LlamaForCausalLM(cfg).eval()


def _engine_for(model, seq_len=16):
    graph, in_name, out_name = llama_graph_from_hf(model,
                                                   seq_len=seq_len)
    return Engine().load_model(None, graph=graph), in_name, out_name


def _hf_logits(model, ids):
    with torch.no_grad():
        return model(torch.from_numpy(ids)).logits.numpy()


@pytest.mark.parametrize("kv_heads", [4, 2, 1])
def test_hf_llama_logits_parity(kv_heads):
    model = _llama(kv_heads=kv_heads)
    eng, in_name, out_name = _engine_for(model)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     2, 6]], np.int64)
    want = _hf_logits(model, ids)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_hf_llama_tied_embeddings():
    model = _llama(tie=True)
    eng, in_name, out_name = _engine_for(model)
    ids = np.array([[5, 1, 8, 44, 2, 9, 0, 7, 3, 11, 6, 2, 4, 1, 0, 9]],
                   np.int64)
    want = _hf_logits(model, ids)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_hf_qwen2_with_attention_bias():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(9)
    cfg = Qwen2Config(
        vocab_size=48, hidden_size=32, intermediate_size=40,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=16,
        rope_theta=1e6)
    model = Qwen2ForCausalLM(cfg).eval()
    assert "model.layers.0.self_attn.q_proj.bias" in model.state_dict()
    eng, in_name, out_name = _engine_for(model)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 43, 30, 12, 8, 4,
                     2, 6]], np.int64)
    want = _hf_logits(model, ids)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_hf_llama_greedy_decode_matches_hf():
    """Engine KV-cache decode reproduces HF's own greedy continuation
    token-for-token."""
    model = _llama()
    eng, in_name, _ = _engine_for(model)
    prompt = np.array([[3, 7, 11]], np.int64)
    # HF manual greedy loop (fp32, no cache tricks)
    ids = torch.from_numpy(prompt)
    for _ in range(8):
        with torch.no_grad():
            logits = model(ids).logits
        nxt = logits[:, -1, :].argmax(-1, keepdim=True)
        ids = torch.cat([ids, nxt], dim=1)
    want = ids.numpy()[0]
    got = CachedDecoder(eng).generate(prompt, steps=8)[0]
    np.testing.assert_array_equal(got, want)


def test_hf_rejects_unsupported():
    model = _llama()
    model.config.model_type = "gpt2"
    with pytest.raises(ValueError):
        llama_graph_from_hf(model)


def test_hf_gemma_logits_parity():
    """gemma lineage: (1+w) RMSNorm convention, sqrt(hidden) embedding
    scaling (folded into imported weights), tanh-gelu gated MLP, tied
    embeddings with the UNSCALED matrix as the head."""
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(11)
    cfg = GemmaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=16,
        rope_theta=10000.0, hidden_act="gelu_pytorch_tanh",
        hidden_activation="gelu_pytorch_tanh")
    model = GemmaForCausalLM(cfg).eval()
    eng, in_name, out_name = _engine_for(model)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     22, 17]], np.int64)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    want = _hf_logits(model, ids)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_hf_phi3_logits_parity():
    """phi3 lineage: fused qkv_proj / gate_up_proj weights split at
    import; silu gated MLP; untied head."""
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(13)
    cfg = Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=16,
        rope_theta=10000.0, tie_word_embeddings=False,
        pad_token_id=0)  # default 32000 exceeds the tiny vocab
    model = Phi3ForCausalLM(cfg).eval()
    eng, in_name, out_name = _engine_for(model)
    ids = np.array([[5, 1, 9, 30, 2, 60, 11, 0, 7, 3, 44, 21, 6, 18,
                     2, 33]], np.int64)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    want = _hf_logits(model, ids)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_hf_gemma_greedy_decode_matches_hf():
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(15)
    cfg = GemmaConfig(
        vocab_size=48, hidden_size=32, intermediate_size=40,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=1, head_dim=8, max_position_embeddings=24,
        hidden_act="gelu_pytorch_tanh",
        hidden_activation="gelu_pytorch_tanh")
    model = GemmaForCausalLM(cfg).eval()
    graph, in_name, out_name = llama_graph_from_hf(model, seq_len=24)
    eng = Engine().load_model(None, graph=graph)
    dec = CachedDecoder(eng)
    prompt = np.array([[4, 8, 2, 7]])
    ours = dec.generate(prompt, steps=8)
    with torch.no_grad():
        hf = model.generate(torch.from_numpy(prompt), max_new_tokens=8,
                            do_sample=False).numpy()
    np.testing.assert_array_equal(ours, hf)


def test_hf_gpt2_logits_parity():
    """GPT-2 lineage (non-RoPE): learned positions, packed-qkv MHA with
    additive causal mask, Conv1D [in,out] weights transposed at import,
    tanh-gelu MLP, tied head."""
    from transformers import GPT2Config, GPT2LMHeadModel

    from simpleinfer_tpu.frontends.hf_gpt2 import gpt2_graph_from_hf

    torch.manual_seed(17)
    cfg = GPT2Config(vocab_size=64, n_positions=16, n_embd=32,
                     n_layer=2, n_head=4,
                     attn_implementation="eager")
    model = GPT2LMHeadModel(cfg).eval()
    graph, in_name, out_name = gpt2_graph_from_hf(model, seq_len=16)
    eng = Engine().load_model(None, graph=graph)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     22, 17]], np.int64)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    want = _hf_logits(model, ids)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=2e-3)


def test_hf_gpt2_greedy_generate_matches_hf():
    from transformers import GPT2Config, GPT2LMHeadModel

    from simpleinfer_tpu.frontends.hf_gpt2 import gpt2_graph_from_hf
    from simpleinfer_tpu.zoo.generate import greedy_generate

    torch.manual_seed(19)
    cfg = GPT2Config(vocab_size=48, n_positions=24, n_embd=32,
                     n_layer=2, n_head=4, attn_implementation="eager")
    model = GPT2LMHeadModel(cfg).eval()
    graph, in_name, out_name = gpt2_graph_from_hf(model, seq_len=24)
    eng = Engine().load_model(None, graph=graph)
    prompt = np.array([[4, 8, 2, 7]])
    ours = greedy_generate(eng, prompt, steps=8)
    with torch.no_grad():
        hf = model.generate(torch.from_numpy(prompt), max_new_tokens=8,
                            do_sample=False,
                            pad_token_id=0).numpy()
    np.testing.assert_array_equal(ours, hf)


def test_hf_gpt2_kv_cache_decode_matches_hf():
    """The converted GPT-2 runs the KV-cache block-decode path (MHA +
    learned positions + mask lineage) token-for-token vs HF generate."""
    from transformers import GPT2Config, GPT2LMHeadModel

    from simpleinfer_tpu.frontends.hf_gpt2 import gpt2_graph_from_hf

    torch.manual_seed(19)
    cfg = GPT2Config(vocab_size=48, n_positions=24, n_embd=32,
                     n_layer=2, n_head=4, attn_implementation="eager")
    model = GPT2LMHeadModel(cfg).eval()
    graph, in_name, out_name = gpt2_graph_from_hf(model, seq_len=24)
    eng = Engine().load_model(None, graph=graph)
    dec = CachedDecoder(eng)
    prompt = np.array([[4, 8, 2, 7]])
    ours = dec.generate(prompt, steps=8, block=4)
    with torch.no_grad():
        hf = model.generate(torch.from_numpy(prompt), max_new_tokens=8,
                            do_sample=False, pad_token_id=0).numpy()
    np.testing.assert_array_equal(ours, hf)


def test_hf_gemma_legacy_hidden_act_uses_tanh_gelu():
    """Original gemma checkpoints carry the legacy hidden_act='gelu'
    that transformers deliberately overrides with hidden_activation
    (tanh-gelu); the converter must match that precedence or such
    checkpoints silently get erf-gelu (review finding, 2026-08-19)."""
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(21)
    cfg = GemmaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=16,
        hidden_act="gelu")  # legacy field; hidden_activation unset
    model = GemmaForCausalLM(cfg).eval()
    eng, in_name, out_name = _engine_for(model)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     22, 17]], np.int64)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    want = _hf_logits(model, ids)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_hf_mistral_sliding_window_parity():
    """Mistral configs carry sliding_window; HF masks keys with
    q - k >= sw. The converter must propagate it — logits match the HF
    forward on a sequence LONGER than the window (where the band
    actually binds)."""
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(7)
    cfg = MistralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=16,
        rope_theta=10000.0, sliding_window=6)
    model = MistralForCausalLM(cfg).eval()
    eng, in_name, out_name = _engine_for(model)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     2, 6]], np.int64)
    want = _hf_logits(model, ids)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # the band genuinely binds: a no-sliding build must NOT match at
    # the tail (sanity that the test can fail)
    g2, i2, o2 = (None, None, None)
    cfg2 = MistralConfig(**{**cfg.to_dict(), "sliding_window": None})
    model.config = cfg2    # same weights, band off in the converter
    eng2, i2, o2 = _engine_for(model)
    got2 = np.asarray(eng2.run({i2: ids.astype(np.float32)})[o2])
    assert np.abs(got2[0, -1] - want[0, -1]).max() > 1e-3


def test_hf_qwen2_sliding_gated_by_use_flag():
    """qwen2 carries sliding_window but applies it only when
    use_sliding_window=True (and then to layers >= max_window_layers)."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(7)
    base = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=16,
                sliding_window=6, use_sliding_window=False)
    model = Qwen2ForCausalLM(Qwen2Config(**base)).eval()
    eng, in_name, out_name = _engine_for(model)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     2, 6]], np.int64)
    want = _hf_logits(model, ids)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_hf_mistral_ring_decode_matches_hf_greedy():
    """Ring-stored sliding KV vs the INDEPENDENT HF oracle: a mistral
    model at seq_len 128 (ring engages: 72 slots < 128) greedy-decodes
    token-for-token what HF's own forward produces, past a ring turn."""
    from transformers import MistralConfig, MistralForCausalLM

    from simpleinfer_tpu.zoo.generate import CachedDecoder

    torch.manual_seed(7)
    cfg = MistralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        rope_theta=10000.0, sliding_window=6)
    model = MistralForCausalLM(cfg).eval()
    eng, in_name, out_name = _engine_for(model, seq_len=128)
    dec = CachedDecoder(eng, scratch_blocks=True)
    import jax

    assert jax.tree_util.tree_leaves(dec.init_cache(1))[0].shape[2] == 72

    prompt = [3, 7, 11, 2]
    steps = 100                         # deep past the 72-slot ring
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(steps):
            logits = model(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    got = dec.generate(np.asarray([prompt]), steps=steps, block=25)
    np.testing.assert_array_equal(got[0], np.asarray(ids))


def test_hf_qwen3_logits_parity():
    """Qwen3: per-head q/k RMSNorm before RoPE + head_dim decoupled
    from hidden/heads (64 != 48/4) — both features checked against the
    HF forward."""
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(21)
    cfg = Qwen3Config(
        vocab_size=48, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=64,
        max_position_embeddings=16, rope_theta=1e6)
    model = Qwen3ForCausalLM(cfg).eval()
    assert "model.layers.0.self_attn.q_norm.weight" in model.state_dict()
    eng, in_name, out_name = _engine_for(model)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 43, 30, 12, 8, 4,
                     2, 6]], np.int64)
    want = _hf_logits(model, ids)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_hf_qwen3_greedy_decode_matches_hf():
    """KV-cache decode (prefill + step path, qk-norm in every leg)
    reproduces HF's own greedy continuation."""
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from simpleinfer_tpu.zoo.generate import CachedDecoder

    torch.manual_seed(22)
    cfg = Qwen3Config(
        vocab_size=48, hidden_size=32, intermediate_size=40,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        max_position_embeddings=32, rope_theta=1e6)
    model = Qwen3ForCausalLM(cfg).eval()
    eng, in_name, out_name = _engine_for(model)
    prompt = [3, 7, 11, 2, 40]
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor([prompt]), max_new_tokens=10, do_sample=False,
            use_cache=True)[0].tolist()
    dec = CachedDecoder(eng)
    got = dec.generate([prompt], steps=10, temperature=0.0)[0].tolist()
    assert got == hf_out


def test_hf_gemma2_logits_parity():
    """Gemma-2: sandwich norms (post-attn + pre/post-ffw), (1+w)
    RMSNorm, sqrt(e) embedding scaling, query_pre_attn_scalar scale,
    attn + final tanh softcapping, alternating sliding layers — all
    against the HF forward."""
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(31)
    cfg = Gemma2Config(
        vocab_size=48, hidden_size=32, intermediate_size=40,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        max_position_embeddings=16, rope_theta=1e4,
        query_pre_attn_scalar=12, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sliding_window=4)
    model = Gemma2ForCausalLM(cfg).eval()
    assert ("model.layers.0.pre_feedforward_layernorm.weight"
            in model.state_dict())
    eng, in_name, out_name = _engine_for(model)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 43, 30, 12, 8, 4,
                     2, 6]], np.int64)
    want = _hf_logits(model, ids)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_hf_gemma2_greedy_decode_matches_hf():
    """KV-cache decode through the scale/softcap-aware step paths
    (plus the mixed ring/full caches of alternating sliding layers)
    reproduces HF's greedy continuation."""
    from transformers import Gemma2Config, Gemma2ForCausalLM

    from simpleinfer_tpu.zoo.generate import CachedDecoder

    torch.manual_seed(32)
    cfg = Gemma2Config(
        vocab_size=48, hidden_size=32, intermediate_size=40,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        max_position_embeddings=32, rope_theta=1e4,
        query_pre_attn_scalar=16, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sliding_window=6)
    model = Gemma2ForCausalLM(cfg).eval()
    eng, in_name, out_name = _engine_for(model)
    prompt = [3, 7, 11, 2, 40]
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor([prompt]), max_new_tokens=10, do_sample=False,
            use_cache=True)[0].tolist()
    dec = CachedDecoder(eng)
    got = dec.generate([prompt], steps=10, temperature=0.0)[0].tolist()
    assert got == hf_out


# ---- phi / GPT-NeoX lineage (round-5: partial rotary + parallel residual) --

from simpleinfer_tpu.frontends.hf_llama import neox_graph_from_hf


def _phi():
    from transformers import PhiConfig, PhiForCausalLM

    torch.manual_seed(11)
    cfg = PhiConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=16,
        partial_rotary_factor=0.5, rope_theta=10000.0)
    return PhiForCausalLM(cfg).eval()


def _neox(parallel=True):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(13)
    cfg = GPTNeoXConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, rotary_pct=0.25,
        use_parallel_residual=parallel)
    return GPTNeoXForCausalLM(cfg).eval()


@pytest.mark.parametrize("make", [_phi, _neox,
                                  lambda: _neox(parallel=False)])
def test_hf_neox_lineage_logits_parity(make):
    """phi-2 (shared-ln parallel residual, partial_rotary_factor 0.5,
    biased head) and GPT-NeoX/Pythia (two-ln parallel residual,
    rotary_pct 0.25, fused qkv de-interleave) — logits parity vs the
    transformers forward, fp32 both sides, both residual wirings."""
    model = make()
    graph, in_name, out_name = neox_graph_from_hf(model, seq_len=16)
    eng = Engine().load_model(None, graph=graph)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     2, 6]], np.int64)
    want = _hf_logits(model, ids)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_hf_neox_greedy_decode_token_parity():
    """KV-cache decode on the converted phi model streams the same
    greedy tokens as the HF forward loop (partial rotary through the
    decode_info path)."""
    model = _phi()
    graph, in_name, out_name = neox_graph_from_hf(model, seq_len=16)
    eng = Engine().load_model(None, graph=graph)
    prompt = [3, 7, 11]
    ids = list(prompt)
    for _ in range(8):
        logits = _hf_logits(model, np.asarray([ids], np.int64))
        ids.append(int(logits[0, -1].argmax()))
    got = CachedDecoder(eng).generate(np.asarray([prompt]), steps=8,
                                      block=4)
    np.testing.assert_array_equal(got[0], np.asarray(ids))


def test_hf_stablelm_logits_and_decode_parity():
    """StableLM (round-5): llama wiring but LayerNorm (w+b) and PARTIAL
    rotary (partial_rotary_factor) — through llama_graph_from_hf's
    norm/rotary_dim switches. Logits + greedy-decode parity vs the
    transformers forward."""
    from transformers import StableLmConfig, StableLmForCausalLM

    torch.manual_seed(17)
    cfg = StableLmConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=16,
        partial_rotary_factor=0.25, rope_theta=10000.0)
    model = StableLmForCausalLM(cfg).eval()
    graph, in_name, out_name = llama_graph_from_hf(model, seq_len=16)
    eng = Engine().load_model(None, graph=graph)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     2, 6]], np.int64)
    want = _hf_logits(model, ids)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[out_name])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    prompt = [3, 7, 11]
    ref = list(prompt)
    for _ in range(8):
        ref.append(int(_hf_logits(model,
                                  np.asarray([ref], np.int64))[0, -1]
                       .argmax()))
    dec = CachedDecoder(eng).generate(np.asarray([prompt]), steps=8,
                                      block=4)
    np.testing.assert_array_equal(dec[0], np.asarray(ref))


def _gptj():
    from transformers import GPTJConfig, GPTJForCausalLM

    torch.manual_seed(41)
    cfg = GPTJConfig(vocab_size=64, n_embd=32, n_layer=2, n_head=4,
                     rotary_dim=4, n_positions=32,
                     initializer_range=0.2)
    return GPTJForCausalLM(cfg).eval()


def test_hf_gptj_logits_parity():
    """GPT-J (round-5): shared-ln parallel residual like phi, but the
    INTERLEAVED rotate_every_two RoPE convention (rope_interleaved=1
    — frequency f rotates the adjacent pair (2f, 2f+1)) with an
    absolute rotary_dim, bias-free separate q/k/v, biased fc/head.
    Logits parity vs the transformers forward."""
    model = _gptj()
    graph, in_name, out_name = neox_graph_from_hf(model, seq_len=16)
    eng = Engine().load_model(None, graph=graph)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     2, 6]], np.int64)
    want = _hf_logits(model, ids)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[
        out_name])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_hf_gptj_decode_token_parity_all_paths():
    """Interleaved RoPE flows through decode_info to the per-step,
    blocked, and scratch-block decode paths — token-equal to the HF
    forward loop on each."""
    model = _gptj()
    graph, in_name, out_name = neox_graph_from_hf(model, seq_len=16)
    eng = Engine().load_model(None, graph=graph)
    prompt = [3, 7, 11]
    ids = list(prompt)
    for _ in range(8):
        logits = _hf_logits(model, np.asarray([ids], np.int64))
        ids.append(int(logits[0, -1].argmax()))
    per_step = CachedDecoder(eng).generate(np.asarray([prompt]),
                                           steps=8, block=1)
    np.testing.assert_array_equal(per_step[0], np.asarray(ids))
    blocked = CachedDecoder(eng).generate(np.asarray([prompt]),
                                          steps=8, block=4)
    np.testing.assert_array_equal(blocked[0], np.asarray(ids))
    scratch = CachedDecoder(eng, scratch_blocks=True).generate(
        np.asarray([prompt]), steps=8, block=4)
    np.testing.assert_array_equal(scratch[0], np.asarray(ids))


def test_apply_rope_interleaved_vs_oracle():
    """rotate_every_two lane wiring vs a float64 numpy loop oracle:
    pair (2f, 2f+1) rotates by angle pos * theta^(-2f/R); the
    half-split convention at the same tables must NOT match (the
    conventions' caches are not interchangeable)."""
    import jax.numpy as jnp

    from simpleinfer_tpu.ops.attention import apply_rope, rope_cos_sin

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 1, 3, 8)).astype(np.float32)
    pos = np.arange(3)
    r = 6
    cos, sin = rope_cos_sin(jnp.asarray(pos), r, 10000.0)
    got = np.asarray(apply_rope(jnp.asarray(x), cos[None, None],
                                sin[None, None], interleaved=True))

    want = x.astype(np.float64).copy()
    for t in range(3):
        for f in range(r // 2):
            ang = pos[t] / (10000.0 ** (f / (r // 2)))
            c, s = np.cos(ang), np.sin(ang)
            x0, x1 = want[0, 0, t, 2 * f], want[0, 0, t, 2 * f + 1]
            want[0, 0, t, 2 * f] = x0 * c - x1 * s
            want[0, 0, t, 2 * f + 1] = x0 * s + x1 * c
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=1e-5, atol=1e-6)
    half = np.asarray(apply_rope(jnp.asarray(x), cos[None, None],
                                 sin[None, None]))
    assert np.abs(half - got).max() > 1e-3


def test_hf_opt_logits_and_decode_parity():
    """OPT (round-5): the learned-positions lineage — token + position
    embeddings (the +2 offset baked in by slicing embed_positions),
    pre-LN nn.MultiheadAttention blocks (separate q/k/v packed into
    the op's in_proj layout), ReLU MLP. Logits parity vs the
    transformers forward; decode token-equal on the per-step, blocked,
    and scratch paths (the position table rides _slice_seq as a graph
    constant, like zoo.build_gpt)."""
    from transformers import OPTConfig, OPTForCausalLM

    from simpleinfer_tpu.frontends.hf_llama import opt_graph_from_hf

    torch.manual_seed(43)
    cfg = OPTConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, ffn_dim=64,
                    max_position_embeddings=32, init_std=0.2)
    model = OPTForCausalLM(cfg).eval()
    graph, in_name, out_name = opt_graph_from_hf(model, seq_len=16)
    eng = Engine().load_model(None, graph=graph)
    ids = np.array([[3, 7, 11, 2, 40, 9, 1, 0, 5, 63, 30, 12, 8, 4,
                     2, 6]], np.int64)
    want = _hf_logits(model, ids)
    got = np.asarray(eng.run({in_name: ids.astype(np.float32)})[
        out_name])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    prompt = [3, 7, 11]
    ref = list(prompt)
    for _ in range(8):
        lg = _hf_logits(model, np.asarray([ref], np.int64))
        ref.append(int(lg[0, -1].argmax()))
    for scratch in (False, True):
        dec = CachedDecoder(eng, scratch_blocks=scratch).generate(
            np.asarray([prompt]), steps=8, block=4)
        np.testing.assert_array_equal(dec[0], np.asarray(ref))


def test_hf_opt_rejects_unsupported():
    from transformers import OPTConfig, OPTForCausalLM

    from simpleinfer_tpu.frontends.hf_llama import opt_graph_from_hf

    cfg = OPTConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                    num_attention_heads=2, ffn_dim=32,
                    max_position_embeddings=16,
                    do_layer_norm_before=False)
    with pytest.raises(ValueError, match="do_layer_norm_before"):
        opt_graph_from_hf(OPTForCausalLM(cfg).eval())
