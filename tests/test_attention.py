"""Transformer op lowerings (ops/attention.py) vs torch oracles.

Same discipline as tests/test_ops_extra.py: torch (CPU) is the oracle,
rank-4 tensors cross the boundary NHWC<->NCHW exactly as the engine
stages them.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from simpleinfer_tpu.config import EngineConfig
from simpleinfer_tpu.ops import lower_operator

from test_ops_extra import make_op, run, nhwc, nchw

CFG = EngineConfig()
RNG = np.random.default_rng(1234)


def randn(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


# ------------------------------------------------------------- matmul/bmm
@pytest.mark.parametrize("type_", ["torch.matmul", "torch.bmm"])
def test_batched_matmul_rank3(type_):
    a, b = randn(4, 5, 7), randn(4, 7, 3)
    impl = lower_operator(make_op(type_), CFG)
    got = run(impl, a, b)
    np.testing.assert_allclose(got, a @ b, rtol=1e-5, atol=1e-5)


def test_matmul_rank4_physical_nhwc():
    a, b = randn(2, 3, 5, 7), randn(2, 3, 7, 4)
    impl = lower_operator(make_op("torch.matmul"), CFG)
    got = run(impl, nhwc(a), nhwc(b))
    np.testing.assert_allclose(nchw(got), a @ b, rtol=1e-5, atol=1e-5)


def test_select():
    x = randn(2, 6, 5)
    impl = lower_operator(make_op("torch.select",
                                  params={"dim": 1, "index": 3}), CFG)
    got = run(impl, x)
    np.testing.assert_allclose(got, x[:, 3, :], rtol=1e-6)


def test_select_rank4_negative_dim():
    x = randn(2, 6, 5, 4)
    impl = lower_operator(make_op("torch.select",
                                  params={"dim": -3, "index": 2}), CFG)
    got = run(impl, nhwc(x))
    np.testing.assert_allclose(got, x[:, 2], rtol=1e-6)


def test_embedding():
    w = randn(11, 8)
    idx = RNG.integers(0, 11, size=(3, 5)).astype(np.int64)
    impl = lower_operator(make_op(
        "nn.Embedding",
        params={"num_embeddings": 11, "embedding_dim": 8, "sparse": False},
        attrs={"weight": w}), CFG)
    got = run(impl, idx)
    ref = F.embedding(torch.from_numpy(idx), torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_embedding_float_indices():
    """Engine inputs may stage indices as floats; gather must still work."""
    w = randn(7, 4)
    idx = np.array([[0.0, 6.0, 3.0]], dtype=np.float32)
    impl = lower_operator(make_op(
        "nn.Embedding",
        params={"num_embeddings": 7, "embedding_dim": 4},
        attrs={"weight": w}), CFG)
    got = run(impl, idx)
    np.testing.assert_allclose(got[0, 1], w[6], rtol=1e-6)


# ----------------------------------------------------------------- SDPA
def _sdpa_ref(q, k, v, mask=None, is_causal=False):
    t = lambda a: torch.from_numpy(a)
    m = t(mask) if mask is not None else None
    return F.scaled_dot_product_attention(
        t(q), t(k), t(v), attn_mask=m, is_causal=is_causal).numpy()


def test_sdpa_rank4():
    q, k, v = randn(2, 3, 6, 8), randn(2, 3, 10, 8), randn(2, 3, 10, 8)
    impl = lower_operator(make_op("F.scaled_dot_product_attention",
                                  params={"dropout_p": 0.0,
                                          "is_causal": False}), CFG)
    got = nchw(run(impl, nhwc(q), nhwc(k), nhwc(v)))
    np.testing.assert_allclose(got, _sdpa_ref(q, k, v), rtol=1e-4, atol=1e-5)


def test_sdpa_causal():
    q, k, v = randn(1, 2, 7, 4), randn(1, 2, 7, 4), randn(1, 2, 7, 4)
    impl = lower_operator(make_op("F.scaled_dot_product_attention",
                                  params={"dropout_p": 0.0,
                                          "is_causal": True}), CFG)
    got = nchw(run(impl, nhwc(q), nhwc(k), nhwc(v)))
    np.testing.assert_allclose(got, _sdpa_ref(q, k, v, is_causal=True),
                               rtol=1e-4, atol=1e-5)


def test_sdpa_bool_mask():
    """SDPA bool-mask semantics: True = attend."""
    q, k, v = randn(1, 2, 5, 4), randn(1, 2, 6, 4), randn(1, 2, 6, 4)
    mask = RNG.random((1, 2, 5, 6)) > 0.3
    mask[..., 0] = True  # keep every row attendable
    impl = lower_operator(make_op("F.scaled_dot_product_attention",
                                  params={"dropout_p": 0.0,
                                          "is_causal": False}), CFG)
    got = nchw(run(impl, nhwc(q), nhwc(k), nhwc(v), nhwc(mask)))
    np.testing.assert_allclose(got, _sdpa_ref(q, k, v, mask=mask),
                               rtol=1e-4, atol=1e-5)


# ----------------------------------------------------- MultiheadAttention
def _mha_module(embed_dim, num_heads, batch_first, bias=True,
                kdim=None, vdim=None, seed=0):
    torch.manual_seed(seed)
    return torch.nn.MultiheadAttention(
        embed_dim, num_heads, bias=bias, batch_first=batch_first,
        kdim=kdim, vdim=vdim).eval()


def _mha_attrs(m, bias=True):
    attrs = {}
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    if "in_proj_weight" in sd:
        attrs["in_proj_weight"] = sd["in_proj_weight"]
    else:
        attrs["q_proj_weight"] = sd["q_proj_weight"]
        attrs["k_proj_weight"] = sd["k_proj_weight"]
        attrs["v_proj_weight"] = sd["v_proj_weight"]
    if bias:
        attrs["in_proj_bias"] = sd["in_proj_bias"]
        attrs["out_proj.bias"] = sd["out_proj.bias"]
    attrs["out_proj.weight"] = sd["out_proj.weight"]
    return attrs


@pytest.mark.parametrize("batch_first", [True, False])
def test_mha_self_attention(batch_first):
    E, H = 16, 4
    m = _mha_module(E, H, batch_first)
    x = randn(2, 6, E) if batch_first else randn(6, 2, E)
    ref, _ = m(torch.from_numpy(x), torch.from_numpy(x),
               torch.from_numpy(x), need_weights=False)
    impl = lower_operator(make_op(
        "nn.MultiheadAttention",
        params={"embed_dim": E, "num_heads": H, "batch_first": batch_first,
                "add_zero_attn": False, "bias": True},
        attrs=_mha_attrs(m)), CFG)
    got = run(impl, x)
    np.testing.assert_allclose(got, ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mha_cross_attention_three_inputs():
    E, H = 12, 3
    m = _mha_module(E, H, batch_first=True, seed=3)
    q, k, v = randn(2, 5, E), randn(2, 9, E), randn(2, 9, E)
    ref, _ = m(*(torch.from_numpy(t) for t in (q, k, v)),
               need_weights=False)
    impl = lower_operator(make_op(
        "nn.MultiheadAttention",
        params={"embed_dim": E, "num_heads": H, "batch_first": True},
        attrs=_mha_attrs(m)), CFG)
    got = run(impl, q, k, v)
    np.testing.assert_allclose(got, ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mha_two_inputs_kv_shared():
    E, H = 8, 2
    m = _mha_module(E, H, batch_first=True, seed=4)
    q, kv = randn(1, 4, E), randn(1, 7, E)
    ref, _ = m(torch.from_numpy(q), torch.from_numpy(kv),
               torch.from_numpy(kv), need_weights=False)
    impl = lower_operator(make_op(
        "nn.MultiheadAttention",
        params={"embed_dim": E, "num_heads": H, "batch_first": True},
        attrs=_mha_attrs(m)), CFG)
    got = run(impl, q, kv)
    np.testing.assert_allclose(got, ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mha_attn_weights_output():
    """Two declared outputs -> (attn_output, head-averaged weights)."""
    E, H = 8, 2
    m = _mha_module(E, H, batch_first=True, seed=5)
    x = randn(2, 5, E)
    ref_out, ref_w = m(torch.from_numpy(x), torch.from_numpy(x),
                       torch.from_numpy(x), need_weights=True,
                       average_attn_weights=True)
    impl = lower_operator(make_op(
        "nn.MultiheadAttention",
        params={"embed_dim": E, "num_heads": H, "batch_first": True},
        attrs=_mha_attrs(m), n_out=2), CFG)
    got_out, got_w = run(impl, x)
    np.testing.assert_allclose(got_out, ref_out.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_w, ref_w.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mha_float_mask():
    E, H = 8, 2
    m = _mha_module(E, H, batch_first=True, seed=6)
    x = randn(1, 5, E)
    mask = (RNG.random((5, 5)) > 0.5).astype(np.float32) * -1e9
    ref, _ = m(torch.from_numpy(x), torch.from_numpy(x),
               torch.from_numpy(x), attn_mask=torch.from_numpy(mask),
               need_weights=False)
    impl = lower_operator(make_op(
        "nn.MultiheadAttention",
        params={"embed_dim": E, "num_heads": H, "batch_first": True},
        attrs=_mha_attrs(m)), CFG)
    got = run(impl, x, mask)
    np.testing.assert_allclose(got, ref.detach().numpy(),
                               rtol=1e-4, atol=2e-5)


def test_mha_separate_kdim_vdim():
    E, H, KD, VD = 8, 2, 6, 10
    m = _mha_module(E, H, batch_first=True, kdim=KD, vdim=VD, seed=7)
    q, k, v = randn(2, 4, E), randn(2, 6, KD), randn(2, 6, VD)
    ref, _ = m(*(torch.from_numpy(t) for t in (q, k, v)),
               need_weights=False)
    impl = lower_operator(make_op(
        "nn.MultiheadAttention",
        params={"embed_dim": E, "num_heads": H, "batch_first": True,
                "kdim": KD, "vdim": VD},
        attrs=_mha_attrs(m)), CFG)
    got = run(impl, q, k, v)
    np.testing.assert_allclose(got, ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mha_flash_path_matches(monkeypatch):
    """use_pallas engines route maskless single-output attention through
    the flash kernel; interpreted here, same gate as the real chip."""
    from jax.experimental.pallas import tpu as pltpu

    import simpleinfer_tpu.ops.attention as A

    E, H = 16, 4
    m = _mha_module(E, H, batch_first=True, seed=9)
    x = randn(2, 33, E)  # unaligned L exercises kernel padding
    ref, _ = m(torch.from_numpy(x), torch.from_numpy(x),
               torch.from_numpy(x), need_weights=False)
    cfg = EngineConfig(use_pallas=True)
    impl = lower_operator(make_op(
        "nn.MultiheadAttention",
        params={"embed_dim": E, "num_heads": H, "batch_first": True},
        attrs=_mha_attrs(m)), cfg)
    monkeypatch.setattr(A, "_pallas_ok", lambda: True)
    # the profitability gate would route L=33 to XLA (correctly — flash
    # loses at short seq, docs/PERF.md); force it open to test the path
    import simpleinfer_tpu.kernels.attention as KA
    monkeypatch.setattr(KA, "flash_profitable",
                        lambda lq, lk, causal=True: True)
    with pltpu.force_tpu_interpret_mode():
        got = run(impl, x)
    np.testing.assert_allclose(got, ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("affine", [True, False])
def test_rms_norm(affine):
    torch.manual_seed(15)
    m = torch.nn.RMSNorm(12, eps=1e-6, elementwise_affine=affine).eval()
    x = randn(2, 5, 12)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    attrs = {"weight": m.weight.detach().numpy()} if affine else {}
    impl = lower_operator(make_op(
        "nn.RMSNorm",
        params={"normalized_shape": [12], "eps": 1e-6,
                "elementwise_affine": affine},
        attrs=attrs), CFG)
    got = run(impl, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rms_norm_rank4_nhwc():
    torch.manual_seed(16)
    m = torch.nn.RMSNorm([3, 4], eps=1e-6).eval()
    x = randn(2, 5, 3, 4)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    impl = lower_operator(make_op(
        "nn.RMSNorm",
        params={"normalized_shape": [3, 4], "eps": 1e-6,
                "elementwise_affine": True},
        attrs={"weight": m.weight.detach().numpy()}), CFG)
    got = run(impl, nhwc(x))
    np.testing.assert_allclose(nchw(got), want, rtol=1e-5, atol=1e-6)
