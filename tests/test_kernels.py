"""Pallas kernel tests vs jnp references.

The analog of the reference's GemmPack4F32-vs-GemmPack4F32Ref tests over
odd M/N/K shapes including tails (/root/reference/test/test_3rdparty/
test_gemm.cpp:19-91). On CPU the kernels run under the Pallas TPU
interpreter (SURVEY.md §4.4's "mock backend" role); set SI_TPU_TESTS=1
to run them compiled on a real chip.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from simpleinfer_tpu.kernels.matmul import (
    matmul,
    matmul_int8w,
    matmul_int8w_ref,
    matmul_ref,
)
from simpleinfer_tpu.quant.tensor import quantize_per_channel

ON_TPU = bool(os.environ.get("SI_TPU_TESTS"))
RNG = np.random.default_rng(11)


def run_kernel(fn, *args, **kw):
    if ON_TPU:
        return np.asarray(fn(*args, **kw))
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(fn(*args, **kw))


# M, K, N shapes: aligned, odd tails, tiny (all the gemm.cpp tail cases)
SHAPES = [
    (128, 128, 128),
    (256, 512, 256),
    (100, 60, 50),      # every dim unaligned
    (1, 256, 255),      # single row, N tail (yolo head 256->255)
    (37, 129, 131),     # just over tile boundaries
    (8, 16, 8),         # tiny (yolov5n first layers)
]


@pytest.mark.parametrize("m,k,n", SHAPES)
def test_matmul_fp32(m, k, n):
    x = RNG.standard_normal((m, k), dtype=np.float32)
    w = RNG.standard_normal((k, n), dtype=np.float32)
    got = run_kernel(matmul, jnp.asarray(x), jnp.asarray(w))
    want = np.asarray(matmul_ref(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, atol=2e-4 * np.sqrt(k), rtol=1e-5)


@pytest.mark.parametrize("m,k,n", [(128, 128, 128), (100, 60, 50)])
@pytest.mark.parametrize("activation", [None, "relu", "silu", "hardswish"])
def test_matmul_bias_activation(m, k, n, activation):
    x = RNG.standard_normal((m, k), dtype=np.float32)
    w = RNG.standard_normal((k, n), dtype=np.float32)
    b = RNG.standard_normal(n).astype(np.float32)
    got = run_kernel(matmul, jnp.asarray(x), jnp.asarray(w),
                     jnp.asarray(b), activation)
    want = np.asarray(matmul_ref(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), activation))
    np.testing.assert_allclose(got, want, atol=3e-4 * np.sqrt(k), rtol=1e-5)


@pytest.mark.parametrize("m,k,n", SHAPES)
def test_matmul_int8w(m, k, n):
    x = RNG.standard_normal((m, k), dtype=np.float32)
    w = RNG.standard_normal((k, n), dtype=np.float32)
    q = quantize_per_channel(w, axis=1)  # [K,N], out channels on axis 1
    got = run_kernel(matmul_int8w, jnp.asarray(x), q.data, q.scale)
    want = np.asarray(matmul_int8w_ref(jnp.asarray(x), q.data, q.scale))
    np.testing.assert_allclose(got, want, atol=2e-4 * np.sqrt(k), rtol=1e-5)


def test_matmul_int8w_dequant_accuracy():
    """Fused-dequant kernel vs the FP32 matmul on the ORIGINAL weights:
    error bounded by the quantization step (the reference's tolerance
    discipline, test_conv_2d.cpp:127)."""
    m, k, n = 64, 128, 96
    x = RNG.standard_normal((m, k), dtype=np.float32)
    w = RNG.standard_normal((k, n), dtype=np.float32)
    q = quantize_per_channel(w, axis=1)
    got = run_kernel(matmul_int8w, jnp.asarray(x), q.data, q.scale)
    want = x @ w
    # per-element error <= sum_k |x| * scale/2; use a statistical bound
    bound = np.abs(x).sum(1, keepdims=True) * np.asarray(q.scale)[None, :] / 2
    assert (np.abs(got - want) <= np.maximum(bound * 0.5, 1e-3)).mean() > 0.99


def test_matmul_bf16():
    m, k, n = 128, 256, 128
    x = RNG.standard_normal((m, k)).astype(jnp.bfloat16)
    w = RNG.standard_normal((k, n)).astype(jnp.bfloat16)
    got = run_kernel(matmul, jnp.asarray(x), jnp.asarray(w))
    want = np.asarray(
        jnp.dot(x, w, preferred_element_type=jnp.float32)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=0.05 * np.sqrt(k), rtol=0.02)


# ---------------------------------------------------------- conv3x3 kernel
def test_conv3x3_kernel_matches_lax_reference():
    """Implicit-GEMM 3x3 Pallas conv vs the lax oracle (interpret mode
    on CPU; compiled on the real chip under SI_TPU_TESTS). Measured
    SLOWER than XLA's conv e2e (docs/PERF.md) — kept as a correct,
    documented exploration like the reference's test_highway scratchpad
    (SURVEY.md §4.3)."""
    from simpleinfer_tpu.kernels.conv3x3 import (
        conv3x3_reference, conv3x3_s1_same,
    )

    rng = np.random.default_rng(5)
    interpret = jax.default_backend() != "tpu"
    for (n, h, w, c, oc) in [(2, 8, 8, 16, 24), (1, 5, 7, 8, 8)]:
        x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
        wt = jnp.asarray(rng.standard_normal((3, 3, c, oc)) * 0.1,
                         jnp.float32)
        b = jnp.asarray(rng.standard_normal(oc), jnp.float32)
        got = conv3x3_s1_same(x, wt, b, "silu", interpret=interpret)
        want = conv3x3_reference(x, wt, b, "silu")
        tol = 1e-4 if interpret else 5e-2  # real MXU multiplies in bf16
        assert float(jnp.abs(got - want).max()) < tol


# ------------------------------------------------------- s8 x s8 GEMM
@pytest.mark.parametrize("m,k,n", SHAPES)
def test_matmul_s8s8_exact(m, k, n):
    """Native int8-MXU GEMM vs XLA's s32 dot — EXACT (int32 accum;
    rounding only in the shared f32 epilogue)."""
    from simpleinfer_tpu.kernels import matmul_s8s8
    from simpleinfer_tpu.kernels.matmul import matmul_s8s8_ref

    xq = jnp.asarray(RNG.integers(-127, 127, (m, k), dtype=np.int8))
    wq = jnp.asarray(RNG.integers(-127, 127, (k, n), dtype=np.int8))
    scale = jnp.asarray(RNG.uniform(1e-3, 1e-2, n), jnp.float32)
    bias = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    got = run_kernel(matmul_s8s8, xq, wq, scale, bias, "silu")
    want = np.asarray(matmul_s8s8_ref(xq, wq, scale, bias, "silu"))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want.astype(np.float32),
        atol=2e-2, rtol=2e-2)  # bf16 output rounding only


def test_matmul_s8s8_scalar_scale():
    from simpleinfer_tpu.kernels import matmul_s8s8
    from simpleinfer_tpu.kernels.matmul import matmul_s8s8_ref

    xq = jnp.asarray(RNG.integers(-127, 127, (32, 64), dtype=np.int8))
    wq = jnp.asarray(RNG.integers(-127, 127, (64, 48), dtype=np.int8))
    got = run_kernel(matmul_s8s8, xq, wq, 0.01, out_dtype=jnp.float32)
    want = np.asarray(matmul_s8s8_ref(xq, wq, 0.01,
                                      out_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=0, rtol=0)  # exact in f32


# ------------------------------------------------------- flash attention
from simpleinfer_tpu.kernels.attention import (  # noqa: E402
    flash_attention,
    flash_attention_ref,
)

# (BH, Lq, Lk, D): aligned, tails, cross-attention lengths, small head
ATTN_SHAPES = [
    (2, 128, 128, 64),
    (3, 100, 100, 32),    # unaligned L
    (1, 257, 257, 128),   # just over two k-blocks
    (2, 64, 200, 64),     # cross-attention Lq != Lk
    (1, 8, 8, 16),        # tiny
]


@pytest.mark.parametrize("bh,lq,lk,d", ATTN_SHAPES)
def test_flash_attention_fp32(bh, lq, lk, d):
    q = RNG.standard_normal((bh, lq, d), dtype=np.float32)
    k = RNG.standard_normal((bh, lk, d), dtype=np.float32)
    v = RNG.standard_normal((bh, lk, d), dtype=np.float32)
    got = run_kernel(flash_attention, *map(jnp.asarray, (q, k, v)))
    want = np.asarray(flash_attention_ref(*map(jnp.asarray, (q, k, v))))
    tol = 5e-6 if not ON_TPU else 2e-2  # real MXU multiplies in bf16
    np.testing.assert_allclose(got, want, atol=tol * np.sqrt(d), rtol=1e-3)


@pytest.mark.parametrize("bh,lq,lk,d", [(2, 128, 128, 64),
                                        (1, 100, 100, 32),
                                        # unaligned multi-block at the
                                        # round-5 256x256 defaults
                                        (1, 700, 700, 64)])
def test_flash_attention_causal(bh, lq, lk, d):
    q = RNG.standard_normal((bh, lq, d), dtype=np.float32)
    k = RNG.standard_normal((bh, lk, d), dtype=np.float32)
    v = RNG.standard_normal((bh, lk, d), dtype=np.float32)
    got = run_kernel(flash_attention, *map(jnp.asarray, (q, k, v)),
                     causal=True)
    want = np.asarray(flash_attention_ref(*map(jnp.asarray, (q, k, v)),
                                          causal=True))
    tol = 5e-6 if not ON_TPU else 2e-2
    np.testing.assert_allclose(got, want, atol=tol * np.sqrt(d), rtol=1e-3)


BAND_CASES = [
    # (bh, l, d, sw, block_q, block_k)
    (2, 256, 64, 64, 128, 128),
    (2, 256, 64, 100, 64, 128),   # band not block-aligned, small bq
    (1, 512, 128, 256, 128, 128), # the mistral-ish shape class
    (3, 300, 64, 37, 128, 128),   # unaligned L, narrow band
    (2, 256, 64, 1, 128, 128),    # degenerate: attend self only
    (2, 256, 64, 300, 128, 128),  # band wider than L = plain causal
]


@pytest.mark.parametrize("bh,l,d,sw,bq,bk", BAND_CASES)
def test_flash_attention_sliding_window(bh, l, d, sw, bq, bk):
    """Banded causal (sliding-window) kernel vs the banded oracle —
    key blocks outside the band are skipped entirely (round-4: the SWA
    prefill gap, zoo/generate.py:46-47 in round 3)."""
    q = RNG.standard_normal((bh, l, d), dtype=np.float32)
    k = RNG.standard_normal((bh, l, d), dtype=np.float32)
    v = RNG.standard_normal((bh, l, d), dtype=np.float32)
    got = run_kernel(flash_attention, *map(jnp.asarray, (q, k, v)),
                     causal=True, sliding_window=sw,
                     block_q=bq, block_k=bk)
    want = np.asarray(flash_attention_ref(*map(jnp.asarray, (q, k, v)),
                                          causal=True, sliding_window=sw))
    tol = 5e-6 if not ON_TPU else 2e-2
    np.testing.assert_allclose(got, want, atol=tol * np.sqrt(d), rtol=1e-3)


def test_flash_sliding_window_requires_causal():
    q = jnp.zeros((1, 64, 32))
    with pytest.raises(ValueError, match="causal"):
        flash_attention(q, q, q, sliding_window=16)
    with pytest.raises(ValueError, match=">= 1"):
        flash_attention(q, q, q, causal=True, sliding_window=0)


def test_flash_causal_requires_square():
    """Causal Lq != Lk is rejected: the kernel aligns causal top-left,
    ops.attention._sdpa aligns bottom-right — dispatch between them must
    never cross such a shape (ADVICE r1)."""
    q = jnp.zeros((1, 64, 32))
    k = jnp.zeros((1, 128, 32))
    with pytest.raises(ValueError, match="Lq == Lk"):
        flash_attention(q, k, k, causal=True)


def test_flash_gate_env_override(monkeypatch):
    """SI_FLASH_MIN_* are read at call time, so a long-lived process can
    retune without re-importing (ADVICE r1)."""
    from simpleinfer_tpu.kernels.attention import flash_profitable

    monkeypatch.setenv("SI_FLASH_MIN_LK", "64")
    monkeypatch.setenv("SI_FLASH_MIN_LQ", "16")
    assert flash_profitable(16, 64)
    monkeypatch.setenv("SI_FLASH_MIN_LK", "100000")
    assert not flash_profitable(2048, 2048)


def test_flash_profitable_gate():
    """Sequence-length dispatch gate (docs/PERF.md: flash LOSES 2x at
    ViT's L=197; decode Lq=1 must always stay on XLA)."""
    from simpleinfer_tpu.kernels.attention import flash_profitable

    assert not flash_profitable(197, 197)     # ViT-base: measured loss
    assert not flash_profitable(1, 4096)      # decode: single query row
    assert not flash_profitable(512, 512)     # short-KV prefill
    assert not flash_profitable(1536, 1536)   # measured 0.86x: XLA wins
    assert flash_profitable(2048, 2048)       # measured 1.16x (round-5
    #                                           256x256-block re-sweep)
    assert flash_profitable(4096, 4096)       # measured 2.35x
    assert flash_profitable(256, 2048)        # threshold boundary
    # NON-causal crosses later (0.87x at 2048, 1.62x at 4096)
    assert not flash_profitable(2048, 2048, causal=False)
    assert flash_profitable(4096, 4096, causal=False)


def test_flash_band_profitable_gate():
    """Banded dispatch gate (scripts/flash_band_sweep.py measurements:
    XLA fully fuses at L=1024 and wins 4x; the kernel wins from 1536 up,
    201x at 8192/sw256)."""
    from simpleinfer_tpu.kernels.attention import flash_band_profitable

    assert not flash_band_profitable(1024, 1024, 256)   # 0.24x: XLA
    assert flash_band_profitable(1536, 1536, 256)       # 1.17x
    assert flash_band_profitable(2048, 2048, 256)       # 1.57x
    assert flash_band_profitable(2048, 2048, 512)       # 1.09x (sw=L/4)
    assert not flash_band_profitable(2048, 2048, 1024)  # band too wide
    assert flash_band_profitable(8192, 8192, 256)       # 201x
    assert not flash_band_profitable(1, 4096, 256)      # decode row
    assert not flash_band_profitable(4096, 4096, None)  # no band


def test_flash_attention_rank4_bf16():
    q = RNG.standard_normal((2, 3, 96, 32)).astype(jnp.bfloat16)
    k = RNG.standard_normal((2, 3, 96, 32)).astype(jnp.bfloat16)
    v = RNG.standard_normal((2, 3, 96, 32)).astype(jnp.bfloat16)
    got = run_kernel(flash_attention, q, k, v)
    want = np.asarray(flash_attention_ref(q, k, v), np.float32)
    assert got.shape == (2, 3, 96, 32)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=0.05, rtol=0.05)


def test_flash_attention_matches_multiblock_q():
    """Several q blocks + several k blocks exercise the running
    (max, sum) renormalization across the arbitrary grid dim."""
    q = RNG.standard_normal((1, 384, 64), dtype=np.float32)
    k = RNG.standard_normal((1, 384, 64), dtype=np.float32)
    v = RNG.standard_normal((1, 384, 64), dtype=np.float32)
    got = run_kernel(flash_attention, *map(jnp.asarray, (q, k, v)),
                     block_q=128, block_k=128)
    want = np.asarray(flash_attention_ref(*map(jnp.asarray, (q, k, v))))
    tol = 5e-6 if not ON_TPU else 2e-2
    np.testing.assert_allclose(got, want, atol=tol * 8, rtol=1e-3)


@pytest.mark.parametrize("name", ["gelu", "elu@1.0"])
def test_kernel_safe_activation_variants(name):
    """Mosaic has no erf/erfc/expm1 lowering (probed on-chip
    2026-08-18): resolve_activation(kernel=True) must swap in
    lowerable variants that match the exact forms to ~1e-6. The
    on-chip compile itself is covered by SI_TPU_TESTS kernel runs."""
    from simpleinfer_tpu.kernels.matmul import resolve_activation

    x = jnp.linspace(-4, 4, 1024, dtype=jnp.float32)
    exact = resolve_activation(name)(x)
    safe = resolve_activation(name, kernel=True)(x)
    assert resolve_activation(name, kernel=True) is not \
        resolve_activation(name)
    np.testing.assert_allclose(np.asarray(safe), np.asarray(exact),
                               atol=2e-6)


def test_stem_s2d_kernel_matches_lax_reference():
    """Pallas space-to-depth stem (6x6 s2 p2, 3->32) vs the lax oracle,
    in the packed jo=4 output layout (interpret mode on CPU; compiled
    on the real chip under SI_TPU_TESTS). docs/PERF.md has the A/B vs
    XLA's block-Toeplitz stem form."""
    from simpleinfer_tpu.kernels.stem import (pack_stem_input,
                                              pack_stem_weights, stem_s2d,
                                              stem_s2d_reference)

    rng = np.random.default_rng(3)
    b_ = 2
    x = rng.random((b_, 640, 640, 3)).astype(np.float32)
    w = (rng.standard_normal((32, 3, 6, 6)) / 10).astype(np.float32)
    bias = (rng.standard_normal(32) * 0.05).astype(np.float32)

    interpret = jax.default_backend() != "tpu"
    got = np.asarray(stem_s2d(jnp.asarray(pack_stem_input(x), jnp.bfloat16),
                              jnp.asarray(pack_stem_weights(w)),
                              jnp.asarray(bias), activation="silu",
                              interpret=interpret), np.float32)
    want = np.asarray(stem_s2d_reference(jnp.asarray(x, jnp.bfloat16),
                                         w, bias, "silu"), np.float32)
    assert got.shape == (b_, 320, 320, 32)
    tol = 0.02 * float(np.abs(want).max())
    assert np.abs(got - want).max() < tol


# ---- per-row-length decode attention (kernels/decode_attn, round-3) --------
from simpleinfer_tpu.kernels.decode_attn import (decode_attention,
                                                 decode_attention_ref)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("lens", [
    [0, 1, 17, 64],        # empty / single / straddling / full
    [64, 64, 64, 64],      # uniform full window
    [5, 5, 5, 5],          # uniform young pool
])
def test_decode_attention_vs_ref_dense(dtype, lens):
    N, KV, G, D, L = 4, 2, 3, 16, 64
    q = jnp.asarray(RNG.standard_normal((N, KV, G, D)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((N, KV, L, D)), dtype)
    v = jnp.asarray(RNG.standard_normal((N, KV, L, D)), dtype)
    lens = np.asarray(lens, np.int32)
    o, m, l = (np.asarray(t) for t in decode_attention(
        q, k, v, lens, scale=0.25, block_k=16, interpret=not ON_TPU))
    ro, rm, rl = (np.asarray(t) for t in decode_attention_ref(
        q, k, v, lens, scale=0.25))
    # real MXU multiplies f32 in bf16 passes (same convention as
    # the conv3x3 kernel test's on-chip tolerance)
    tol = (1e-5 if dtype == jnp.float32 else 3e-2) if not ON_TPU \
        else 5e-2
    np.testing.assert_allclose(o, ro, rtol=tol, atol=tol)
    np.testing.assert_allclose(m, rm, rtol=tol, atol=tol)
    np.testing.assert_allclose(l, rl, rtol=tol, atol=tol)
    # empty rows report the neutral partial (merged away by the caller)
    if lens[0] == 0:
        assert (o[0] == 0).all() and (l[0] == 0).all()


def test_decode_attention_vs_ref_int8():
    """int8 cache leaves: the kernel's in-register dequant (scores *
    k_s, probs * v_s) must match dequantize-then-attend."""
    from simpleinfer_tpu.zoo.generate import _kv_quantize

    N, KV, G, D, L = 3, 2, 4, 32, 96
    q = jnp.asarray(RNG.standard_normal((N, KV, G, D)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((N, KV, L, D)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((N, KV, L, D)), jnp.float32)
    kq, ks = _kv_quantize(k)
    vq, vs = _kv_quantize(v)
    lens = np.asarray([0, 33, 96], np.int32)
    o, m, l = (np.asarray(t) for t in decode_attention(
        q, (kq, ks), (vq, vs), lens, scale=0.18, block_k=32,
        interpret=not ON_TPU))
    ro, rm, rl = (np.asarray(t) for t in decode_attention_ref(
        q, (kq, ks), (vq, vs), lens, scale=0.18))
    tol = 1e-4 if not ON_TPU else 5e-2
    np.testing.assert_allclose(o, ro, rtol=tol, atol=tol)
    np.testing.assert_allclose(l, rl, rtol=tol, atol=tol)


def test_decode_attention_odd_window_single_block():
    """A window the block size does not divide degrades to fewer/whole
    blocks but stays correct."""
    N, KV, G, D, L = 2, 1, 2, 8, 24
    q = jnp.asarray(RNG.standard_normal((N, KV, G, D)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((N, KV, L, D)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((N, KV, L, D)), jnp.float32)
    lens = np.asarray([7, 24], np.int32)
    o, m, l = (np.asarray(t) for t in decode_attention(
        q, k, v, lens, scale=0.3, block_k=16, interpret=not ON_TPU))
    ro, rm, rl = (np.asarray(t) for t in decode_attention_ref(
        q, k, v, lens, scale=0.3))
    tol = 1e-5 if not ON_TPU else 5e-2
    np.testing.assert_allclose(o, ro, rtol=tol, atol=tol)
    np.testing.assert_allclose(l, rl, rtol=tol, atol=tol)


@pytest.mark.parametrize("kv,g", [(1, 8), (4, 1), (2, 4)])
def test_decode_attention_gqa_mqa_shapes(kv, g):
    """MQA (kv=1), per-head (group=1) and GQA head groupings."""
    N, D, L = 3, 16, 48
    q = jnp.asarray(RNG.standard_normal((N, kv, g, D)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((N, kv, L, D)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((N, kv, L, D)), jnp.float32)
    lens = np.asarray([0, 13, 48], np.int32)
    o, m, l = (np.asarray(t) for t in decode_attention(
        q, k, v, lens, scale=0.25, block_k=16, interpret=not ON_TPU))
    ro, rm, rl = (np.asarray(t) for t in decode_attention_ref(
        q, k, v, lens, scale=0.25))
    tol = 1e-5 if not ON_TPU else 5e-2
    np.testing.assert_allclose(o, ro, rtol=tol, atol=tol)
    np.testing.assert_allclose(l, rl, rtol=tol, atol=tol)


def test_decode_attention_bf16_query():
    N, KV, G, D, L = 2, 2, 2, 32, 64
    q = jnp.asarray(RNG.standard_normal((N, KV, G, D)), jnp.bfloat16)
    k = jnp.asarray(RNG.standard_normal((N, KV, L, D)), jnp.bfloat16)
    v = jnp.asarray(RNG.standard_normal((N, KV, L, D)), jnp.bfloat16)
    lens = np.asarray([7, 64], np.int32)
    o, m, l = (np.asarray(t) for t in decode_attention(
        q, k, v, lens, scale=0.2, block_k=32, interpret=not ON_TPU))
    ro, rm, rl = (np.asarray(t) for t in decode_attention_ref(
        q, k, v, lens, scale=0.2))
    np.testing.assert_allclose(o, ro, rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(l, rl, rtol=5e-2, atol=5e-2)


def test_decode_attention_max_len_bound():
    """A static max_len bound (the serving rung) truncates the grid:
    results equal the unbounded kernel for rows whose length fits."""
    N, KV, G, D, L = 3, 2, 2, 16, 128
    q = jnp.asarray(RNG.standard_normal((N, KV, G, D)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((N, KV, L, D)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((N, KV, L, D)), jnp.float32)
    lens = np.asarray([5, 30, 32], np.int32)    # all <= 32
    a = [np.asarray(t) for t in decode_attention(
        q, k, v, lens, scale=0.25, block_k=16, max_len=32,
        interpret=not ON_TPU)]
    b = [np.asarray(t) for t in decode_attention(
        q, k, v, lens, scale=0.25, block_k=16, interpret=not ON_TPU)]
    for x, y in zip(a, b):
        tol = 1e-6 if not ON_TPU else 5e-2
        np.testing.assert_allclose(x, y, rtol=tol, atol=tol)


# ---- fused C3 block (round-5 cross-conv VMEM fusion) -----------------------

C3_CASES = [
    # (n, h, w, c, hid, oc, n_btl)
    (2, 32, 24, 16, 8, 16, 2),      # small, unaligned W
    (1, 16, 16, 128, 64, 128, 3),   # yolov5l C3_1 channel geometry
    (1, 20, 20, 64, 32, 48, 1),     # single bottleneck, oc != c
]


@pytest.mark.parametrize("n,h,w,c,hid,oc,t", C3_CASES)
@pytest.mark.parametrize("activation", ["silu", None])
def test_c3_block_matches_reference(n, h, w, c, hid, oc, t, activation):
    """Whole-C3 fused kernel vs the lax conv-chain oracle (cv1 ->
    bottlenecks with residuals -> cat(cv2) -> cv3, zoo/builders.py c3
    structure). The cat never materializes in the kernel (split cv3
    weight), so this also pins the weight-half convention."""
    from simpleinfer_tpu.kernels.c3block import (c3_block,
                                                 c3_block_reference)

    def r(*s):
        return RNG.standard_normal(s).astype(np.float32) * 0.2

    ws = (r(c, hid), r(hid), r(c, hid), r(hid), r(hid, oc), r(hid, oc),
          r(oc), r(t, hid, hid), r(t, hid), r(t, 9, hid, hid), r(t, hid))
    x = jnp.asarray(r(n, h, w, c))
    if ON_TPU:
        x = x.astype(jnp.bfloat16)
    got = run_kernel(c3_block, x, *map(jnp.asarray, ws),
                     activation=activation)
    want = np.asarray(c3_block_reference(x, *ws, activation=activation),
                      np.float32)
    tol = 5e-5 if not ON_TPU else 0.05
    np.testing.assert_allclose(got.astype(np.float32), want,
                               atol=tol * np.sqrt(c + 9 * hid), rtol=0.02)


def test_c3_supported_gate():
    """Eligibility: hid >= 64 (MXU occupancy floor — the stem-kernel
    lesson), channel alignment, VMEM fit at yolov5l shapes."""
    from simpleinfer_tpu.kernels.c3block import c3_supported

    assert c3_supported(160, 160, 128, 64, 128)    # yolov5l C3_1
    assert c3_supported(80, 80, 256, 128, 256)     # yolov5l C3_2
    assert not c3_supported(160, 160, 64, 32, 64)  # yolov5s C3_1: narrow
    assert not c3_supported(320, 320, 128, 64, 128)  # 320^2: VMEM


@pytest.mark.parametrize("n,h,w,c,hid,oc,t", [(2, 16, 16, 128, 64, 128, 2)])
def test_c3_block_s8_taps_match_reference(n, h, w, c, hid, oc, t):
    """int8-static tap path: per-image dynamic s8 activations x
    per-channel s8 weights, int32-exact conv, f32 dequant — the kernel
    must match the lax oracle that mirrors the same quantization math
    near-exactly (both use round-half-even + the same scales)."""
    from simpleinfer_tpu.kernels.c3block import (c3_block,
                                                 c3_block_reference,
                                                 quantize_taps)

    def r(*s):
        return RNG.standard_normal(s).astype(np.float32) * 0.2

    ws = [r(c, hid), r(hid), r(c, hid), r(hid), r(hid, oc), r(hid, oc),
          r(oc), r(t, hid, hid), r(t, hid), r(t, 9, hid, hid),
          r(t, hid)]
    wq, wsc = quantize_taps(ws[9])
    args = [jnp.asarray(a) for a in ws]
    args[9] = jnp.asarray(wq)
    x = jnp.asarray(r(n, h, w, c))
    if ON_TPU:
        x = x.astype(jnp.bfloat16)
    got = run_kernel(c3_block, x, *args, btl_b_scale=jnp.asarray(wsc))
    want = np.asarray(c3_block_reference(x, *args,
                                         btl_b_scale=jnp.asarray(wsc)),
                      np.float32)
    tol = 5e-4 if not ON_TPU else 0.05
    np.testing.assert_allclose(got.astype(np.float32), want,
                               atol=tol * np.sqrt(c + 9 * hid), rtol=0.02)


def test_c3_block_banded_grid_matches_reference():
    """Multi-band grid (band_rows < H): clamped halo bands + discarded
    garbage margins reproduce the whole-image result exactly, including
    uneven band layouts and both shortcut forms."""
    from simpleinfer_tpu.kernels.c3block import (c3_block,
                                                 c3_block_reference)

    def r(*s):
        return RNG.standard_normal(s).astype(np.float32) * 0.2

    for (n, h, w, c, hid, oc, t, br, sc) in [
            (2, 32, 24, 16, 8, 16, 2, 8, True),     # 4 bands
            (1, 40, 20, 16, 8, 16, 3, 16, False)]:  # rh=10, 4 bands
        ws = (r(c, hid), r(hid), r(c, hid), r(hid), r(hid, oc),
              r(hid, oc), r(oc), r(t, hid, hid), r(t, hid),
              r(t, 9, hid, hid), r(t, hid))
        x = jnp.asarray(r(n, h, w, c))
        if ON_TPU:
            x = x.astype(jnp.bfloat16)
        got = run_kernel(c3_block, x, *map(jnp.asarray, ws),
                         shortcut=sc, band_rows=br)
        want = np.asarray(c3_block_reference(x, *ws, shortcut=sc),
                          np.float32)
        tol = 5e-4 if not ON_TPU else 0.05
        np.testing.assert_allclose(got.astype(np.float32), want,
                                   atol=tol * np.sqrt(c + 9 * hid),
                                   rtol=0.02)


# ---- int4 weight-only matmul (round-5 W4 serving dtype) --------------------

@pytest.mark.parametrize("m,k,n,g,gpb", [
    (8, 2048, 512, 256, 8),     # decode-like: tiny M, big K
    (8, 1024, 384, 128, 8),     # g128 default, gpb clamps to n_groups
    (3, 300, 130, 128, 4),      # unaligned everything (K pads to 384)
    (16, 512, 256, 256, 3),     # gpb not dividing n_groups (3 -> 2)
])
def test_matmul_int4w_matches_reference(m, k, n, g, gpb):
    """Group-wise nibble-packed W4 GEMM vs the dense-dequant oracle.
    bf16-compute tolerance (the kernel multiplies in bf16; the oracle
    in f32)."""
    from simpleinfer_tpu.kernels.matmul import (matmul_int4w,
                                                matmul_int4w_ref)
    from simpleinfer_tpu.quant.tensor import quantize_int4_grouped

    w = RNG.standard_normal((k, n)).astype(np.float32) * 0.1
    x = jnp.asarray(RNG.standard_normal((m, k)), np.float32)
    b = jnp.asarray(RNG.standard_normal(n), np.float32)
    q = quantize_int4_grouped(w, group=g)
    got = run_kernel(matmul_int4w, x, q, b, "silu",
                     groups_per_block=gpb)
    want = np.asarray(matmul_int4w_ref(x, q, b, "silu"))
    np.testing.assert_allclose(
        got.astype(np.float32), want.astype(np.float32),
        atol=3e-2 * np.sqrt(k) * 0.1, rtol=3e-2)


def test_quantize_int4_roundtrip_bound():
    """dequant(quantize_int4(w)) is within one group quantization step
    everywhere, including K-pad handling; packed payload is half the
    int8 bytes."""
    from simpleinfer_tpu.quant.tensor import quantize_int4_grouped

    w = RNG.standard_normal((300, 96)).astype(np.float32)
    q = quantize_int4_grouped(w, group=128)
    assert q.shape == (300, 96)
    assert q.packed.shape == (384 // 2, 96)      # K padded to 384
    wd = np.asarray(q.dequantize())
    step = np.abs(w.reshape(3 if False else -1)).max() / 7.0
    assert wd.shape == w.shape
    # per-group bound: |err| <= group_absmax/7 (<= global absmax/7)
    assert np.abs(wd - w).max() <= step + 1e-6
