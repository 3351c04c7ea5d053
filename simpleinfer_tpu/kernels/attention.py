"""Flash attention (online-softmax) Pallas kernel.

The transformer analog of the reference's register-blocked GEMM
(/root/reference/src/layer/simd/gemm.cpp:295-385) applied to the
attention hot path: instead of materializing the [Lq, Lk] score matrix
in HBM (what the naive jnp lowering in ops/attention.py does via XLA),
the kernel streams K/V blocks through VMEM and keeps a running
(max, sum, accumulator) per query block — softmax renormalization
happens on the VPU between the two MXU matmuls, so HBM traffic drops
from O(Lq*Lk) to O(L*D) and the working set stays in the ~16 MB VMEM.

Logits and the accumulator are f32 (the bf16 MXU product is exact
enough for QK^T; the running-exp arithmetic is not safe in bf16); P·V
runs in the input dtype so both matmuls hit the MXU native path.

Opt-in like the other Pallas kernels (EngineConfig.use_pallas): XLA's
fused unblocked attention wins at the short sequence lengths of the
zoo's ViT/BERT presets, and pallas_call is a fusion barrier — measure
per shape with profiling.measure_device_time before defaulting.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul import _round_up

_NEG_INF = float("-inf")


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  n_kv: int, scale: float, causal: bool, lq: int, lk: int,
                  block_q: int, block_k: int, out_dtype,
                  sliding_window: int | None = None,
                  n_kv_total: int | None = None):
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal: blocks strictly above the diagonal band contribute nothing
    q_start = qi * block_q
    if sliding_window is not None:
        # banded grid: kj counts LIVE key-blocks only, offset from the
        # first block the band can touch for this q block (the index
        # map loads the matching K/V block). The UNCLAMPED index
        # decides liveness — a clamped (out-of-range) load would alias
        # the last key block and double-count it.
        kj_abs = _band_first_block(qi, block_q, block_k,
                                   sliding_window) + kj
        k_start = kj_abs * block_k
        live = ((k_start <= q_start + block_q - 1)        # causal
                & (k_start + block_k - 1 > q_start - sliding_window))
    else:
        k_start = kj * block_k
        live = (k_start <= q_start + block_q - 1) if causal else True

    @pl.when(live)
    def _():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [BQ, BK]

        # mask: key padding always; the triangle only in causal blocks
        k_idx = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = k_idx < lk
        if causal:
            q_idx = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = mask & (k_idx <= q_idx)
            if sliding_window is not None:
                # ops/attention.py convention: keep keys ki > qi - sw
                # (the window INCLUDES self, sw positions total)
                mask = mask & (k_idx > q_idx - sliding_window)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_ref[:, :1]                              # [BQ, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # fully-masked rows keep m = -inf; exp(-inf - -inf) would be NaN
        safe_m = jnp.where(m_new == _NEG_INF, 0.0, m_new)
        alpha = jnp.exp(jnp.where(m_prev == _NEG_INF, _NEG_INF,
                                  m_prev - safe_m))        # [BQ, 1]
        p = jnp.exp(jnp.where(s == _NEG_INF, _NEG_INF, s - safe_m))
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(kj == n_kv - 1)
    def _():
        l = l_ref[:, :1]
        # padded / fully-masked query rows have l = 0: emit 0, not NaN
        o_ref[0] = jnp.where(
            l > 0, acc_ref[:] / jnp.where(l > 0, l, 1.0), 0.0
        ).astype(out_dtype)


def _band_first_block(qi, block_q: int, block_k: int, sw: int):
    """Index of the FIRST key block the band can touch for query block
    qi: floor(max(q_start - sw + 1, 0) / block_k). Shared by the kernel
    (liveness) and the BlockSpec index maps (loads) so they can never
    disagree."""
    return jnp.maximum(qi * block_q - (sw - 1), 0) // block_k


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k",
                     "sliding_window", "interpret"))
def _flash_impl(q, k, v, *, causal, scale, block_q, block_k,
                sliding_window, interpret):
    bh, lq, d = q.shape
    lk = k.shape[1]
    bq = min(block_q, _round_up(lq, 8))
    bk = min(block_k, _round_up(lk, 128))
    lqp, lkp, dp = _round_up(lq, bq), _round_up(lk, bk), _round_up(d, 128)
    if (lqp, dp) != (lq, d):
        q = jnp.pad(q, ((0, 0), (0, lqp - lq), (0, dp - d)))
    if (lkp, dp) != (lk, d):
        k = jnp.pad(k, ((0, 0), (0, lkp - lk), (0, dp - d)))
        v = jnp.pad(v, ((0, 0), (0, lkp - lk), (0, dp - d)))

    n_kv_total = lkp // bk
    sw = sliding_window
    if sw is not None:
        # the band touches at most this many key blocks per query block
        # — the kv grid dim becomes CONSTANT in L, so banded prefill is
        # O(L*W) in both MXU flops and HBM K/V reads (dead blocks are
        # never even copied in). This is also why the kernel beats the
        # XLA banded path, which still materializes all L^2 scores.
        n_kv = min(n_kv_total, (bq + sw - 2) // bk + 2)
        kspec = pl.BlockSpec(
            (1, bk, dp),
            lambda b, i, j: (b, jnp.minimum(
                _band_first_block(i, bq, bk, sw) + j, n_kv_total - 1), 0))
    else:
        n_kv = n_kv_total
        kspec = pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0))
    grid = (bh, lqp // bq, n_kv)
    kernel = functools.partial(
        _flash_kernel, n_kv=n_kv, scale=scale, causal=causal, lq=lq,
        lk=lk, block_q=bq, block_k=bk, out_dtype=q.dtype,
        sliding_window=sw, n_kv_total=n_kv_total)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0)),
            kspec,
            kspec,
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lqp, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # running max
            pltpu.VMEM((bq, 128), jnp.float32),   # running sum
            pltpu.VMEM((bq, dp), jnp.float32),    # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lqp * n_kv * bk * dp,
            bytes_accessed=(bh * (lqp + 2 * lqp * n_kv * bk // bq) * dp
                            * q.dtype.itemsize
                            + bh * lqp * dp * q.dtype.itemsize),
            transcendentals=bh * lqp * n_kv * bk),
        interpret=interpret,
    )(q, k, v)
    if (lqp, dp) != (lq, d):
        out = out[:, :lq, :d]
    return out


def flash_profitable(lq: int, lk: int, causal: bool = True) -> bool:
    """Sequence-length dispatch gate for the flash kernel.

    Measured (docs/PERF.md): at ViT's L=197 d=64 the flash kernel LOSES
    2x e2e to XLA's fused sdpa. The original causal sweep
    (scripts/flash_seq_sweep.py, 2026-08-19, bh=16 d=128 bf16, 128x128
    blocks) put the crossover at 4096; the round-5 re-sweep at the
    256x256 blocks the banded kernel's block sweep won with moved it
    DOWN to 2048: vs XLA's fused sdpa the kernel is 0.28x at L=1024,
    0.86x at 1536, then 1.16x at 2048, 2.44x at 3072, 2.35x at 4096
    (XLA spills the scores tensor past ~2k and collapses to ~8.6
    TFLOP/s while the kernel holds ~20). NON-causal attention crosses
    LATER (0.87x at 2048, 1.62x at 4096 — same-day measurement; XLA's
    non-causal sdpa wastes no half-matrix work), so it keeps the 4096
    threshold. Defaults: causal Lk >= 2048, non-causal Lk >= 4096,
    Lq >= 256 (decode's Lq = 1 always stays on XLA); override with
    SI_FLASH_MIN_LK / SI_FLASH_MIN_LK_NC / SI_FLASH_MIN_LQ for
    per-chip retuning (read at call time — trace time only — so a
    long-lived process can retune).
    """
    if causal:
        min_lk = int(os.environ.get("SI_FLASH_MIN_LK", "2048"))
    else:
        min_lk = int(os.environ.get("SI_FLASH_MIN_LK_NC", "4096"))
    min_lq = int(os.environ.get("SI_FLASH_MIN_LQ", "256"))
    return lk >= min_lk and lq >= min_lq


def flash_band_profitable(lq: int, lk: int,
                          sliding_window: int | None) -> bool:
    """Dispatch gate for the BANDED kernel — a different (much earlier)
    crossover than the full-causal gate, because the XLA fallback still
    materializes all L^2 scores while the kernel reads O(L*W).

    Measured interleaved (scripts/flash_band_sweep.py, 2026-08-20,
    bh=16 d=128 bf16, iters=64): vs the XLA banded sdpa the kernel is
    0.24x at L=1024/sw256 (XLA still fully fuses there — 0.065 ms),
    then wins from 1536 up: 1.17x at 1536/sw256, 1.57x at 2048/sw256,
    1.09x at 2048/sw512, 7.7x at 4096/sw256, 3.0x at 4096/sw1024, and
    201x at 8192/sw256 (XLA spills the 8192^2 scores: 450 ms vs
    2.2 ms — XLA's cost is O(L^2) regardless of the band; the
    kernel's is O(L*W)).
    Gate: Lk >= 1536, band at most Lk/4 (wider bands converge to the
    full-causal case, whose crossover is 4096), Lq >= 256 (decode and
    narrow chunk-verify stay on XLA). Env-tunable like the full gate.
    """
    if sliding_window is None:
        return False
    min_lk = int(os.environ.get("SI_FLASH_BAND_MIN_LK", "1536"))
    min_lq = int(os.environ.get("SI_FLASH_BAND_MIN_LQ", "256"))
    return (lk >= min_lk and lq >= min_lq
            and sliding_window * 4 <= lk)


def flash_attention(q, k, v, *, causal: bool = False,
                    scale: float | None = None, block_q: int = 256,
                    block_k: int = 256,
                    sliding_window: int | None = None,
                    interpret: bool = False):
    """Online-softmax attention over [B, H, L, D] (or [BH, L, D]) inputs.

    Causal masking requires Lq == Lk (query i attends keys <= i — the
    torch is_causal convention, which for Lq != Lk would be ambiguous
    between top-left and bottom-right alignment; _sdpa in
    ops/attention.py aligns bottom-right, so dispatch between the two
    must never cross a causal Lq != Lk shape).

    sliding_window=W bands the causal mask to the last W positions
    (key j live for query i iff i-W < j <= i — the ops/attention.py
    RotaryAttention convention, window includes self). Key blocks
    fully outside the band are neither read from HBM nor computed, so
    banded prefill costs O(L*W) instead of O(L^2) — the long-context
    win the mistral/gemma-2 families need.
    """
    if causal and q.shape[-2] != k.shape[-2]:
        raise ValueError(
            f"flash_attention causal requires Lq == Lk, got "
            f"{q.shape[-2]} != {k.shape[-2]} (alignment convention "
            f"would silently diverge from ops.attention._sdpa)")
    if sliding_window is not None:
        if not causal:
            raise ValueError("sliding_window requires causal=True")
        if sliding_window < 1:
            raise ValueError(
                f"sliding_window must be >= 1, got {sliding_window}")
        if sliding_window >= k.shape[-2]:
            sliding_window = None      # band wider than L = plain causal
    rank4 = q.ndim == 4
    if rank4:
        b, h, lq, d = q.shape
        q, k, v = (t.reshape(b * h, t.shape[2], d) for t in (q, k, v))
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    out = _flash_impl(q, k, v, causal=causal, scale=float(scale),
                      block_q=block_q, block_k=block_k,
                      sliding_window=sliding_window,
                      interpret=interpret)
    if rank4:
        out = out.reshape(b, h, out.shape[1], out.shape[2])
    return out


def flash_attention_ref(q, k, v, *, causal: bool = False,
                        scale: float | None = None,
                        sliding_window: int | None = None):
    """Unblocked jnp oracle (the GemmPack4F32Ref discipline: same math,
    simplest possible form) — used by tests and as the XLA baseline in
    perf A/Bs."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("...qd,...kd->...qk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        lq, lk = s.shape[-2], s.shape[-1]
        keep = jnp.tril(jnp.ones((lq, lk), jnp.bool_), k=lk - lq)
        if sliding_window is not None:
            keep &= jnp.triu(jnp.ones((lq, lk), jnp.bool_),
                             k=lk - lq - sliding_window + 1)
        s = jnp.where(keep, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", p.astype(q.dtype), v)
