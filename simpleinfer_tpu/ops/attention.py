"""Transformer op lowerings: MultiheadAttention, SDPA, matmul, Embedding.

Superset of the reference (zpye/SimpleInfer ships 15 CNN layers,
/root/reference/src/layer_registry.cpp:34-48 — no attention ops); these
follow the same registry/OpImpl discipline (ops/registry.py) and the
pnnx type-string + param/attr layout that pnnx emits for transformer
modules, so real ViT/BERT-style pnnx exports load unmodified.

TPU mapping: every projection and the two attention einsums land on the
MXU; softmax runs in f32 for numerical stability (bf16 logits lose mass
at long sequence lengths) and XLA fuses the scale+mask+softmax chain
into the surrounding matmuls' epilogues. Rank-3 [N, L, E] tensors are
logical == physical (the NHWC convention applies to rank 4 only,
ops/shape.py).
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..ir.graph import PARAM_BOOL, PARAM_FLOAT, PARAM_INT
from .extra import _to_logical, _to_physical
from .registry import OpImpl, register_op, require_attr, require_param


# ------------------------------------------------------------- matmul/bmm
def _batched_matmul(a, b):
    precision = (lax.Precision.HIGHEST if a.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    return jnp.matmul(a, b, precision=precision)


for _t in ("torch.matmul", "torch.bmm"):
    @register_op(_t)
    def lower_matmul(op, cfg, _t=_t):
        def apply(weights, a, b):
            return _to_physical(_batched_matmul(_to_logical(a),
                                                _to_logical(b)))

        return OpImpl(name=op.name, type=op.type, apply=apply)


@register_op("torch.select")
def lower_select(op, cfg):
    dim = require_param(op, "dim", PARAM_INT).i
    index = require_param(op, "index", PARAM_INT).i

    def apply(weights, x):
        y = _to_logical(x)
        d = dim + y.ndim if dim < 0 else dim
        return _to_physical(lax.index_in_dim(y, index, axis=d,
                                             keepdims=False))

    return OpImpl(name=op.name, type=op.type, apply=apply)


# ------------------------------------------------------------- embedding
@register_op("nn.Embedding")
def lower_embedding(op, cfg):
    num_embeddings = require_param(op, "num_embeddings", PARAM_INT).i
    embedding_dim = require_param(op, "embedding_dim", PARAM_INT).i
    w = require_attr(op, "weight").array()
    if list(w.shape) != [num_embeddings, embedding_dim]:
        raise ValueError(f"Embedding {op.name}: weight shape {w.shape} "
                         f"does not match params")
    weights = {"weight": w.astype(np.float32)}

    def apply(weights, idx):
        # engine inputs may arrive as float arrays; gather wants ints
        idx = idx.astype(jnp.int32)
        return jnp.take(weights["weight"], idx, axis=0)

    return OpImpl(name=op.name, type=op.type, apply=apply, weights=weights,
                  shard_hints={"weight": (None, "model")})


# --------------------------------------------------------------- core SDPA
def _sdpa(q, k, v, mask=None, is_causal=False, scale=None,
          mask_mode="sdpa"):
    """Scaled dot-product attention on [..., L, d] tensors.

    Logits accumulate and softmax runs in f32; the PV matmul runs in the
    input dtype (bf16 on TPU) so both einsums stay on the MXU.
    mask_mode: "sdpa" = bool True MEANS attend (F.scaled_dot_product_
    attention semantics); "mha" = bool True means MASK OUT
    (nn.MultiheadAttention.attn_mask semantics).
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            keep = mask if mask_mode == "sdpa" else ~mask
            logits = jnp.where(keep, logits, neg)
        else:
            logits = logits + mask.astype(jnp.float32)
    if is_causal:
        Lq, Lk = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((Lq, Lk), jnp.bool_), k=Lk - Lq)
        logits = jnp.where(causal, logits, neg)
    p = _softmax_f32(logits).astype(q.dtype)
    return jnp.einsum("...qk,...kd->...qd", p, v)


def _softmax_f32(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - lax.stop_gradient(m))
    return e / jnp.sum(e, axis=-1, keepdims=True)


@register_op("F.scaled_dot_product_attention")
def lower_sdpa(op, cfg):
    is_causal = (op.params["is_causal"].b
                 if op.has_param("is_causal", PARAM_BOOL) else False)
    scale = (op.params["scale"].f
             if op.has_param("scale", PARAM_FLOAT) else None)

    # AUTO past the measured crossover since the round-5 256x256-block
    # re-sweep (flash_profitable: 1.16x at L=2048, 2.44x at 3072 vs
    # XLA's fused sdpa, which spills its scores tensor there) — the
    # old use_pallas opt-in predates the crossover moving to 2048.
    # Mesh engines stay on XLA (pallas can't be GSPMD-partitioned).
    allow_pallas = getattr(cfg, "mesh", None) is None

    def apply(weights, *inputs):
        # [N, h, L, d] inputs are rank 4, hence physically NHWC-permuted
        q, k, v = (_to_logical(t) for t in inputs[:3])
        mask = _to_logical(inputs[3]) if len(inputs) > 3 else None
        # causal Lq != Lk stays on XLA: the flash kernel aligns causal
        # masks top-left while _sdpa aligns bottom-right (torch sdpa),
        # so the gate must only ever change speed, never semantics
        if (mask is None and allow_pallas
                and (not is_causal or q.shape[-2] == k.shape[-2])):
            # auto dispatch must DEGRADE to XLA if the pallas modules
            # fail to import (jax version skew) — a speed path can
            # never be the reason an engine fails to trace
            try:
                from ..kernels.attention import (flash_attention,
                                                 flash_profitable)
                from ..kernels.matmul import pallas_supported
            except ImportError:
                pass
            else:
                if (pallas_supported()
                        and flash_profitable(q.shape[-2], k.shape[-2],
                                             causal=is_causal)):
                    return _to_physical(flash_attention(
                        q, k, v, causal=is_causal, scale=scale))
        return _to_physical(_sdpa(q, k, v, mask=mask, is_causal=is_causal,
                                  scale=scale, mask_mode="sdpa"))

    return OpImpl(name=op.name, type=op.type, apply=apply)


# ----------------------------------------------------- MultiheadAttention
def _split_heads(x, num_heads):
    n, l, e = x.shape
    return jnp.transpose(x.reshape(n, l, num_heads, e // num_heads),
                         (0, 2, 1, 3))


def _merge_heads(x):
    n, h, l, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(n, l, h * d)


def _pallas_ok() -> bool:
    from ..kernels.matmul import pallas_supported

    return pallas_supported()


def ring_out_proj(cfg, num_heads: int):
    """Explicit-TP output projection (EngineConfig.tp_mode='ring').

    Returns a fn routing `ctx @ wo (+ bo)` through the hand-scheduled
    shard_map collective-matmul ring (parallel/tp.tp_linear_row) instead
    of leaving the reduce to GSPMD — this is the engine wiring that
    makes the SURVEY §2.5 comm-overlap component reachable from a real
    model. Returns None when the config doesn't select ring TP or the
    head count does not divide the model axis (shard_map needs even
    shards; GSPMD handles the ragged case)."""
    mesh_cfg = getattr(cfg, "mesh", None)
    if (getattr(cfg, "tp_mode", "gspmd") != "ring" or mesh_cfg is None
            or mesh_cfg.model <= 1 or num_heads % mesh_cfg.model):
        return None

    def project(ctx, w, b, dt):
        from ..parallel.mesh import AXIS_MODEL
        from ..parallel.tp import tp_linear_row
        from ..quant.tensor import resolve_weight

        return tp_linear_row(ctx, resolve_weight(w, dt), b,
                             mesh=_shared_mesh(mesh_cfg),
                             axis=AXIS_MODEL).astype(dt)

    return project


_MESH_CACHE: dict = {}


def _shared_mesh(mesh_cfg):
    """One Mesh per MeshConfig shape, shared by every lowered attention
    op (a depth-D model would otherwise build/carry D identical
    meshes); same devices/order as the engine's own build_mesh — the
    CachedDecoder path reuses engine._mesh directly."""
    key = (mesh_cfg.data, mesh_cfg.spatial, mesh_cfg.model)
    mesh = _MESH_CACHE.get(key)
    if mesh is None:
        from ..parallel.mesh import build_mesh

        mesh = _MESH_CACHE[key] = build_mesh(mesh_cfg)
    return mesh


@register_op("nn.MultiheadAttention")
def lower_multihead_attention(op, cfg):
    """nn.MultiheadAttention, pnnx module capture.

    pnnx param/attr layout: params num_heads, embed_dim, batch_first,
    kdim/vdim (when separate), add_zero_attn; attrs in_proj_weight
    [3E, E] + in_proj_bias [3E] (packed, same-dim case) or
    q/k/v_proj_weight, plus out_proj.weight [E, E] / out_proj.bias [E].
    Inputs: 1 (self-attention, q=k=v), 2 (q, kv), or 3 (q, k, v); an
    extra trailing input is attn_mask. Outputs: attn_output
    [+ head-averaged attn_weights when the graph declares 2 outputs,
    torch's average_attn_weights=True default].
    """
    embed_dim = require_param(op, "embed_dim", PARAM_INT).i
    num_heads = require_param(op, "num_heads", PARAM_INT).i
    batch_first = (op.params["batch_first"].b
                   if op.has_param("batch_first", PARAM_BOOL) else False)
    if embed_dim % num_heads:
        raise ValueError(f"MultiheadAttention {op.name}: embed_dim "
                         f"{embed_dim} not divisible by {num_heads} heads")
    kdim = op.params["kdim"].i if op.has_param("kdim", PARAM_INT) else embed_dim
    vdim = op.params["vdim"].i if op.has_param("vdim", PARAM_INT) else embed_dim
    # AUTO past the measured crossover (round-5 re-sweep at 256x256
    # blocks moved it to Lk=2048; flash_profitable gates the short
    # sequences where flash measured a 2x loss); mesh engines stay on
    # XLA — pallas can't be GSPMD-partitioned
    allow_pallas = cfg.mesh is None
    ring_proj = ring_out_proj(cfg, num_heads)

    weights: dict[str, np.ndarray] = {}
    if op.has_attr("in_proj_weight"):
        w = require_attr(op, "in_proj_weight").array()
        if list(w.shape) != [3 * embed_dim, embed_dim]:
            raise ValueError(f"MultiheadAttention {op.name}: in_proj_weight "
                             f"shape {w.shape}")
        wq, wk, wv = np.split(w, 3, axis=0)
    else:
        wq = require_attr(op, "q_proj_weight").array()
        wk = require_attr(op, "k_proj_weight").array()
        wv = require_attr(op, "v_proj_weight").array()
    # [out, in] -> [in, out], the linear-layer streaming order
    weights["wq"] = np.ascontiguousarray(wq.T).astype(np.float32)
    weights["wk"] = np.ascontiguousarray(wk.T).astype(np.float32)
    weights["wv"] = np.ascontiguousarray(wv.T).astype(np.float32)
    if op.has_attr("in_proj_bias"):
        b = require_attr(op, "in_proj_bias").array().astype(np.float32)
        weights["bq"], weights["bk"], weights["bv"] = np.split(b, 3)
    wo = require_attr(op, "out_proj.weight").array()
    weights["wo"] = np.ascontiguousarray(wo.T).astype(np.float32)
    if op.has_attr("out_proj.bias"):
        weights["bo"] = require_attr(op, "out_proj.bias").array().astype(
            np.float32)

    n_declared = max(1, len(op.outputs))
    # q [+2 kv proj] [+out proj] matmuls + 2 attention matmuls, per token
    Lq = None
    if op.inputs and len(op.inputs[0].shape) >= 2:
        s = op.inputs[0].shape
        Lq = s[1] if batch_first else s[0]
    flops = 0
    if Lq and Lq > 0:
        proj = 2 * embed_dim * (embed_dim + kdim + vdim + embed_dim)
        attn = 2 * 2 * Lq * embed_dim
        flops = Lq * (proj + attn)

    def apply(weights, *inputs):
        from ..quant.tensor import proj_nlo

        xs = list(inputs)
        mask = None
        if len(xs) == 4:
            mask = xs.pop()
        elif len(xs) in (2, 3):
            # a trailing operand whose last dim is not the expected k/v
            # feature dim (or that is rank 2) is attn_mask
            expect = kdim if len(xs) == 2 else vdim
            if xs[-1].ndim == 2 or xs[-1].shape[-1] != expect:
                mask = xs.pop()
        q = xs[0]
        k = xs[1] if len(xs) > 1 else q
        v = xs[2] if len(xs) > 2 else k
        if not batch_first:  # [L, N, E] -> [N, L, E]
            q, k, v = (jnp.transpose(t, (1, 0, 2)) for t in (q, k, v))
        dt = q.dtype

        def proj(x, wkey, bkey):
            y = proj_nlo(x, weights[wkey], dt)
            if bkey in weights:
                y = y + weights[bkey]
            return y.astype(dt)

        qh = _split_heads(proj(q, "wq", "bq"), num_heads)
        kh = _split_heads(proj(k, "wk", "bk"), num_heads)
        vh = _split_heads(proj(v, "wv", "bv"), num_heads)
        # auto dispatch must DEGRADE to XLA if the pallas modules fail
        # to import (jax version skew) — a speed path can never be the
        # reason an engine fails to trace
        flash = False
        if mask is None and n_declared == 1 and allow_pallas:
            try:
                from ..kernels.attention import flash_profitable

                flash = (flash_profitable(qh.shape[-2], kh.shape[-2],
                                          causal=False)
                         and _pallas_ok())
            except ImportError:
                flash = False
        if flash:
            # opt-in flash path: O(L*d) HBM traffic instead of O(L^2);
            # flash_profitable gates out the short sequences where the
            # kernel measured a 2x e2e LOSS vs XLA (docs/PERF.md)
            from ..kernels.attention import flash_attention

            ctx = _merge_heads(flash_attention(
                qh, kh, vh, scale=1.0 / math.sqrt(embed_dim // num_heads)))
            if ring_proj is not None:
                out = ring_proj(ctx, weights["wo"], weights.get("bo"), dt)
            else:
                out = proj_nlo(ctx, weights["wo"], dt)
                if "bo" in weights:
                    out = out + weights["bo"]
                out = out.astype(dt)
            return out if batch_first else jnp.transpose(out, (1, 0, 2))
        if mask is not None and mask.ndim == 3:
            # [N*h, Lq, Lk] -> [N, h, Lq, Lk]
            mask = mask.reshape(qh.shape[0], num_heads, *mask.shape[-2:])
        d = embed_dim // num_heads
        scale = 1.0 / math.sqrt(d)
        logits = jnp.einsum("nhqd,nhkd->nhqk", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            neg = jnp.float32(jnp.finfo(jnp.float32).min)
            if mask.dtype == jnp.bool_:
                logits = jnp.where(mask, neg, logits)  # True = mask out
            else:
                logits = logits + mask.astype(jnp.float32)
        p32 = _softmax_f32(logits)
        ctx = _merge_heads(jnp.einsum("nhqk,nhkd->nhqd",
                                      p32.astype(dt), vh))
        if ring_proj is not None:
            out = ring_proj(ctx, weights["wo"], weights.get("bo"), dt)
        else:
            out = proj_nlo(ctx, weights["wo"], dt)
            if "bo" in weights:
                out = out + weights["bo"]
            out = out.astype(dt)
        if not batch_first:
            out = jnp.transpose(out, (1, 0, 2))
        if n_declared == 1:
            return out
        # torch default: weights averaged over heads, [N, Lq, Lk]
        return out, jnp.mean(p32, axis=1).astype(dt)

    return OpImpl(
        name=op.name, type=op.type, apply=apply, weights=weights,
        n_outputs=n_declared,
        quantizable={"wq": 1, "wk": 1, "wv": 1, "wo": 1},
        shard_hints={"wq": (None, "model"), "wk": (None, "model"),
                     "wv": (None, "model"), "wo": ("model", None),
                     "bq": ("model",), "bk": ("model",),
                     "bv": ("model",)},
        flops_per_item=flops,
        decode_info={"embed_dim": embed_dim, "num_heads": num_heads,
                     "batch_first": batch_first, "kdim": kdim,
                     "vdim": vdim},
    )


# ------------------------------------------------------- rotary attention
def rope_cos_sin(positions, dim, theta):
    """HF-convention RoPE tables: positions [...] int -> (cos, sin)
    [..., dim] f32, frequencies duplicated across the two halves."""
    half = dim // 2
    inv = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32)
                           / float(half)))
    freqs = positions.astype(jnp.float32)[..., None] * inv
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x, cos, sin, interleaved: bool = False):
    """Rotate the last dim of x [..., D] by (cos, sin) broadcastable to
    [..., R] (HF rotate_half convention: [x1, x2] -> [-x2, x1]).

    R < D is PARTIAL rotary (phi/GPT-NeoX/stablelm lineage,
    HF partial_rotary_factor / rotary_pct): only dims [:R] rotate, the
    pass-through dims [R:] carry no positional signal — shape-driven,
    so every call site (forward, prefill, decode step, chunk verify)
    supports it by just building R-sized tables.

    interleaved=True is the GPT-J/CodeGen rotate_every_two convention:
    frequency f rotates the ADJACENT pair (x[2f], x[2f+1]) rather than
    the half-split pair (x[f], x[f+half]). Tables stay the
    rope_cos_sin duplicated-halves layout — the first half holds the
    per-frequency values, read off directly (same mathematical
    rotation, different lane wiring, so the two conventions' caches
    are not interchangeable)."""
    d = x.shape[-1]
    r = cos.shape[-1]
    xr = x[..., :r] if r != d else x
    half = r // 2
    dt = x.dtype
    if interleaved:
        ch, sh = cos[..., :half, None], sin[..., :half, None]
        xp = xr.astype(jnp.float32).reshape(*xr.shape[:-1], half, 2)
        x0, x1 = xp[..., 0:1], xp[..., 1:2]
        out = jnp.concatenate([x0 * ch - x1 * sh,
                               x0 * sh + x1 * ch], axis=-1)
        out = out.reshape(*xr.shape).astype(dt)
    else:
        x1, x2 = xr[..., :half], xr[..., half:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        out = (xr.astype(jnp.float32) * cos
               + rot.astype(jnp.float32) * sin).astype(dt)
    if r != d:
        out = jnp.concatenate([out, x[..., r:]], axis=-1)
    return out


def apply_qk_norm(qh, kh, w, eps: float = 1e-6):
    """Per-head RMSNorm on q/k heads BEFORE RoPE (qwen3 lineage:
    Qwen3Attention applies q_norm/k_norm over head_dim). No-op when the
    op carries no norm weights — every q/k projection site (engine
    forward, prefill, decode step, chunk verify) calls this so the
    families stay in one code path. Norm weights are f32 [D]."""
    wq, wk = w.get("wqn"), w.get("wkn")
    if wq is None and wk is None:
        return qh, kh

    def rms(x, wgt):
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * lax.rsqrt(var + eps) * wgt).astype(x.dtype)

    return ((rms(qh, wq) if wq is not None else qh),
            (rms(kh, wk) if wk is not None else kh))


def repeat_kv(x, group):
    """GQA: [N, Hkv, L, D] -> [N, Hkv*group, L, D] (each kv head serves
    `group` query heads)."""
    if group == 1:
        return x
    return jnp.repeat(x, group, axis=1)


def alibi_slopes(num_heads: int) -> np.ndarray:
    """Train-free ALiBi head slopes (Press et al.), [H] float32: the
    geometric ladder 2^(-8i/n) for the largest power-of-two n <= H,
    plus (for non-power-of-two H) every other step of the 2n ladder —
    the same closed form transformers' build_alibi_tensor uses, so
    converted BLOOM/MPT checkpoints bias identically.

    The bias added to attention logits is slopes[h] * key_position:
    per query row that differs from the paper's -slopes[h] * (q - k)
    by the constant slopes[h] * q, which softmax's row-wise shift
    invariance cancels exactly — using absolute key positions makes
    every KV-cache decode path's bias independent of the query
    position, so cached keys never need re-biasing (the same argument
    that lets rotated keys be cached under RoPE)."""
    n = 1 << (num_heads.bit_length() - 1)   # largest power of 2 <= H

    def ladder(n):
        start = 2.0 ** (-8.0 / n)
        return [start ** (i + 1) for i in range(n)]

    slopes = ladder(n)
    if n < num_heads:
        slopes += ladder(2 * n)[0::2][:num_heads - n]
    return np.asarray(slopes, np.float32)


def resolve_alibi_slopes(info) -> np.ndarray:
    """[H] f32 effective slopes for an ALiBi op: the op's explicit
    alibi_slopes attr when present (MPT interpolates non-power-of-two
    head counts differently from BLOOM — ship the exact trained
    values rather than guessing the formula), else the closed form;
    times alibi_scale (falcon-rw's shared 1/sqrt(d)). Single source
    for the op lowering and every KV-cache decode path."""
    sl = info.get("alibi_slopes")
    s = (np.asarray(sl, np.float32) if sl is not None
         else alibi_slopes(info["num_heads"]))
    return s * np.float32(info.get("alibi_scale") or 1.0)


@register_op("si.RotaryAttention")
def lower_rotary_attention(op, cfg):
    """Llama-style decoder self-attention as ONE composite op: q/k/v/o
    projections, rotary position embedding (RoPE, HF rotate_half
    convention), grouped-query attention (num_kv_heads <= num_heads),
    and an INTRINSIC causal mask.

    Composite-op precedent: the reference folds the whole YOLOv5 head
    into one `models.yolo.Detect` layer (/root/reference/src/layer/
    yolo_detect.cpp:31-155) rather than exploding it into primitives;
    this op plays that role for llama-family attention, and gives the
    KV-cache decoder (zoo/generate.CachedDecoder) a single node whose
    decode_info carries the head geometry.

    Params: embed_dim, num_heads, num_kv_heads (default = num_heads),
    rope_theta (default 1e4), bias (default False, qwen2-style q/k/v
    biases when True), alibi (default 0: BLOOM/MPT-family positions —
    RoPE replaced by a per-head slopes[h] * key_position logit bias).
    Attrs: {q,k,v,o}_proj.weight ([out, in], llama checkpoint layout)
    + optional {q,k,v,o}_proj.bias.
    Input x [N, L, E] batch-first; output [N, L, E].
    """
    embed_dim = require_param(op, "embed_dim", PARAM_INT).i
    num_heads = require_param(op, "num_heads", PARAM_INT).i
    num_kv = (op.params["num_kv_heads"].i
              if op.has_param("num_kv_heads", PARAM_INT) else num_heads)
    theta = (op.params["rope_theta"].f
             if op.has_param("rope_theta", PARAM_FLOAT) else 10000.0)
    # mistral-family sliding-window attention: each position attends
    # only the last `sliding_window` positions (banded causal mask)
    sw = (op.params["sliding_window"].i
          if op.has_param("sliding_window", PARAM_INT) else None)
    if sw is not None and sw < 1:
        raise ValueError(f"RotaryAttention {op.name}: sliding_window "
                         f"must be >= 1, got {sw}")
    # BLOOM/MPT-family ALiBi positions: NO rotary embedding; instead a
    # per-head linear bias slopes[h] * key_position on the attention
    # logits (see alibi_slopes for why absolute key position suffices)
    alibi = bool(op.params["alibi"].i
                 if op.has_param("alibi", PARAM_INT) else 0)
    if alibi and sw is not None:
        raise ValueError(f"RotaryAttention {op.name}: alibi and "
                         f"sliding_window are mutually exclusive (no "
                         f"model family combines them)")
    # bias convention knob: BLOOM adds the slopes bias AFTER the
    # 1/sqrt(d) score scaling (alibi_scale=1, default); falcon-rw
    # scales (scores + alibi) TOGETHER, i.e. the bias carries an
    # extra 1/sqrt(d) (original RW training code; transformers folds
    # alibi/sqrt(d) into the causal mask — note its eager falcon path
    # then adds alibi AGAIN, a double-count its own sdpa path doesn't
    # have; we match the scaled-once semantics = sdpa)
    alibi_scale = (op.params["alibi_scale"].f
                   if op.has_param("alibi_scale", PARAM_FLOAT) else 1.0)
    # explicit per-head slopes attr (MPT non-power-of-two heads etc.)
    alibi_sl = None
    if op.has_attr("alibi_slopes"):
        alibi_sl = require_attr(op, "alibi_slopes").array().astype(
            np.float32)
        if list(alibi_sl.shape) != [num_heads]:
            raise ValueError(f"RotaryAttention {op.name}: alibi_slopes "
                             f"shape {alibi_sl.shape} != [{num_heads}]")
    if num_heads % num_kv:
        raise ValueError(f"RotaryAttention {op.name}: num_heads "
                         f"{num_heads} not divisible by num_kv_heads "
                         f"{num_kv}")
    # qwen3-style decoupled head_dim: projections are [heads*d, E] with
    # d independent of E/heads (o_proj maps heads*d back to E)
    if op.has_param("head_dim", PARAM_INT):
        d = op.params["head_dim"].i
        if d < 1:
            raise ValueError(f"RotaryAttention {op.name}: head_dim "
                             f"must be >= 1, got {d}")
    else:
        if embed_dim % num_heads:
            raise ValueError(f"RotaryAttention {op.name}: embed_dim "
                             f"{embed_dim} not divisible by "
                             f"{num_heads} heads (declare head_dim)")
        d = embed_dim // num_heads
    if d % 2 and not alibi:
        raise ValueError(f"RotaryAttention {op.name}: head_dim {d} must "
                         f"be even for RoPE")
    # partial rotary (phi/GPT-NeoX/stablelm: HF partial_rotary_factor /
    # rotary_pct): only the first rotary_dim of each head rotates
    rot_dim = (op.params["rotary_dim"].i
               if op.has_param("rotary_dim", PARAM_INT) else d)
    if not alibi and (rot_dim % 2 or not (2 <= rot_dim <= d)):
        raise ValueError(f"RotaryAttention {op.name}: rotary_dim "
                         f"{rot_dim} must be even and in [2, {d}]")
    # GPT-J/CodeGen rotate_every_two lane wiring (see apply_rope)
    rope_il = bool(op.params["rope_interleaved"].i
                   if op.has_param("rope_interleaved", PARAM_INT)
                   else 0)
    group = num_heads // num_kv
    ring_proj = ring_out_proj(cfg, num_heads)
    # a pallas_call inside a GSPMD-partitioned program cannot be
    # partitioned (the banded kernel would force a replicate/gather or
    # fail to compile); mirror the MHA/decoder gates: meshes fall back
    # to the XLA banded path
    mesh_free = getattr(cfg, "mesh", None) is None

    weights: dict[str, np.ndarray] = {}
    for key, out_dim in (("q", num_heads * d), ("k", num_kv * d),
                         ("v", num_kv * d), ("o", embed_dim)):
        w = require_attr(op, f"{key}_proj.weight").array()
        in_dim = num_heads * d if key == "o" else embed_dim
        if list(w.shape) != [out_dim, in_dim]:
            raise ValueError(f"RotaryAttention {op.name}: "
                             f"{key}_proj.weight shape {w.shape} != "
                             f"[{out_dim}, {in_dim}]")
        weights[f"w{key}"] = np.ascontiguousarray(w.T).astype(np.float32)
        if op.has_attr(f"{key}_proj.bias"):
            weights[f"b{key}"] = (require_attr(op, f"{key}_proj.bias")
                                  .array().astype(np.float32))
    # qwen3 per-head q/k RMSNorm (over head_dim, applied before RoPE)
    qk_eps = (op.params["qk_norm_eps"].f
              if op.has_param("qk_norm_eps", PARAM_FLOAT) else 1e-6)
    # gemma2: attention scale decoupled from head_dim
    # (query_pre_attn_scalar**-0.5) and tanh softcapping of the attn
    # logits BEFORE masking (HF Gemma2Attention order: scale ->
    # softcap -> mask -> softmax)
    attn_scale = (op.params["attn_scale"].f
                  if op.has_param("attn_scale", PARAM_FLOAT)
                  else 1.0 / math.sqrt(d))
    softcap = (op.params["logit_softcap"].f
               if op.has_param("logit_softcap", PARAM_FLOAT) else None)
    if softcap is not None and softcap <= 0:
        raise ValueError(f"RotaryAttention {op.name}: logit_softcap "
                         f"must be > 0, got {softcap}")
    for key, wkey in (("q_norm.weight", "wqn"), ("k_norm.weight",
                                                 "wkn")):
        if op.has_attr(key):
            nw = require_attr(op, key).array().astype(np.float32)
            if list(nw.shape) != [d]:
                raise ValueError(f"RotaryAttention {op.name}: {key} "
                                 f"shape {nw.shape} != [{d}]")
            weights[wkey] = nw

    Lq = op.inputs[0].shape[1] if (op.inputs and
                                   len(op.inputs[0].shape) == 3) else None
    flops = 0
    if Lq and Lq > 0:
        proj = 2 * embed_dim * d * (num_heads + 2 * num_kv + num_heads)
        attn = 2 * 2 * Lq * num_heads * d
        flops = Lq * (proj + attn)

    def apply(weights, x):
        from ..quant.tensor import proj_nlo

        dt = x.dtype
        n, l = x.shape[0], x.shape[1]

        def proj(key, heads):
            y = proj_nlo(x, weights[f"w{key}"], dt)
            if f"b{key}" in weights:
                y = y + weights[f"b{key}"]
            return jnp.transpose(y.astype(dt).reshape(n, l, heads, d),
                                 (0, 2, 1, 3))

        qh, kh, vh = proj("q", num_heads), proj("k", num_kv), proj(
            "v", num_kv)
        qh, kh = apply_qk_norm(qh, kh, weights, qk_eps)
        if not alibi:
            cos, sin = rope_cos_sin(jnp.arange(l), rot_dim,
                                    theta)              # [L, R]
            qh = apply_rope(qh, cos[None, None], sin[None, None],
                            interleaved=rope_il)
            kh = apply_rope(kh, cos[None, None], sin[None, None],
                            interleaved=rope_il)
        if softcap is None and not alibi:
            # flash kernels past the measured crossovers: the BANDED
            # grid for sliding-window ops (flash_band_profitable —
            # 1.17x at L=1536/sw256, 201x at 8192; the XLA path
            # materializes all L^2 scores regardless of the band) and,
            # since the round-5 256x256-block re-sweep, the FULL-CAUSAL
            # grid AUTO at Lk >= 2048 (flash_profitable — 1.16x at
            # 2048, 2.44x at 3072; XLA's fused sdpa spills its scores
            # tensor there). Softcapped ops (gemma2) stay on XLA: the
            # kernels' online softmax has no tanh hook.
            from ..kernels.attention import (flash_attention,
                                             flash_band_profitable,
                                             flash_profitable)

            profitable = (flash_band_profitable(l, l, sw)
                          if sw is not None else flash_profitable(l, l))
            if mesh_free and profitable and _pallas_ok():
                # 256x256 blocks: 1.44x over the 128 defaults here
                # (docs/PERF.md round-4 block sweep; round-5 defaults)
                ctx = flash_attention(
                    qh, repeat_kv(kh, group), repeat_kv(vh, group),
                    causal=True, scale=attn_scale,
                    sliding_window=sw, block_q=256, block_k=256)
                ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(
                    n, l, num_heads * d)
                if ring_proj is not None:
                    return ring_proj(ctx, weights["wo"],
                                     weights.get("bo"), dt)
                out = proj_nlo(ctx, weights["wo"], dt)
                if "bo" in weights:
                    out = out + weights["bo"]
                return out.astype(dt)
        s = jnp.einsum("nhqd,nhkd->nhqk", qh, repeat_kv(kh, group),
                       preferred_element_type=jnp.float32)
        s = s * attn_scale
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap
        qi = lax.broadcasted_iota(jnp.int32, s.shape, 2)
        ki = lax.broadcasted_iota(jnp.int32, s.shape, 3)
        if alibi:       # per-head linear key-position bias (no flash
            # hook for it — ALiBi ops stay on the XLA path, where the
            # bias fuses into the scores elementwise chain)
            s = s + (jnp.asarray(resolve_alibi_slopes(
                {"num_heads": num_heads, "alibi_slopes": alibi_sl,
                 "alibi_scale": alibi_scale}))[None, :, None, None]
                     * ki.astype(jnp.float32))
        keep = ki <= qi
        if sw is not None:
            keep &= ki > qi - sw      # banded: last sw positions only
        s = jnp.where(keep, s, jnp.finfo(jnp.float32).min)
        p = _softmax_f32(s).astype(dt)
        ctx = jnp.einsum("nhqk,nhkd->nhqd", p, repeat_kv(vh, group))
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(n, l,
                                                       num_heads * d)
        if ring_proj is not None:
            return ring_proj(ctx, weights["wo"], weights.get("bo"), dt)
        out = proj_nlo(ctx, weights["wo"], dt)
        if "bo" in weights:
            out = out + weights["bo"]
        return out.astype(dt)

    return OpImpl(
        name=op.name, type=op.type, apply=apply, weights=weights,
        quantizable={"wq": 1, "wk": 1, "wv": 1, "wo": 1},
        shard_hints={"wq": (None, "model"), "wk": (None, "model"),
                     "wv": (None, "model"), "wo": ("model", None),
                     "bq": ("model",), "bk": ("model",),
                     "bv": ("model",)},
        flops_per_item=flops,
        # qk-norm weights stay f32 (the rsqrt normalization is
        # precision-sensitive and the vectors are tiny)
        fp32_keys=("wqn", "wkn"),
        decode_info={"embed_dim": embed_dim, "num_heads": num_heads,
                     "num_kv_heads": num_kv, "head_dim": d,
                     "rope_theta": theta, "rotary": not alibi,
                     "alibi": alibi, "alibi_scale": alibi_scale,
                     "alibi_slopes": alibi_sl, "rotary_dim": rot_dim,
                     "rope_interleaved": rope_il,
                     "batch_first": True, "sliding_window": sw,
                     "qk_norm_eps": qk_eps,
                     "attn_scale": attn_scale,
                     "logit_softcap": softcap},
    )
