"""Autoregressive generation driver for causal LMs (zoo.build_gpt).

The engine compiles ONE static-shape program (SURVEY.md §3.2 — the
XLA analog of the reference's fixed CGraph pipeline), so generation
runs as fixed-window re-forwards: the token buffer stays [N, L] with
right padding, each step writes the argmax of the logits at the last
real position, and every call hits the same compiled executable — no
recompiles, no dynamic shapes. The causal mask baked into build_gpt
guarantees padding positions cannot influence earlier logits.

Two drivers:
- greedy_generate: fixed-window re-forward per step (O(L^2)/token but
  zero extra machinery — reuses the engine's one executable).
- CachedDecoder: KV-cache decode, O(L)/token, per-row positions so a
  continuous-batching service (serving/llm.py) can mix prefill and
  decode rows in one step batch.
"""
from __future__ import annotations

import numpy as np


def _kv_quantize(x):
    """Symmetric int8 quantization of k/v vectors with one f32 scale
    per vector (over the trailing head_dim axis): x [..., D] ->
    (int8 [..., D], f32 [..., 1]). The per-(row, head, position) scale
    keeps the quantization error local — one outlier position cannot
    degrade the whole cache (contrast per-tensor scales)."""
    import jax.numpy as jnp

    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                    1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _causal_ctx(qh, kh, vh, d, use_pallas: bool, sliding_window=None,
                scale=None, softcap=None, mesh=None, alibi=None):
    """Aligned-causal attention context [N, H, L, D] for prefill.

    XLA's fused sdpa by default; the Pallas flash kernel when the
    engine opted in (use_pallas) AND the sequence clears the measured
    profitability gate (kernels/attention.flash_profitable — flash
    LOSES 2x at short L, docs/PERF.md). Both paths: f32 logits/softmax,
    context in the input dtype. sliding_window bands the mask to the
    last W positions (mistral-family).

    Sliding-window prefill dispatches the BANDED flash kernel
    AUTOMATICALLY (no use_pallas opt-in) past the measured crossover
    (flash_band_profitable: 1.17x at L=1536/sw256, 1.57x at 2048,
    7.7x at 4096, 201x at L=8192 — the XLA fallback materializes all
    L^2 scores regardless of the band, so long-L SWA prefill without
    the kernel is catastrophic).
    """
    import jax
    import jax.numpy as jnp

    l = qh.shape[2]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    # softcapped ops (gemma2 tanh logit capping) always take the XLA
    # path — the flash kernels' online softmax has no tanh hook; a
    # live mesh does too (pallas_call can't be GSPMD-partitioned,
    # same gate as CachedDecoder.kernel_ok)
    if (sliding_window is not None and softcap is None and mesh is None
            and alibi is None):
        from ..kernels.attention import (flash_attention,
                                         flash_band_profitable)
        from ..kernels.matmul import pallas_supported

        if (flash_band_profitable(l, l, sliding_window)
                and pallas_supported()):
            # 256x256 blocks: 1.44x over the 128 defaults at the
            # banded shape class (measured both L=2048 and 4096,
            # sw256; docs/PERF.md round-4 block sweep)
            return flash_attention(qh, kh, vh, causal=True,
                                   scale=scale,
                                   sliding_window=sliding_window,
                                   block_q=256, block_k=256)
    # full-causal flash is AUTO past the crossover since the round-5
    # 256x256 re-sweep moved it to 2048 (1.16x there, 2.44x at 3072 —
    # XLA's fused sdpa spills its scores tensor); use_pallas no longer
    # required. flash_profitable keeps short prefills on XLA.
    if (sliding_window is None and softcap is None and mesh is None
            and alibi is None):
        from ..kernels.attention import flash_attention, flash_profitable
        from ..kernels.matmul import pallas_supported

        if flash_profitable(l, l) and pallas_supported():
            return flash_attention(qh, kh, vh, causal=True,
                                   scale=scale)
    s = jnp.einsum("nhqd,nhkd->nhqk", qh, kh,
                   preferred_element_type=jnp.float32)
    s = s * scale
    if softcap is not None:
        s = jnp.tanh(s / softcap) * softcap
    qi = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    ki = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    if alibi is not None:   # BLOOM/MPT slopes[h] * key_position bias
        # (ops/attention.alibi_slopes: shift-invariance makes absolute
        # key positions exact)
        s = s + (jnp.asarray(alibi)[None, :, None, None]
                 * ki.astype(jnp.float32))
    keep = ki <= qi
    if sliding_window is not None:
        keep &= ki > qi - sliding_window
    s = jnp.where(keep, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1).astype(qh.dtype)
    return jnp.einsum("nhqk,nhkd->nhqd", p, vh)


def greedy_generate(engine, prompt_ids, steps: int, *,
                    input_name: str | None = None,
                    output_name: str | None = None,
                    eos_id: int | None = None) -> np.ndarray:
    """Greedy-decode `steps` tokens after each prompt row.

    prompt_ids: [N, P] int array, P <= the model's compiled seq_len L;
    P + steps must fit in L. Returns [N, P + steps] (or shorter rows
    frozen after eos_id when given).
    """
    input_name = input_name or engine.input_names[0]
    output_name = output_name or engine.output_names[0]
    prompt = np.asarray(prompt_ids)
    if prompt.ndim != 2:
        raise ValueError(f"prompt_ids must be [N, P], got {prompt.shape}")
    n, p = prompt.shape

    # compiled window length from the program's input declaration
    spec = next(s for s in engine.program.inputs if s.name == input_name)
    if not spec.shape or len(spec.shape) != 2:
        raise ValueError(
            f"input {input_name!r} is not a declared [N, L] token "
            f"buffer: {spec.shape}")
    length = int(spec.shape[1])
    if p + steps > length:
        raise ValueError(f"prompt ({p}) + steps ({steps}) exceeds the "
                         f"compiled window {length}")

    buf = np.zeros((n, length), np.float32)
    buf[:, :p] = prompt
    done = np.zeros(n, bool)
    cur = p
    for _ in range(steps):
        logits = engine.run({input_name: buf})[output_name]
        nxt = np.argmax(logits[:, cur - 1, :], axis=-1)
        buf[:, cur] = np.where(done, 0, nxt)
        if eos_id is not None:
            done |= (nxt == eos_id)
        cur += 1
        if eos_id is not None and done.all():
            break
    return buf[:, :cur].astype(np.int64)


class CachedDecoder:
    """KV-cache decode for causal-LM engines: O(L) per generated token
    instead of greedy_generate's O(L^2) full-window re-forward.

    Walks the engine's compiled plan (Program.plan) and re-traces it as
    a single-token step function: nn.MultiheadAttention ops project
    only the new token's q/k/v, append k/v into per-layer caches with a
    one-hot position select (layout-agnostic and in-place on the
    donated buffers — XLA's per-row scatter cost 67% of the step,
    docs/PERF.md), and attend over the cache under a position mask —
    so shapes stay static and one jitted step executable serves every
    position.

    Supported plan ops: token-pointwise ops (Embedding/LayerNorm/
    RMSNorm/Linear/activations/BinaryOp), graph constants
    (pnnx.Attribute, auto-sliced at the current position when they span
    the sequence axis — position embeddings), self-attention
    nn.MultiheadAttention (its baked causal-mask operand is dropped:
    causality is implicit in the cache), and si.RotaryAttention
    (llama-family: on-device RoPE at per-row positions, GQA kv-head
    cache). Anything else raises.
    """

    _POINTWISE = {
        "nn.Embedding", "pnnx.Attribute", "BinaryOp", "nn.LayerNorm",
        "nn.RMSNorm", "nn.Linear", "nn.GELU", "nn.ReLU", "nn.SiLU",
        "nn.Tanh", "nn.Sigmoid", "nn.Softmax", "nn.Identity",
        "nn.Dropout",
    }

    #: extra ring slots beyond the sliding window so a decode block's /
    #: verify chunk's in-flight appends never overwrite entries its own
    #: reads still need; also the max block/chunk width over a ring
    RING_HEADROOM = 64

    def __init__(self, engine, kv_dtype: str | None = None,
                 scratch_blocks: bool = False, fuse_qkv: bool = False,
                 sample_cap: int | None = None,
                 decode_attn: str = "xla",
                 window: int | None = None):
        """window: cap the decoder's cache length (and every position/
        mask bound) BELOW the model's compiled seq_len — the memory
        knob behind tiered KV pools (serving.TieredGenerationService):
        a short-tier decoder allocates window-sized caches for rows
        whose prompt+max_new provably fit, instead of paying the full
        model window per slot. Rows must never exceed it (generate/
        prefill validate). None (default) = the model's seq_len.

        kv_dtype: KV-cache storage — None/"float32" (exact),
        "bfloat16" (half the cache bandwidth, ~1e-2 relative k/v
        error), or "int8" (quarter bandwidth; per-vector symmetric
        scales via _kv_quantize, folded onto the L-sized scores/probs
        so the attention einsums read raw int8). At long windows the
        decode step is KV-read-bound, so cache bytes convert ~directly
        into tok/s (docs/PERF.md).

        fuse_qkv: concatenate each attention op's q/k/v projection
        weights once at init and run ONE [E, (H+2KV)*D] matmul per
        decode step instead of three. Per-output-column accumulation
        is unchanged; quantized weights fuse via per-channel scale
        concat. Measured NEUTRAL on chip (1.004x at 0.9B — XLA already
        overlaps the three small projections), so it defaults off; the
        extra fused weight copy costs HBM for no gain (docs/PERF.md).

        scratch_blocks: decode_block accumulates the block's K new k/v
        vectors in a tiny [N, KV, K, D] scratch, attends over
        frozen-cache + scratch (the exact same key set, split masks),
        and merges into the big cache ONCE per block — per-step big-
        cache traffic drops from read+write+read (the carried cache is
        rewritten every scan step) to the unavoidable attention read.
        Same tokens attended, same cache contents after the block; the
        attention score summation ORDER differs (frozen+scratch partial
        sums), so logits match the per-step path to f32 ulp, not
        bit-exactly — block-size invariance of sampled streams is
        probabilistic rather than guaranteed. Off by default.

        sample_cap: restrict on-device sampling to the cap
        highest-scoring tokens (`lax.top_k` + exact full-vocab
        logsumexp) instead of sorting the whole vocabulary each step.
        Distribution-exact whenever every sampled row has
        0 < top_k <= cap (or is greedy); nucleus-only rows are
        truncated to the top-cap candidates. Capped and uncapped
        streams draw different randoms, so the choice is per-decoder,
        not per-step (zoo/sampling.sample_logits, docs/PERF.md).

        decode_attn: "xla" (default) or "pallas" — the frozen-cache
        attention read inside scratch-mode decode blocks runs the
        kernels/decode_attn flash-decoding kernel: PER-ROW lengths
        (each row reads ceil(pos/block) cache blocks — an old row no
        longer drags young rows to the full window, superseding the
        pool-global kv_prefix rung) and in-register s8 dequant (the
        int8 cache is never materialized as f32 in HBM). Requires
        scratch_blocks=True and a single device. Logits match the XLA
        path to f32 ulp (online-softmax merge order differs)."""
        import jax
        import jax.numpy as jnp

        if kv_dtype not in (None, "float32", "bfloat16", "int8"):
            raise ValueError(f"kv_dtype must be float32/bfloat16/int8, "
                             f"got {kv_dtype!r}")
        if decode_attn not in ("xla", "pallas"):
            raise ValueError(f"decode_attn must be 'xla' or 'pallas', "
                             f"got {decode_attn!r}")
        if decode_attn == "pallas" and not scratch_blocks:
            raise ValueError("decode_attn='pallas' reads a FROZEN cache "
                             "per block; it requires scratch_blocks=True")
        self._pallas_decode = decode_attn == "pallas"
        self._kv_int8 = kv_dtype == "int8"
        self._kv_store = jnp.bfloat16 if kv_dtype == "bfloat16" \
            else jnp.float32
        self._scratch_blocks = bool(scratch_blocks)
        if sample_cap is not None and int(sample_cap) < 1:
            raise ValueError(f"sample_cap must be >= 1, got {sample_cap}")
        # public: serving/llm.py checks requests against the exact regime
        self.sample_cap = None if sample_cap is None else int(sample_cap)
        self._sample_cap = self.sample_cap

        program = engine.program
        self._mesh = getattr(engine, "_mesh", None)
        # explicit-TP (EngineConfig.tp_mode="ring"): output projections
        # route through the hand-scheduled shard_map ring all-reduce
        # (parallel/tp.tp_linear_row) instead of GSPMD's all-reduce
        self._ring_msize = 0
        if self._mesh is not None and getattr(
                engine.config, "tp_mode", "gspmd") == "ring":
            from ..parallel.mesh import AXIS_MODEL
            self._ring_msize = dict(self._mesh.shape).get(AXIS_MODEL, 1)
            if self._ring_msize <= 1:
                self._ring_msize = 0
        if self._mesh is not None:
            # Tensor-parallel decode: the attention/linear weights are
            # already Megatron-sharded by the engine (wq/wk/wv column-,
            # wo row-parallel — ops/attention.py shard_hints); caches
            # shard over kv heads on the `model` axis and GSPMD inserts
            # the reduce for the row-parallel output projection. The
            # slot batch stays replicated: spread THROUGHPUT over a DP
            # engine pool (serving/batcher.py), use TP to fit/speed one
            # model.
            from ..parallel.mesh import AXIS_DATA, AXIS_SPATIAL
            sizes = dict(self._mesh.shape)
            if sizes.get(AXIS_DATA, 1) > 1 or \
                    sizes.get(AXIS_SPATIAL, 1) > 1:
                raise ValueError(
                    "CachedDecoder shards over the `model` axis only; "
                    "use a DP engine pool for data parallelism")
            if self._pallas_decode:
                raise ValueError("decode_attn='pallas' is single-device "
                                 "(the kernel does not compose with the "
                                 "TP mesh yet); use kv_prefix rungs "
                                 "under TP")
        # Mosaic kernels need a TPU backend; tests exercise the kernel
        # through the interpreter (SURVEY §4.4's mock-backend role)
        self._kernel_interpret = jax.default_backend() != "tpu"
        if len(program.input_names) != 1 or len(program.output_names) != 1:
            raise ValueError("CachedDecoder expects one input (token "
                             "ids) and one output (logits)")
        spec = program.inputs[0]
        if not spec.shape or len(spec.shape) != 2:
            raise ValueError(f"token input must be [N, L], got "
                             f"{spec.shape}")
        self._batch = int(spec.shape[0]) if spec.shape[0] > 0 else 1
        # the MODEL's compiled seq_len: graph constants (position
        # embeddings, additive masks) span THIS length; the decoder's
        # cache/position bound self._window may be overridden shorter
        self._model_window = int(spec.shape[1])
        self._window = self._model_window
        if window is not None:
            if not 1 <= int(window) <= self._window:
                raise ValueError(
                    f"window override must be in [1, {self._window}] "
                    f"(the model's compiled seq_len), got {window}")
            self._window = int(window)
        self._in_name = program.input_names[0]
        self._out_name = program.output_names[0]
        self._plan = program.plan
        self._weights = engine._device_weights
        self._use_pallas = bool(getattr(engine.config, "use_pallas",
                                        False))
        self._mha_ops = []
        for impl, _ins, _outs in self._plan:
            if impl.type == "nn.MultiheadAttention":
                info = impl.decode_info
                if not info or not info.get("batch_first"):
                    raise ValueError(
                        f"{impl.name}: KV-cache decode needs batch_first "
                        f"self-attention")
                if (info["kdim"] != info["embed_dim"]
                        or info["vdim"] != info["embed_dim"]):
                    raise ValueError(f"{impl.name}: kdim/vdim != "
                                     f"embed_dim unsupported")
                self._mha_ops.append((impl.name, info))
            elif impl.type == "si.RotaryAttention":
                self._mha_ops.append((impl.name, impl.decode_info))
            elif impl.type not in self._POINTWISE:
                raise ValueError(
                    f"KV-cache decode: unsupported op type {impl.type!r} "
                    f"({impl.name}); supported: "
                    f"{sorted(self._POINTWISE)} + nn.MultiheadAttention")
        if self._pallas_decode and any(
                (info or {}).get("sliding_window")
                for _, info in self._mha_ops):
            raise ValueError("decode_attn='pallas' does not support "
                             "sliding-window attention yet (the kernel "
                             "mask has no band); use the XLA path")
        # ring-stored sliding ops bound the block/chunk width (a wider
        # block could overwrite ring entries its own reads still need)
        self._has_ring = any(self._op_ring(info) is not None
                             for _, info in self._mha_ops)
        if fuse_qkv:
            self._weights = self._fuse_attention_weights(self._weights)
        self._step = jax.jit(self._step_fn, donate_argnums=(3,))
        self._step_sample = jax.jit(self._step_sample_fn,
                                    donate_argnums=(3,))
        self._prefill_sample = jax.jit(self._prefill_sample_fn)
        self._prefill_logits = jax.jit(self._prefill_logits_fn)
        self._install = jax.jit(self._install_fn, donate_argnums=(0,))
        self._install_rows = jax.jit(self._install_rows_fn,
                                     donate_argnums=(0,))
        self._merge = jax.jit(
            lambda carry, tok, rows: carry.at[rows].set(
                tok.astype(carry.dtype), mode="drop"))
        # (k_steps, kv_prefix, sample_cap) -> jitted block fn
        self._block_fns: dict[tuple, object] = {}
        # chunk width K -> jitted chunk-verify fn (speculative decode)
        self._chunk_fns: dict[int, object] = {}
        # sample_cap -> jitted fused-admission fn (the serving loop can
        # flip the cap per admission wave, auto fast-path selection)
        self._prefill_install_fns: dict = {}
        self._trunc_warned = False

    def _fuse_attention_weights(self, weights):
        """Add a concatenated "wqkv" (+"bqkv") to each attention op's
        weight dict: the decode step then runs one [E, (H+2KV)*D]
        projection instead of three — per-output-column math is
        unchanged, so results match the unfused path. Quantized
        weights concat payload + per-channel scales; mixed
        quantized/dense triples are left unfused. The original keys
        stay (prefill uses them)."""
        import jax.numpy as jnp

        from ..quant.tensor import Quantized4Tensor, QuantizedTensor

        out = dict(weights)
        for name, _info in self._mha_ops:
            w = dict(weights.get(name, {}))
            if not all(k in w for k in ("wq", "wk", "wv")):
                continue
            parts = [w["wq"], w["wk"], w["wv"]]
            quant = [isinstance(p, QuantizedTensor) for p in parts]
            q4 = [isinstance(p, Quantized4Tensor) for p in parts]
            if all(quant) and all(p.axis == 1 for p in parts):
                w["wqkv"] = QuantizedTensor(
                    data=jnp.concatenate([p.data for p in parts],
                                         axis=1),
                    scale=jnp.concatenate([p.scale for p in parts],
                                          axis=0),
                    axis=1)
            elif all(q4) and len({(p.group, p.k) for p in parts}) == 1:
                # int4w: packing is along K, so an out-channel concat
                # of packed payloads + scale rows preserves the layout
                w["wqkv"] = Quantized4Tensor(
                    packed=jnp.concatenate([p.packed for p in parts],
                                           axis=1),
                    scale=jnp.concatenate([p.scale for p in parts],
                                          axis=1),
                    group=parts[0].group, k=parts[0].k)
            elif not any(quant) and not any(q4):
                w["wqkv"] = jnp.concatenate(parts, axis=1)
            else:
                continue
            biases = [f"b{k}" in w for k in "qkv"]
            if all(biases):
                w["bqkv"] = jnp.concatenate([w["bq"], w["bk"], w["bv"]])
            elif any(biases):
                del w["wqkv"]        # partial biases: keep unfused
                continue
            out[name] = w
        return out

    def _proj_out(self, w, ctx, dt, heads):
        """Attention output projection ctx @ wo (+ bo): the explicit
        shard_map collective-matmul ring when the engine selected
        tp_mode='ring' and the heads divide the model axis
        (parallel/tp.tp_linear_row — the partials ride a ppermute ring
        overlapped with the chunked local matmul), else a plain einsum
        whose reduce GSPMD places. Ring sums in deterministic neighbor
        order: ~1 ulp from GSPMD's tree, pinned empirically by the TP
        parity tests."""
        import jax.numpy as jnp

        from ..quant.tensor import proj_nlo, resolve_weight

        if self._ring_msize and heads % self._ring_msize == 0:
            from ..parallel.mesh import AXIS_MODEL
            from ..parallel.tp import tp_linear_row

            return tp_linear_row(
                ctx, resolve_weight(w["wo"], dt), w.get("bo"),
                mesh=self._mesh, axis=AXIS_MODEL).astype(dt)
        out = proj_nlo(ctx, w["wo"], dt)
        if "bo" in w:
            out = out + w["bo"]
        return out

    def _proj_qkv(self, w, x, heads, kvh, d, dt, qk_eps=1e-6):
        """q/k/v projections for one token: the fused single matmul
        when available, else three. Returns [N,H,1,D] / [N,KVh,1,D]x2.
        Applies the qwen3 per-head qk RMSNorm when the op carries
        wqn/wkn (before RoPE — every decode path shares this hook)."""
        import jax.numpy as jnp

        from ..ops.attention import apply_qk_norm
        from ..quant.tensor import proj_nlo, resolve_weight

        n = x.shape[0]

        def heads_of(y, h):
            return jnp.transpose(y.astype(dt).reshape(n, 1, h, d),
                                 (0, 2, 1, 3))

        if "wqkv" in w:
            y = proj_nlo(x, w["wqkv"], dt)
            if "bqkv" in w:
                y = y + w["bqkv"]
            qd, kd = heads * d, kvh * d
            qh, kh, vh = (heads_of(y[..., :qd], heads),
                          heads_of(y[..., qd:qd + kd], kvh),
                          heads_of(y[..., qd + kd:], kvh))
            qh, kh = apply_qk_norm(qh, kh, w, qk_eps)
            return qh, kh, vh

        def proj(key, h):
            y = proj_nlo(x, w[f"w{key}"], dt)
            if f"b{key}" in w:
                y = y + w[f"b{key}"]
            return heads_of(y, h)

        qh, kh, vh = proj("q", heads), proj("k", kvh), proj("v", kvh)
        qh, kh = apply_qk_norm(qh, kh, w, qk_eps)
        return qh, kh, vh

    # ---- cache ----------------------------------------------------------
    def _op_ring(self, info):
        """Ring length for a sliding-window op's KV cache (None = full
        window storage). A sliding op never attends past its window W,
        so its cache is a RING of W + RING_HEADROOM slots (8-aligned):
        position p lives at slot p % R, appends overwrite the oldest
        entries, and both memory AND the per-step attention read are
        bounded by W instead of the compiled window — the storage half
        of the mistral-family feature (the banded masks are the
        semantics half). Full-window storage when the ring would not
        be smaller."""
        sw = (info or {}).get("sliding_window")
        if sw is None:
            return None
        r = -(-(sw + self.RING_HEADROOM) // 8) * 8
        return r if r < self._window else None

    def init_cache(self, batch: int, dtype=None):
        """Zeroed per-layer KV cache pytree. Leaf layout per layer:
        (k, v) for dense storage, or (k_q, k_s, v_q, v_s) for int8
        (values [N, KV, L, D] int8 + per-vector scales [N, KV, L, 1]
        f32). All install/scatter paths are tree_map-generic, so both
        layouts flow through prefill_install/install_rows unchanged."""
        import jax.numpy as jnp

        dtype = dtype or self._kv_store
        place = lambda z: z                     # noqa: E731
        if self._mesh is not None:
            import jax

            from ..parallel.mesh import AXIS_MODEL, P, NamedSharding

            msize = self._mesh.shape.get(AXIS_MODEL, 1)

            def place(z):                       # noqa: F811
                # kv heads over the model axis, matching the
                # column-sharded wk/wv (replicate when indivisible)
                axis = AXIS_MODEL if z.shape[1] % msize == 0 else None
                return jax.device_put(z, NamedSharding(
                    self._mesh, P(None, axis, None, None)))
        caches = {}
        for name, info in self._mha_ops:
            h = info["num_heads"]
            kv = info.get("num_kv_heads", h)  # GQA: kv heads cached
            d = info.get("head_dim", info["embed_dim"] // h)
            length = self._op_ring(info) or self._window
            shape = (batch, kv, length, d)
            if self._kv_int8:
                sshape = shape[:-1] + (1,)
                caches[name] = (place(jnp.zeros(shape, jnp.int8)),
                                place(jnp.ones(sshape, jnp.float32)),
                                place(jnp.zeros(shape, jnp.int8)),
                                place(jnp.ones(sshape, jnp.float32)))
            else:
                caches[name] = (place(jnp.zeros(shape, dtype)),
                                place(jnp.zeros(shape, dtype)))
        return caches

    def cache_nbytes(self, batch: int, dtype=None) -> int:
        """Bytes init_cache(batch, dtype) would allocate, computed from
        the leaf shapes WITHOUT materializing a pool — accounting on a
        live service must not transiently double KV HBM (a full second
        pool near capacity OOMs the chip)."""
        import numpy as np

        dtype = dtype or self._kv_store
        item = np.dtype(dtype).itemsize
        total = 0
        for _name, info in self._mha_ops:
            h = info["num_heads"]
            kv = info.get("num_kv_heads", h)
            d = info.get("head_dim", info["embed_dim"] // h)
            length = self._op_ring(info) or self._window
            vec = batch * kv * length
            if self._kv_int8:
                # two int8 value planes + two f32 scale planes
                total += 2 * vec * d * 1 + 2 * vec * 1 * 4
            else:
                total += 2 * vec * d * item
        return total

    def _cache_append(self, cache, kh, vh, pos, ring=None):
        """Write the new token's k/v ([N, KV, 1, D]) at each row's
        position (slot position % ring for ring-stored sliding ops);
        returns (new cache leaves, dense-readable (k, v)).

        The write is a one-hot SELECT over the position axis, not a
        scatter: hlo_stats on the "base" decode step showed the
        per-row `.at[rows, :, pos, :].set` scatters costing ~2 ms/step
        plus ~2.8 ms of layout round-trip copies XLA inserts around
        each scatter (67% of the step), while an elementwise
        jnp.where is layout-agnostic, fuses, and updates the donated
        buffer in place (docs/PERF.md)."""
        import jax
        import jax.numpy as jnp

        n = kh.shape[0]
        length = jax.tree_util.tree_leaves(cache)[0].shape[2]
        slot = pos if ring is None else jnp.remainder(pos, ring)
        hit = jax.lax.broadcasted_iota(
            jnp.int32, (n, 1, length, 1), 2) == \
            slot[:, None, None, None]                    # [N,1,L,1]
        if self._kv_int8:
            k_q, k_s, v_q, v_s = cache
            kq, ks = _kv_quantize(kh[:, :, 0, :])        # [N,KV,D]/[N,KV,1]
            vq, vs = _kv_quantize(vh[:, :, 0, :])
            k_q = jnp.where(hit, kq[:, :, None, :], k_q)
            k_s = jnp.where(hit, ks[:, :, None, :], k_s)
            v_q = jnp.where(hit, vq[:, :, None, :], v_q)
            v_s = jnp.where(hit, vs[:, :, None, :], v_s)
            return (k_q, k_s, v_q, v_s), (k_q, k_s), (v_q, v_s)
        k_cache, v_cache = cache
        # kh/vh are [N, KV, 1, D]: broadcast against hit [N, 1, L, 1]
        k_cache = jnp.where(hit, kh.astype(k_cache.dtype), k_cache)
        v_cache = jnp.where(hit, vh.astype(v_cache.dtype), v_cache)
        return (k_cache, v_cache), k_cache, v_cache

    @staticmethod
    def _kv_slice(leaf, kv_prefix):
        """Restrict a cache leaf (array or (quantized, scales) tuple)
        to its first kv_prefix positions (axis 2). With a STATIC
        prefix the attention einsums read [*, P, *] instead of the
        full compiled window — the decode step's KV traffic scales
        with the occupied prefix, not the window. Mathematically
        exact: positions >= the rows' masks were exp-underflowed to
        0.0 under the mask. Bit-exactness is probabilistic, not
        guaranteed — shrinking the reduce length can retile/reorder
        the remaining nonzero f32 partial sums (same caveat as
        scratch_blocks); tests pin token equality across rungs
        EMPIRICALLY on the zoo models."""
        if kv_prefix is None:
            return leaf
        if isinstance(leaf, tuple):
            return tuple(a[:, :, :kv_prefix, :] for a in leaf)
        return leaf[:, :, :kv_prefix, :]

    def _attn_scores(self, qh, k_leaf, group, dt):
        """Attention scores [N, H, 1, L] against the cached keys.

        int8 path: the per-vector scale is constant over the contracted
        head_dim axis, so q @ (k_q * s) == (q @ k_q) * s — the dequant
        multiply moves from the [N,KV,L,D] cache read (which XLA
        materializes, measured 1.23x SLOWER than bf16 storage at window
        2048) onto the L-sized scores. The einsum reads raw int8."""
        import jax.numpy as jnp

        from ..ops.attention import repeat_kv

        if self._kv_int8:
            k_q, k_s = k_leaf
            s = jnp.einsum("nhqd,nhkd->nhqk", qh,
                           repeat_kv(k_q.astype(dt), group),
                           preferred_element_type=jnp.float32)
            return s * repeat_kv(jnp.swapaxes(k_s, 2, 3), group)
        return jnp.einsum("nhqd,nhkd->nhqk", qh,
                          repeat_kv(k_leaf.astype(dt), group),
                          preferred_element_type=jnp.float32)

    def _attn_ctx(self, p, v_leaf, group, dt):
        """Attention context [N, H, 1, D] = probs @ cached values.

        int8 path: p @ (v_q * s) == (p * s) @ v_q — the value scale
        folds into the [N,H,1,L] probs, the einsum reads raw int8."""
        import jax.numpy as jnp

        from ..ops.attention import repeat_kv

        if self._kv_int8:
            v_q, v_s = v_leaf
            p = p * repeat_kv(jnp.swapaxes(v_s, 2, 3),
                              group).astype(p.dtype)
            return jnp.einsum("nhqk,nhkd->nhqd", p,
                              repeat_kv(v_q.astype(dt), group))
        return jnp.einsum("nhqk,nhkd->nhqd", p,
                          repeat_kv(v_leaf.astype(dt), group))

    # ---- the jitted step ------------------------------------------------
    def _mha_decode(self, w, q, cache, pos, info, kv_prefix=None):
        """pos: [N] int32, PER-ROW positions — rows of one step batch can
        sit at different depths (continuous batching, serving/llm.py).
        kv_prefix: static — attend over only the first kv_prefix cache
        positions (caller guarantees every live row's pos < kv_prefix;
        see _kv_slice)."""
        import jax
        import jax.numpy as jnp

        from ..quant.tensor import proj_nlo, resolve_weight

        heads = info["num_heads"]
        e = info["embed_dim"]
        kvh = info.get("num_kv_heads", heads) or heads
        d = info.get("head_dim") or e // heads
        group = heads // kvh
        dt = q.dtype
        n = q.shape[0]

        qh, kh, vh = self._proj_qkv(w, q, heads, kvh, d, dt)
        new_cache, k_leaf, v_leaf = self._cache_append(cache, kh, vh, pos)
        k_leaf = self._kv_slice(k_leaf, kv_prefix)
        v_leaf = self._kv_slice(v_leaf, kv_prefix)
        s = self._attn_scores(qh, k_leaf, group, dt)
        s = s * (info.get("attn_scale") or 1.0 / (d ** 0.5))
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        if info.get("alibi"):   # cache slot index IS the absolute key
            # position on this (non-ring) path; masked slots are
            # overwritten by the -inf fill regardless of bias
            from ..ops.attention import resolve_alibi_slopes

            s = s + (jnp.asarray(resolve_alibi_slopes(info))[
                None, :, None, None] * idx.astype(jnp.float32))
        s = jnp.where(idx <= pos[:, None, None, None], s,
                      jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        ctx = self._attn_ctx(p, v_leaf, group, dt)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(n, 1, heads * d)
        out = self._proj_out(w, ctx, dt, heads)
        return out.astype(dt), new_cache

    def _rope_decode(self, w, q, cache, pos, info, kv_prefix=None):
        """si.RotaryAttention decode step: RoPE applied at each row's
        position on device, rotated k cached (standard practice — the
        cache never needs re-rotation), GQA kv heads repeated at the
        attention einsum only."""
        import jax
        import jax.numpy as jnp

        from ..ops.attention import apply_rope, repeat_kv, rope_cos_sin
        from ..quant.tensor import proj_nlo, resolve_weight

        heads = info["num_heads"]
        kvh = info["num_kv_heads"]
        d = info["head_dim"]
        theta = info["rope_theta"]
        group = heads // kvh
        dt = q.dtype
        n = q.shape[0]

        sw = info.get("sliding_window")
        ring = self._op_ring(info)
        qh, kh, vh = self._proj_qkv(
            w, q, heads, kvh, d, dt,
            qk_eps=info.get("qk_norm_eps", 1e-6))
        cos, sin = rope_cos_sin(pos, info.get("rotary_dim") or d,
                                theta)                  # [N, R]
        il = bool(info.get("rope_interleaved"))
        qh = apply_rope(qh, cos[:, None, None, :],
                        sin[:, None, None, :], interleaved=il)
        kh = apply_rope(kh, cos[:, None, None, :],
                        sin[:, None, None, :], interleaved=il)
        new_cache, k_leaf, v_leaf = self._cache_append(cache, kh, vh,
                                                       pos, ring)
        if ring is None:            # ring slots are not position-sliced
            k_leaf = self._kv_slice(k_leaf, kv_prefix)
            v_leaf = self._kv_slice(v_leaf, kv_prefix)
        s = self._attn_scores(qh, k_leaf, group, dt)
        s = s * (info.get("attn_scale") or 1.0 / (d ** 0.5))
        softcap = info.get("logit_softcap")
        if softcap is not None:          # gemma2 tanh logit capping
            s = jnp.tanh(s / softcap) * softcap
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        pe = pos[:, None, None, None]
        if ring is not None:
            # ring slot s holds absolute position pos - ((pos - s) % R)
            # (the LATEST position <= pos mapping to s); the band mask
            # works on those absolute positions
            p_abs = pe - jnp.remainder(pe - idx, ring)
            keep = (p_abs >= 0) & (p_abs > pe - sw)
        else:
            keep = idx <= pe
            if sw is not None:      # mistral band: last sw positions
                keep &= idx > pe - sw
        s = jnp.where(keep, s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        ctx = self._attn_ctx(p, v_leaf, group, dt)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(n, 1, heads * d)
        out = self._proj_out(w, ctx, dt, heads)
        return out.astype(dt), new_cache

    def _attn_decode_scratch(self, w, x, frozen, scratch, pos, step_i,
                             pos0, info, kv_prefix=None,
                             pallas_attn=False):
        """One decode step of either attention lineage against a
        FROZEN cache plus the current block's scratch (scratch_blocks
        mode). The frozen cache holds positions < pos0 (read-only for
        the whole block — never rewritten per step); scratch slot j
        holds the k/v of block step j <= step_i. Union of the two
        masked score pieces = exactly the per-step path's key set
        0..pos; only the softmax/context summation order differs
        (frozen + scratch partial sums)."""
        import jax
        import jax.numpy as jnp

        from ..ops.attention import apply_rope, repeat_kv, rope_cos_sin
        from ..quant.tensor import proj_nlo, resolve_weight

        heads = info["num_heads"]
        kvh = info.get("num_kv_heads", heads)
        d = info.get("head_dim", info["embed_dim"] // heads)
        group = heads // kvh
        dt = x.dtype
        n = x.shape[0]

        qh, kh, vh = self._proj_qkv(
            w, x, heads, kvh, d, dt,
            qk_eps=info.get("qk_norm_eps", 1e-6))
        if info.get("rotary"):
            cos, sin = rope_cos_sin(pos, info.get("rotary_dim") or d,
                                    info["rope_theta"])
            il = bool(info.get("rope_interleaved"))
            qh = apply_rope(qh, cos[:, None, None, :],
                            sin[:, None, None, :], interleaved=il)
            kh = apply_rope(kh, cos[:, None, None, :],
                            sin[:, None, None, :], interleaved=il)

        k_scr, v_scr = scratch                    # [N, KVh, K, D]
        kk = k_scr.shape[2]
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, kk, 1), 2)
        k_scr = jnp.where(slot == step_i, kh.astype(k_scr.dtype), k_scr)
        v_scr = jnp.where(slot == step_i, vh.astype(v_scr.dtype), v_scr)

        if self._kv_int8:
            k_leaf, v_leaf = (frozen[0], frozen[1]), (frozen[2],
                                                      frozen[3])
        else:
            k_leaf, v_leaf = frozen
        scale = info.get("attn_scale") or 1.0 / (d ** 0.5)
        softcap = info.get("logit_softcap")

        def cap(t):                      # gemma2 tanh logit capping
            return (jnp.tanh(t / softcap) * softcap
                    if softcap is not None else t)
        neg = jnp.finfo(jnp.float32).min
        sw = info.get("sliding_window")
        ring = self._op_ring(info)
        slopes = None
        if info.get("alibi"):
            from ..ops.attention import resolve_alibi_slopes

            slopes = jnp.asarray(
                resolve_alibi_slopes(info))[None, :, None, None]
            pallas_attn = False  # the flash-decoding kernel has no
            # bias hook (kernel_ok already excludes alibi ops; this
            # guards direct attn_impl="pallas" forcing)
        s_new = jnp.einsum("nhqd,nhkd->nhqk", qh,
                           repeat_kv(k_scr.astype(dt), group),
                           preferred_element_type=jnp.float32) * scale
        s_new = cap(s_new)
        sidx = jax.lax.broadcasted_iota(jnp.int32, s_new.shape, 3)
        if slopes is not None:  # scratch slot j sits at pos0 + j
            s_new = s_new + slopes * (pos0[:, None, None, None]
                                      + sidx).astype(jnp.float32)
        keep_new = sidx <= step_i
        if sw is not None:
            # scratch key j sits at pos0 + j, the query at pos0 + step_i
            keep_new &= sidx > step_i - sw
        s_new = jnp.where(keep_new, s_new, neg)

        if pallas_attn:
            # flash-decoding kernel over the frozen cache: PER-ROW
            # lengths (row reads ceil(pos0/block) cache blocks) and
            # in-register s8 dequant; a kv_prefix rung additionally
            # bounds the kernel GRID (fewer steps on young pools).
            # Returns the unnormalized softmax partial (o, m, l);
            # merge with the scratch piece by online-softmax
            # combination — same key set as the concat softmax,
            # different f32 summation order (the standing scratch-mode
            # ulp caveat).
            from ..kernels.decode_attn import decode_attention

            q4 = qh[:, :, 0, :].reshape(n, kvh, group, d)
            of, mf, lf = decode_attention(
                q4, k_leaf, v_leaf, pos0, scale=scale,
                max_len=kv_prefix,
                interpret=self._kernel_interpret)
            of = of.reshape(n, heads, 1, d)
            mf = mf.reshape(n, heads, 1, 1)
            lf = lf.reshape(n, heads, 1, 1)
            m_new = jnp.max(s_new, axis=-1, keepdims=True)
            m_tot = jnp.maximum(mf, m_new)
            p_new = jnp.exp(s_new - m_tot)        # masked -> exact 0.0
            ctx_new = jnp.einsum(
                "nhqk,nhkd->nhqd", p_new,
                repeat_kv(v_scr, group).astype(jnp.float32),
                preferred_element_type=jnp.float32)
            carry = jnp.exp(mf - m_tot)           # 0 when frozen empty
            l_tot = lf * carry + jnp.sum(p_new, axis=-1, keepdims=True)
            ctx = ((of * carry + ctx_new) / l_tot).astype(dt)
        else:
            if ring is None:
                k_leaf = self._kv_slice(k_leaf, kv_prefix)
                v_leaf = self._kv_slice(v_leaf, kv_prefix)
            s_old = cap(self._attn_scores(qh, k_leaf, group, dt)
                        * scale)
            idx = jax.lax.broadcasted_iota(jnp.int32, s_old.shape, 3)
            if slopes is not None:  # frozen slot index = absolute key
                # position (alibi excludes sliding, so ring is None)
                s_old = s_old + slopes * idx.astype(jnp.float32)
            if ring is not None:
                # frozen ring slot s holds the latest position < pos0
                # mapping to s: (pos0-1) - ((pos0-1-s) % R); band it
                # against the QUERY position (pos = pos0 + step_i)
                p0 = pos0[:, None, None, None]
                p_abs = (p0 - 1) - jnp.remainder(p0 - 1 - idx, ring)
                keep_old = (p_abs >= 0) & \
                    (p_abs > (pos - sw)[:, None, None, None])
            else:
                keep_old = idx < pos0[:, None, None, None]
                if sw is not None:  # band vs the query at pos0 + step_i
                    keep_old &= idx > (pos - sw)[:, None, None, None]
            s_old = jnp.where(keep_old, s_old, neg)
            s = jnp.concatenate([s_old, s_new], axis=-1)
            p = jax.nn.softmax(s, axis=-1).astype(dt)
            p_old, p_new = (p[..., :s_old.shape[-1]],
                            p[..., s_old.shape[-1]:])
            ctx = self._attn_ctx(p_old, v_leaf, group, dt) + \
                jnp.einsum("nhqk,nhkd->nhqd", p_new,
                           repeat_kv(v_scr.astype(dt), group))
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(n, 1, heads * d)
        out = self._proj_out(w, ctx, dt, heads)
        return out.astype(dt), (k_scr, v_scr)

    def _step_fn_scratch(self, weights, token, pos, caches, scratches,
                         step_i, pos0, kv_prefix=None,
                         pallas_attn=False):
        """_step_fn against frozen caches + per-block scratches
        (scratch_blocks mode): identical plan walk, attention reads the
        big cache without rewriting it."""
        new_scr = dict(scratches)
        env = {self._in_name: token}
        for impl, ins, outs in self._plan:
            w = weights.get(impl.name, {})
            if impl.type in ("nn.MultiheadAttention",
                             "si.RotaryAttention"):
                out, new_scr[impl.name] = self._attn_decode_scratch(
                    w, env[ins[0]], caches[impl.name],
                    scratches[impl.name], pos, step_i, pos0,
                    dict(impl.decode_info), kv_prefix=kv_prefix,
                    pallas_attn=pallas_attn)
                env[outs[0]] = out
                for o in outs[1:]:
                    env[o] = None
                continue
            args = [env[n] for n in ins]
            if len(args) > 1:
                args = self._slice_seq(args, pos)
            r = impl.apply(w, *args)
            if impl.n_outputs == 1:
                env[outs[0]] = r
            else:
                for o, v in zip(outs, r):
                    env[o] = v
        return env[self._out_name], new_scr

    def _scratch_merge(self, cache, scratch, pos0, k_steps, ring=None):
        """Fold a block's scratch into the big cache in ONE pass:
        position pos0[row] + j takes scratch slot j (cache slot
        (pos0 + j) % R for ring-stored sliding ops). Slots that would
        land past the window are dropped (the per-step path would have
        kept overwriting the clamped last slot of those dead rows)."""
        import jax
        import jax.numpy as jnp

        k_scr, v_scr = scratch
        n = k_scr.shape[0]
        length = jax.tree_util.tree_leaves(cache)[0].shape[2]
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (n, 1, length, 1), 2)
        off = idx - pos0[:, None, None, None]
        if ring is not None:
            # cache slot s receives block step j = (s - pos0) % R when
            # j < K (RING_HEADROOM >= K guarantees no self-overwrite)
            off = jnp.remainder(off, ring)
        win = (off >= 0) & (off < k_steps)
        offc = jnp.clip(off, 0, k_steps - 1)

        def gather(scr):
            return jnp.take_along_axis(scr, offc, axis=2)  # [N,KV,L,D]

        if self._kv_int8:
            k_q, k_s, v_q, v_s = cache
            gkq, gks = _kv_quantize(gather(k_scr))
            gvq, gvs = _kv_quantize(gather(v_scr))
            return (jnp.where(win, gkq, k_q), jnp.where(win, gks, k_s),
                    jnp.where(win, gvq, v_q), jnp.where(win, gvs, v_s))
        k_cache, v_cache = cache
        return (jnp.where(win, gather(k_scr).astype(k_cache.dtype),
                          k_cache),
                jnp.where(win, gather(v_scr).astype(v_cache.dtype),
                          v_cache))

    def _rope_prefill(self, w, x, info):
        """Full-window si.RotaryAttention with k/v capture (rotated k —
        same convention as _rope_decode)."""
        import jax.numpy as jnp

        from ..ops.attention import apply_rope, repeat_kv, rope_cos_sin
        from ..quant.tensor import proj_nlo, resolve_weight

        heads = info["num_heads"]
        kvh = info["num_kv_heads"]
        d = info["head_dim"]
        theta = info["rope_theta"]
        group = heads // kvh
        dt = x.dtype
        n, l = x.shape[0], x.shape[1]

        def proj(key, h):
            y = proj_nlo(x, w[f"w{key}"], dt)
            if f"b{key}" in w:
                y = y + w[f"b{key}"]
            return jnp.transpose(y.astype(dt).reshape(n, l, h, d),
                                 (0, 2, 1, 3))

        qh, kh, vh = proj("q", heads), proj("k", kvh), proj("v", kvh)
        from ..ops.attention import apply_qk_norm

        qh, kh = apply_qk_norm(qh, kh, w,
                               info.get("qk_norm_eps", 1e-6))
        cos, sin = rope_cos_sin(jnp.arange(l),
                                info.get("rotary_dim") or d,
                                theta)                    # [L, R]
        il = bool(info.get("rope_interleaved"))
        qh = apply_rope(qh, cos[None, None], sin[None, None],
                        interleaved=il)
        kh = apply_rope(kh, cos[None, None], sin[None, None],
                        interleaved=il)
        ctx = _causal_ctx(qh, repeat_kv(kh, group), repeat_kv(vh, group),
                          d, self._use_pallas,
                          sliding_window=info.get("sliding_window"),
                          scale=info.get("attn_scale"),
                          softcap=info.get("logit_softcap"),
                          mesh=self._mesh)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(n, l, heads * d)
        out = self._proj_out(w, ctx, dt, heads)
        return out.astype(dt), (kh, vh)

    def _mha_prefill(self, w, x, info):
        """Full-window causal self-attention that ALSO returns the k/v
        projections as a ready cache: the whole prompt prefills in ONE
        dispatch instead of one step per token (each step costs a full
        relay RTT on this chip — docs/PERF.md). Padding beyond a row's
        prompt writes garbage k/v at positions >= length, but decode's
        position mask (idx <= pos) never reads them."""
        import jax.numpy as jnp

        from ..quant.tensor import proj_nlo, resolve_weight

        heads = info["num_heads"]
        e = info["embed_dim"]
        kvh = info.get("num_kv_heads", heads) or heads
        d = info.get("head_dim") or e // heads
        group = heads // kvh
        dt = x.dtype
        n, l = x.shape[0], x.shape[1]

        def proj(wkey, bkey, h):
            y = proj_nlo(x, w[wkey], dt)
            if bkey in w:
                y = y + w[bkey]
            # [N,L,H*D] -> [N,H,L,D]
            return jnp.transpose(
                y.astype(dt).reshape(n, l, h, d), (0, 2, 1, 3))

        qh = proj("wq", "bq", heads)
        kh = proj("wk", "bk", kvh)
        vh = proj("wv", "bv", kvh)
        slopes = None
        if info.get("alibi"):
            from ..ops.attention import resolve_alibi_slopes

            slopes = resolve_alibi_slopes(info)
        from ..ops.attention import repeat_kv

        ctx = _causal_ctx(qh, repeat_kv(kh, group),
                          repeat_kv(vh, group), d, self._use_pallas,
                          scale=info.get("attn_scale"),
                          mesh=self._mesh, alibi=slopes)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(n, l, heads * d)
        out = self._proj_out(w, ctx, dt, heads)
        return out.astype(dt), (kh, vh)

    @staticmethod
    def _slice_seq_prefill(args, width, window):
        """Prefill analog of _slice_seq: when the plan runs at a bucket
        width < the compiled window (chunked-admission prefill,
        serving/llm.py prefill ladder), window-spanning graph constants
        (position embeddings) are sliced to the bucket's leading
        positions so BinaryOps line up."""
        if width == window:
            return args
        lens = [a.shape[1] if (a is not None and getattr(a, "ndim", 0)
                               == 3) else None for a in args]
        if width in lens and window in lens:
            args = [a[:, :width] if lens[i] == window else a
                    for i, a in enumerate(args)]
        return args

    def _prefill_plan(self, weights, tokens, last_pos=None):
        """Walk the plan at [N, L], L <= the compiled window, capturing
        each attention op's k/v as a cache. Returns (logits [N,L,V],
        caches with position extent L). Same op math as _step_fn, so
        prefill+decode is numerically the step-by-step decode. L < the
        window is the prefill bucket ladder: causality makes the logits
        at each row's last prompt position independent of how much
        padding follows, so a short bucket computes the same result for
        a fraction of the FLOPs/bytes."""
        import jax.numpy as jnp

        width = tokens.shape[1]
        caches = {}
        env = {self._in_name: tokens}
        for impl, ins, outs in self._plan:
            w = weights.get(impl.name, {})
            if impl.type in ("nn.MultiheadAttention",
                             "si.RotaryAttention"):
                info = dict(impl.decode_info)
                fill = (self._rope_prefill if info.get("rotary")
                        else self._mha_prefill)
                out, (kh, vh) = fill(w, env[ins[0]], info)
                ring = self._op_ring(info)
                if ring is not None:
                    # fold the captured [N, KV, Lb, D] k/v into the
                    # ring layout: slot s takes the latest VALID
                    # position <= each row's prompt end congruent to s
                    # (positions past the prompt are padding garbage;
                    # older ring turns are outside the band by
                    # construction). Never-resolved slots hold clipped
                    # junk the decode masks cannot reach before an
                    # append overwrites them.
                    lb = kh.shape[2]
                    end = (last_pos if last_pos is not None
                           else jnp.full((kh.shape[0],), lb - 1,
                                         jnp.int32))        # [N]
                    s_idx = jnp.arange(ring)[None, :]        # [1, R]
                    p_s = end[:, None] - jnp.remainder(
                        end[:, None] - s_idx, ring)          # [N, R]
                    p_c = jnp.clip(p_s, 0, lb - 1)
                    idx4 = p_c[:, None, :, None]             # [N,1,R,1]
                    kh = jnp.take_along_axis(kh, idx4, axis=2)
                    vh = jnp.take_along_axis(vh, idx4, axis=2)
                if self._kv_int8:
                    caches[impl.name] = (*_kv_quantize(kh),
                                         *_kv_quantize(vh))
                else:
                    caches[impl.name] = (kh.astype(self._kv_store),
                                         vh.astype(self._kv_store))
                env[outs[0]] = out
                for o in outs[1:]:
                    env[o] = None
                continue
            args = [env[n] for n in ins]
            if len(args) > 1:
                # graph constants span the MODEL's seq_len (not the
                # possibly-overridden cache window)
                args = self._slice_seq_prefill(args, width,
                                               self._model_window)
            r = impl.apply(w, *args)
            if impl.n_outputs == 1:
                env[outs[0]] = r
            else:
                for o, v in zip(outs, r):
                    env[o] = v
        return env[self._out_name], caches

    def _prefill_logits_fn(self, weights, tokens, last_pos):
        import jax.numpy as jnp

        logits, caches = self._prefill_plan(weights, tokens, last_pos)
        last = jnp.take_along_axis(
            logits, last_pos[:, None, None], axis=1)[:, 0, :]
        return last, caches

    def _prefill_sample_impl(self, weights, tokens, last_pos, key, step,
                             temperature, top_k, top_p, cap):
        import jax

        from .sampling import sample_logits

        last, caches = self._prefill_logits_fn(weights, tokens, last_pos)
        tok = sample_logits(last, jax.random.fold_in(key, step),
                            temperature, top_k, top_p, cap=cap)
        return tok, caches

    def _prefill_sample_fn(self, weights, tokens, last_pos, key, step,
                           temperature, top_k, top_p):
        return self._prefill_sample_impl(weights, tokens, last_pos, key,
                                         step, temperature, top_k, top_p,
                                         self._sample_cap)

    def _step_sample_fn(self, weights, token, pos, caches, key, step,
                        temperature, top_k, top_p):
        import jax

        from .sampling import sample_logits

        logits, new_caches = self._step_fn(weights, token, pos, caches)
        tok = sample_logits(logits[:, 0, :], jax.random.fold_in(key, step),
                            temperature, top_k, top_p,
                            cap=self._sample_cap)
        return tok, new_caches

    def _build_decode_block(self, k_steps: int, kv_prefix=None,
                            sample_cap=None, pallas_attn=False):
        """jit a K-token decode loop: `lax.scan` over the single-token
        step (sampling fused), so K tokens cost ONE host dispatch
        instead of K. On the relay-attached chip each dispatch is a full
        ~26 ms RTT (docs/PERF.md) while the step itself is ~1 ms of
        device work — the host loop, not the model, was the decode
        bottleneck. Early exit (eos) is handled by the caller masking
        the fetched [N, K] tokens; rows past their end decode garbage
        that is discarded, the same waste profile as padding.

        PRNG parity: step i of the block folds `step0 + i`, the exact
        numbering the per-token path uses, so blocked and step-by-step
        decode produce identical token streams for the same seed.

        The block also returns the final carry token as a separate [N]
        device array so the NEXT block can be dispatched chained
        device-to-device — the caller never has to fetch tokens before
        enqueueing more work (the pipelined serving loop hides the
        ~26 ms relay fetch RTT under the next block's device time).
        """
        import jax
        import jax.numpy as jnp

        from .sampling import sample_logits

        last = self._window - 1

        def block_fn(weights, token, pos, caches, key, step0,
                     temperature, top_k, top_p):
            # clamp the FED positions too: a chained dispatch advances
            # pos blindly by K per block, so a finished/garbage row may
            # arrive past the window — its writes must stay in bounds
            pos = jnp.minimum(pos, last)

            def body(carry, i):
                tok, p, c = carry
                logits, c = self._step_fn(
                    weights, tok.astype(jnp.float32)[:, None], p, c,
                    kv_prefix=kv_prefix)
                nxt = sample_logits(logits[:, 0, :],
                                    jax.random.fold_in(key, step0 + i),
                                    temperature, top_k, top_p,
                                    cap=sample_cap)
                # clamp: an overrun tail (host discards it) must not
                # index past the compiled window
                return (nxt, jnp.minimum(p + 1, last), c), nxt

            (last_tok, _, caches), toks = jax.lax.scan(
                body, (token, pos, caches),
                jnp.arange(k_steps, dtype=jnp.int32))
            return jnp.transpose(toks), last_tok, caches  # [N,K], [N]

        def block_fn_scratch(weights, token, pos, caches, key, step0,
                             temperature, top_k, top_p):
            pos = jnp.minimum(pos, last)
            pos0 = pos
            n = token.shape[0]
            scratches = {}
            for name, info in self._mha_ops:
                h = info["num_heads"]
                kv = info.get("num_kv_heads", h)
                d = info.get("head_dim", info["embed_dim"] // h)
                z = jnp.zeros((n, kv, k_steps, d), self._kv_store)
                scratches[name] = (z, z)

            def body(carry, i):
                tok, p, scr = carry
                logits, scr = self._step_fn_scratch(
                    weights, tok.astype(jnp.float32)[:, None], p,
                    caches, scr, i, pos0, kv_prefix=kv_prefix,
                    pallas_attn=pallas_attn)
                nxt = sample_logits(logits[:, 0, :],
                                    jax.random.fold_in(key, step0 + i),
                                    temperature, top_k, top_p,
                                    cap=sample_cap)
                return (nxt, jnp.minimum(p + 1, last), scr), nxt

            (last_tok, _, scratches), toks = jax.lax.scan(
                body, (token, pos, scratches),
                jnp.arange(k_steps, dtype=jnp.int32))
            merged = {name: self._scratch_merge(
                caches[name], scratches[name], pos0, k_steps,
                ring=self._op_ring(info))
                for name, info in self._mha_ops}
            return jnp.transpose(toks), last_tok, merged

        return jax.jit(block_fn_scratch if self._scratch_blocks
                       else block_fn, donate_argnums=(3,))

    def _get_prefill_install(self, cap):
        """Jitted fused admission for a given (static) sample cap:
        batched prefill + on-device sampling + scatter-install into the
        (donated) pool rows — ONE dispatch where the serving loop used
        to pay two relay RTTs per admission wave (prefill_sample, then
        install_rows). One executable per cap value so the serving loop
        can flip capped/uncapped per admission wave."""
        import jax

        fn = self._prefill_install_fns.get(cap)
        if fn is not None:
            return fn

        def install_fn(weights, tokens, last_pos, key, step,
                       temperature, top_k, top_p, pool, rows):
            tok, caches = self._prefill_sample_impl(
                weights, tokens, last_pos, key, step, temperature,
                top_k, top_p, cap)
            # bucketed prefill writes only its width's positions; the
            # row's stale tail (>= width) is never read before decode
            # overwrites it (the position mask stops at each row's pos)
            pool = jax.tree_util.tree_map(
                lambda a, b: a.at[rows, :, :b.shape[2]].set(
                    b.astype(a.dtype), mode="drop"),
                pool, caches)
            return tok, pool

        fn = jax.jit(install_fn, donate_argnums=(8,))
        self._prefill_install_fns[cap] = fn
        return fn

    @staticmethod
    def _install_fn(pool, new, row):
        """Write a prefilled batch-1 cache into row `row` of a slot-pool
        cache (serving/llm.py admission) — one donated dispatch."""
        import jax

        return jax.tree_util.tree_map(
            lambda a, b: jax.lax.dynamic_update_slice_in_dim(
                a, b.astype(a.dtype), row, axis=0), pool, new)

    @staticmethod
    def _install_rows_fn(pool, new, rows):
        """Scatter a batch-S prefilled cache into rows `rows` of a
        slot-pool cache in ONE donated dispatch (batched admission,
        serving/llm.py). rows[j] >= slots drops row j (padding)."""
        import jax

        return jax.tree_util.tree_map(
            lambda a, b: a.at[rows].set(b.astype(a.dtype), mode="drop"),
            pool, new)

    def _slice_seq(self, args, pos, width: int = 1):
        """Align operands on the sequence axis: a graph constant
        spanning the full window (position embeddings) is gathered down
        to each row's positions pos..pos+width-1 when the running
        activation has seq len `width` (1 for single-token decode,
        K for chunk verification)."""
        import jax.numpy as jnp

        lens = [a.shape[1] if (a is not None and a.ndim == 3) else None
                for a in args]
        # graph constants span the MODEL's compiled seq_len — which is
        # longer than self._window under a tiered window override
        mw = self._model_window
        if width in lens and mw in lens and width != mw:
            args = list(args)
            n = pos.shape[0]
            idx = jnp.minimum(
                pos[:, None] + jnp.arange(width, dtype=pos.dtype),
                mw - 1)                                    # [N, W]
            for i, a in enumerate(args):
                if lens[i] == mw:
                    full = jnp.broadcast_to(a, (n,) + a.shape[1:])
                    args[i] = jnp.take_along_axis(
                        full, idx[:, :, None], axis=1)
        return args

    def _step_fn(self, weights, token, pos, caches, kv_prefix=None):
        new_caches = dict(caches)
        env = {self._in_name: token}
        for impl, ins, outs in self._plan:
            w = weights.get(impl.name, {})
            if impl.type in ("nn.MultiheadAttention",
                             "si.RotaryAttention"):
                info = dict(impl.decode_info)
                dec = (self._rope_decode if info.get("rotary")
                       else self._mha_decode)
                out, new_caches[impl.name] = dec(
                    w, env[ins[0]], caches[impl.name], pos, info,
                    kv_prefix=kv_prefix)
                env[outs[0]] = out
                for o in outs[1:]:
                    env[o] = None
                continue
            args = [env[n] for n in ins]
            if len(args) > 1:
                args = self._slice_seq(args, pos)
            r = impl.apply(w, *args)
            if impl.n_outputs == 1:
                env[outs[0]] = r
            else:
                for o, v in zip(outs, r):
                    env[o] = v
        return env[self._out_name], new_caches

    def _attn_chunk(self, w, x, cache, pos, info):
        """K-token chunk decode for one attention op: project/rotate the
        chunk, append its K k/v entries at positions pos..pos+K-1, and
        attend each chunk query q_i over cache positions <= pos+i (the
        banded-causal continuation of the cache). The multi-token analog
        of _mha_decode/_rope_decode — the substrate of speculative
        verification (zoo/speculative.py) and chunked long-prompt
        prefill: one dispatch scores K positions against the cache."""
        import jax
        import jax.numpy as jnp

        from ..ops.attention import apply_rope, rope_cos_sin
        from ..quant.tensor import proj_nlo, resolve_weight

        heads = info["num_heads"]
        kvh = info.get("num_kv_heads", heads)
        d = info.get("head_dim", info["embed_dim"] // heads)
        group = heads // kvh
        dt = x.dtype
        n, k = x.shape[0], x.shape[1]

        def proj(key, h):
            y = proj_nlo(x, w[f"w{key}"], dt)
            if f"b{key}" in w:
                y = y + w[f"b{key}"]
            return jnp.transpose(y.astype(dt).reshape(n, k, h, d),
                                 (0, 2, 1, 3))          # [N, H, K, D]

        qh, kh, vh = proj("q", heads), proj("k", kvh), proj("v", kvh)
        from ..ops.attention import apply_qk_norm

        qh, kh = apply_qk_norm(qh, kh, w,
                               info.get("qk_norm_eps", 1e-6))
        positions = jnp.minimum(
            pos[:, None] + jnp.arange(k, dtype=jnp.int32),
            self._window - 1)                            # [N, K]
        if info.get("rotary"):
            cos, sin = rope_cos_sin(positions,
                                    info.get("rotary_dim") or d,
                                    info["rope_theta"])  # [N, K, R]
            il = bool(info.get("rope_interleaved"))
            qh = apply_rope(qh, cos[:, None], sin[:, None],
                            interleaved=il)
            kh = apply_rope(kh, cos[:, None], sin[:, None],
                            interleaved=il)

        # append the chunk: window position p takes chunk slot p - pos
        # (the _scratch_merge gather, applied immediately); ring ops
        # write slot (pos + j) % R
        ring = self._op_ring(info)
        length = jax.tree_util.tree_leaves(cache)[0].shape[2]
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (n, 1, length, 1), 2)
        off = idx - pos[:, None, None, None]
        if ring is not None:
            off = jnp.remainder(off, ring)
        win = (off >= 0) & (off < k)
        offc = jnp.clip(off, 0, k - 1)

        def merge(chunk, cache_leaf, quantized):
            # chunk [N, KV, K, D] -> window layout [N, KV, L, D]
            g = jnp.take_along_axis(chunk, offc, axis=2)
            if quantized:
                cq, cs, = cache_leaf
                gq, gs = _kv_quantize(g)
                return (jnp.where(win, gq, cq), jnp.where(win, gs, cs))
            return jnp.where(win, g.astype(cache_leaf.dtype), cache_leaf)

        if self._kv_int8:
            k_q, k_s, v_q, v_s = cache
            k_leaf = merge(kh, (k_q, k_s), True)
            v_leaf = merge(vh, (v_q, v_s), True)
            new_cache = (*k_leaf, *v_leaf)
        else:
            k_cache, v_cache = cache
            k_leaf = merge(kh, k_cache, False)
            v_leaf = merge(vh, v_cache, False)
            new_cache = (k_leaf, v_leaf)

        s = self._attn_scores(qh, k_leaf, group, dt)     # [N, H, K, L]
        s = s * (info.get("attn_scale") or 1.0 / (d ** 0.5))
        softcap = info.get("logit_softcap")
        if softcap is not None:          # gemma2 tanh logit capping
            s = jnp.tanh(s / softcap) * softcap
        l_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        if info.get("alibi"):   # window position IS the absolute key
            # position (alibi excludes sliding, so ring is None here)
            from ..ops.attention import resolve_alibi_slopes

            s = s + (jnp.asarray(resolve_alibi_slopes(info))[
                None, :, None, None] * l_idx.astype(jnp.float32))
        sw = info.get("sliding_window")
        if ring is not None:
            # after the chunk append, ring slot s holds the latest
            # position <= pos+k-1 mapping to s; each chunk query bands
            # and causally masks against those absolute positions
            top = (pos + k - 1)[:, None, None, None]
            p_abs = top - jnp.remainder(top - l_idx, ring)
            q_pos = positions[:, None, :, None]
            keep = (p_abs >= 0) & (p_abs <= q_pos) & (p_abs > q_pos - sw)
        else:
            keep = l_idx <= positions[:, None, :, None]
            if sw is not None:
                keep &= l_idx > (positions - sw)[:, None, :, None]
        s = jnp.where(keep, s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        ctx = self._attn_ctx(p, v_leaf, group, dt)       # [N, H, K, D]
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(n, k, heads * d)
        out = self._proj_out(w, ctx, dt, heads)
        return out.astype(dt), new_cache

    def _chunk_fn(self, weights, tokens, pos, caches):
        """Plan walk at chunk width K: tokens [N, K] fed at positions
        pos..pos+K-1, every attention op appends K cache entries.
        Returns (logits [N, K, V], new caches)."""
        new_caches = dict(caches)
        env = {self._in_name: tokens}
        width = tokens.shape[1]
        for impl, ins, outs in self._plan:
            w = weights.get(impl.name, {})
            if impl.type in ("nn.MultiheadAttention",
                             "si.RotaryAttention"):
                out, new_caches[impl.name] = self._attn_chunk(
                    w, env[ins[0]], caches[impl.name], pos,
                    dict(impl.decode_info))
                env[outs[0]] = out
                for o in outs[1:]:
                    env[o] = None
                continue
            args = [env[n] for n in ins]
            if len(args) > 1:
                args = self._slice_seq(args, pos, width)
            r = impl.apply(w, *args)
            if impl.n_outputs == 1:
                env[outs[0]] = r
            else:
                for o, v in zip(outs, r):
                    env[o] = v
        return env[self._out_name], new_caches

    def decode_chunk_verify(self, tokens, pos, caches):
        """Feed K tokens per row THROUGH the cache in ONE dispatch and
        return each position's GREEDY next token: (greedy [N, K] int32,
        new caches with the K entries appended at pos..pos+K-1).

        The speculative-verification substrate (zoo/speculative.py):
        tokens[:, 0] is each row's last accepted token, tokens[:, 1:]
        a draft's proposals; greedy[:, i] is the target model's
        prediction after consuming tokens[:, :i+1], so the caller
        accepts the longest matching prefix and takes greedy at the
        first mismatch as the corrected token. Appended entries past
        the accepted position are STALE but harmless — the position
        mask never reads past each row's pos, and later appends
        overwrite them (rejection rollback is free with static
        shapes). Also serves as chunked prefill continuation for
        prompts longer than one admission bucket. One executable per
        chunk width K."""
        import jax
        import jax.numpy as jnp

        k = int(np.asarray(tokens).shape[1]) if not hasattr(
            tokens, "shape") else int(tokens.shape[1])
        if not 1 <= k <= self._window:
            raise ValueError(f"chunk width must be in [1, "
                             f"{self._window}], got {k}")
        if self._has_ring and k > self.RING_HEADROOM:
            raise ValueError(
                f"verify chunks over ring-stored sliding caches are "
                f"limited to {self.RING_HEADROOM} tokens, got {k}")
        fn = self._chunk_fns.get(k)
        if fn is None:
            def verify_fn(weights, toks, p, caches):
                logits, new_caches = self._chunk_fn(weights, toks, p,
                                                    caches)
                return (jnp.argmax(logits, axis=-1).astype(jnp.int32),
                        new_caches)

            fn = self._chunk_fns[k] = jax.jit(verify_fn,
                                              donate_argnums=(3,))
        return fn(self._weights, jnp.asarray(tokens, jnp.float32),
                  jnp.asarray(pos, jnp.int32), caches)

    # ---- user API -------------------------------------------------------
    def step(self, tokens, pos, caches):
        """One decode step: tokens [N, 1], pos [N] per-row positions.
        Returns (logits [N, 1, V], new caches). The raw substrate the
        continuous-batching service (serving/llm.py) drives."""
        import jax.numpy as jnp

        return self._step(self._weights,
                          jnp.asarray(tokens, jnp.float32),
                          jnp.asarray(pos, jnp.int32), caches)

    def prefill(self, tokens, lengths):
        """Batched prompt prefill in ONE dispatch: tokens [N, L] padded
        to the full window, lengths [N] real prompt lengths. Returns
        (last_logits [N, V] at each row's final prompt position, caches
        ready for decode at pos=length). Causality guarantees padding
        cannot leak into the returned logits."""
        import jax.numpy as jnp

        tokens = np.asarray(tokens)
        if tokens.shape[1] != self._window:
            raise ValueError(f"prefill tokens must span the compiled "
                             f"window [N, {self._window}], got "
                             f"{tokens.shape}")
        last_pos = jnp.asarray(np.asarray(lengths) - 1, jnp.int32)
        return self._prefill_logits(self._weights,
                                    jnp.asarray(tokens, jnp.float32),
                                    last_pos)

    def prefill_sample(self, tokens, lengths, key, step,
                       temperature, top_k, top_p):
        """prefill + on-device sampling of the first new token: returns
        (token [N] int32, caches). One dispatch per admitted request —
        the serving admission path (serving/llm.py)."""
        import jax.numpy as jnp

        last_pos = jnp.asarray(np.asarray(lengths) - 1, jnp.int32)
        return self._prefill_sample(
            self._weights, jnp.asarray(tokens, jnp.float32), last_pos,
            key, jnp.int32(step), jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_k, jnp.int32),
            jnp.asarray(top_p, jnp.float32))

    def step_sample(self, tokens, pos, caches, key, step,
                    temperature, top_k, top_p):
        """One decode step returning the SAMPLED token [N] int32 instead
        of logits — the sampler fuses into the step executable and only
        one int per row crosses the host link."""
        import jax.numpy as jnp

        return self._step_sample(
            self._weights, jnp.asarray(tokens, jnp.float32),
            jnp.asarray(pos, jnp.int32), caches, key, jnp.int32(step),
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_k, jnp.int32),
            jnp.asarray(top_p, jnp.float32))

    @property
    def kernel_ok(self) -> bool:
        """True when the per-row flash-decoding kernel path is usable
        on this decoder (scratch mode, single device, no sliding
        windows, no logit softcapping, no ALiBi — the kernel's online
        softmax has no tanh or position-bias hook) — the serving
        loop's auto attention policy checks this before dispatching a
        kernel block."""
        return (self._scratch_blocks and self._mesh is None
                and not any((info or {}).get("sliding_window")
                            or (info or {}).get("logit_softcap")
                            or (info or {}).get("alibi")
                            for _, info in self._mha_ops))

    def decode_block(self, tokens, pos, caches, key, step0, temperature,
                     top_k, top_p, k_steps: int,
                     kv_prefix: int | None = None,
                     sample_cap="default", attn_impl="default"):
        """K decode steps in ONE dispatch: tokens [N] (the last sampled
        token per row — a host array OR a device array from a previous
        block/prefill, enabling device-to-device chaining), pos [N]
        (its position). Returns (sampled tokens [N, K] int32, last
        token [N] int32 device array, new caches). One executable per
        distinct (K, kv_prefix), cached on the decoder. The caller masks
        the fetched tokens for eos/deadline host-side — tokens past a
        row's end are garbage by construction and must be discarded.

        kv_prefix: STATIC bound on the attention read — the step reads
        only the first kv_prefix cache positions instead of the whole
        compiled window (the KV read is the window-scaled decode cost,
        docs/PERF.md). Token-exact iff every LIVE row satisfies
        pos + k_steps <= kv_prefix (all its valid cache entries and all
        the block's appends land inside the prefix); rows the caller is
        going to discard may exceed it. The cache pytree keeps its full
        shape — only the reads narrow — so executables with different
        prefixes chain freely over the same pool.

        sample_cap: per-BLOCK override of the decoder's sampler cap —
        "default" uses the decoder's, None forces the exact full-vocab
        sampler, an int forces that cap. One executable per distinct
        (k_steps, kv_prefix, cap, attn); the serving loop flips this
        per dispatch so a pool of greedy/top-k rows rides the capped
        fast path while a nucleus-only row forces the exact path
        (serving/llm.py auto mode).

        attn_impl: per-BLOCK frozen-cache attention implementation —
        "default" uses the decoder's decode_attn, "xla"/"pallas" force
        a path (pallas requires kernel_ok). The serving auto policy
        dispatches rung-sliced XLA blocks while a rung covers the pool
        and flips to the per-row kernel when an aged row blocks every
        rung (measured 2.52x on a mixed-age slots-32 pool at w2048,
        docs/PERF.md)."""
        import jax.numpy as jnp

        if kv_prefix is not None:
            kv_prefix = int(kv_prefix)
            if not 1 <= kv_prefix <= self._window:
                raise ValueError(
                    f"kv_prefix must be in [1, {self._window}], got "
                    f"{kv_prefix}")
            if kv_prefix == self._window:
                kv_prefix = None
        if self._has_ring and int(k_steps) > self.RING_HEADROOM:
            raise ValueError(
                f"decode blocks over ring-stored sliding caches are "
                f"limited to {self.RING_HEADROOM} steps, got {k_steps}")
        cap = self._sample_cap if sample_cap == "default" \
            else (None if sample_cap is None else int(sample_cap))
        if attn_impl == "default":
            pallas_attn = self._pallas_decode
        elif attn_impl in ("xla", "pallas"):
            pallas_attn = attn_impl == "pallas"
        else:
            raise ValueError(f"attn_impl must be 'default', 'xla' or "
                             f"'pallas', got {attn_impl!r}")
        if pallas_attn and not self.kernel_ok:
            raise ValueError("attn_impl='pallas' needs scratch_blocks, "
                             "a single device and no sliding windows")
        kb = (int(k_steps), kv_prefix, cap, pallas_attn)
        fn = self._block_fns.get(kb)
        if fn is None:
            fn = self._block_fns[kb] = self._build_decode_block(
                int(k_steps), kv_prefix, cap, pallas_attn)
        return fn(self._weights,
                  jnp.asarray(tokens, jnp.int32).reshape(-1),
                  jnp.asarray(pos, jnp.int32), caches, key,
                  jnp.int32(step0),
                  jnp.asarray(temperature, jnp.float32),
                  jnp.asarray(top_k, jnp.int32),
                  jnp.asarray(top_p, jnp.float32))

    def merge_tokens(self, carry, admitted, rows):
        """Scatter freshly admitted rows' first tokens (prefill_install
        output, slot order) into the pool-order token vector `carry` —
        ONE tiny async dispatch, so the first decode block after an
        admission can be enqueued chained without fetching the
        prefill's sampled tokens first (pipelined serving loop).
        rows[j] >= len(carry) drops entry j (padding)."""
        import jax.numpy as jnp

        return self._merge(jnp.asarray(carry, jnp.int32).reshape(-1),
                           admitted, jnp.asarray(rows, jnp.int32))

    def install_row(self, pool_caches, row_caches, row: int):
        """Scatter a batch-1 prefilled cache into row `row` of a pooled
        cache (one donated dispatch)."""
        import jax.numpy as jnp

        return self._install(pool_caches, row_caches, jnp.int32(row))

    def install_rows(self, pool_caches, batch_caches, rows):
        """Scatter a batch-S prefilled cache into the given pool rows in
        ONE donated dispatch; rows[j] >= pool size marks row j as
        padding and is dropped."""
        import jax.numpy as jnp

        return self._install_rows(pool_caches, batch_caches,
                                  jnp.asarray(rows, jnp.int32))

    def prefill_install(self, tokens, lengths, key, step, temperature,
                        top_k, top_p, pool_caches, rows,
                        sample_cap="default"):
        """Fused admission: batched prefill + on-device sampling of the
        first new token + scatter-install into `rows` of the (donated)
        pool cache, all in ONE dispatch (serving/llm.py pays one relay
        RTT per admission wave instead of two). rows[j] >= pool size
        drops row j (padding). Returns (token [N] int32, pool caches).
        Numerically identical to prefill_sample + install_rows.
        sample_cap: per-WAVE sampler-cap override, same contract as
        decode_block's (one executable per cap value).

        tokens may be [N, W] for any bucket width W <= the compiled
        window (the serving prefill ladder): the prefill plan runs at
        width W (a fraction of the full-window FLOPs/bytes), the
        install writes only the first W cache positions, and causality
        makes each row's sampled token independent of the padding
        width — one executable per (W, cap)."""
        import jax.numpy as jnp

        if not hasattr(tokens, "shape"):
            tokens = np.asarray(tokens)
        width = int(tokens.shape[1])
        if width > self._window:
            raise ValueError(f"prefill tokens width {width} exceeds the "
                             f"compiled window {self._window}")
        if int(np.max(np.asarray(lengths))) > width:
            raise ValueError("a row's length exceeds the prefill bucket "
                             "width")
        cap = self._sample_cap if sample_cap == "default" \
            else (None if sample_cap is None else int(sample_cap))
        last_pos = jnp.asarray(np.asarray(lengths) - 1, jnp.int32)
        return self._get_prefill_install(cap)(
            self._weights, jnp.asarray(tokens, jnp.float32), last_pos,
            key, jnp.int32(step), jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_k, jnp.int32),
            jnp.asarray(top_p, jnp.float32), pool_caches,
            jnp.asarray(rows, jnp.int32))

    def generate(self, prompt_ids, steps: int,
                 eos_id: int | None = None, *, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0,
                 seed: int = 0, block: int | None = None) -> np.ndarray:
        """Decode with the KV cache: the whole prompt prefills in one
        dispatch, then tokens are generated in device-side blocks of
        `block` steps per dispatch (decode_block — the host loop pays
        one relay RTT per BLOCK, not per token). temperature<=0
        (default) is greedy; otherwise on-device temperature/top-k/top-p
        sampling seeded by `seed`. block=None picks min(32, steps-1);
        block=1 reproduces the per-token path dispatch-for-dispatch.
        Token streams are identical for any block size (same PRNG
        fold numbering).

        Without an eos_id the block count is known up front, so EVERY
        block is enqueued back-to-back (each chained device-to-device
        from the previous block's last token) before any result is
        fetched — the device never idles on the fetch RTT. With eos_id
        the loop stays sequential (fetch, check, dispatch) so no work
        runs past the stop token."""
        import jax

        prompt = np.asarray(prompt_ids)
        n, p = prompt.shape
        if p + steps > self._window:
            raise ValueError(f"prompt ({p}) + steps ({steps}) exceeds "
                             f"the compiled window {self._window}")
        cap = self._sample_cap
        if (cap is not None and temperature > 0.0
                and not 0 < top_k <= cap and not self._trunc_warned):
            # nucleus-only (or oversized top_k) under a cap: the draw
            # truncates to the top-cap candidates (sampling.py). Warn
            # once per decoder, like the serving loop does.
            self._trunc_warned = True
            import logging

            logging.getLogger(__name__).warning(
                "sample_cap=%d truncates this draw: top_k=%d is outside "
                "the exact regime 0 < top_k <= cap; further occurrences "
                "are not logged", cap, top_k)
        t_arr = np.full(n, temperature, np.float32)
        k_arr = np.full(n, top_k, np.int32)
        p_arr = np.full(n, top_p, np.float32)
        key = jax.random.PRNGKey(seed)
        blk = int(block) if block else max(1, min(32, steps - 1))

        buf = np.zeros((n, p + steps), np.int64)
        buf[:, :p] = prompt
        done = np.zeros(n, bool)
        window = np.zeros((n, self._window), np.float32)
        window[:, :p] = prompt
        tok, caches = self.prefill_sample(window, np.full(n, p), key, 0,
                                          t_arr, k_arr, p_arr)

        if eos_id is None:
            # pipelined: enqueue prefill + all blocks, then fetch
            handles = []
            last_dev, fed, step_no, rem = tok, p, 1, steps - 1
            while rem > 0:
                toks_d, last_dev, caches = self.decode_block(
                    last_dev, np.full(n, fed, np.int32), caches, key,
                    step_no, t_arr, k_arr, p_arr, blk)
                handles.append(toks_d)
                step_no += blk
                fed += blk
                rem -= blk
            buf[:, p] = np.asarray(tok)
            if handles:            # steps == 1: only the prefill token
                flat = [np.asarray(h) for h in handles]  # [N, blk] each
                gen = np.concatenate(flat, axis=1)[:, :steps - 1]
                buf[:, p + 1:] = gen
            return buf

        pending = [np.asarray(tok)]   # raw sampled tokens, FIFO
        last_raw = pending[0]         # last device-sampled token [N]
        t = p                         # next buf position to fill
        step_no = 1                   # PRNG fold counter (prefill = 0)
        while t < p + steps:
            if not pending:
                toks, _last, caches = self.decode_block(
                    last_raw, np.full(n, t - 1, np.int32), caches, key,
                    step_no, t_arr, k_arr, p_arr, blk)
                toks = np.asarray(toks)
                step_no += blk
                last_raw = toks[:, -1]
                pending = [toks[:, j] for j in range(blk)]
            nxt = pending.pop(0)
            buf[:, t] = np.where(done, 0, nxt)
            if eos_id is not None:
                done |= (nxt == eos_id)
                if done.all():
                    return buf[:, :t + 1]
            t += 1
        return buf
