"""Continuous-batching text generation service.

The LLM analog of serving/batcher.py's image service: a fixed pool of
`slots` rows steps through ONE jitted KV-cache decode executable
(zoo/generate.CachedDecoder), and requests are admitted into free rows
MID-FLIGHT — a new prompt prefills while neighbours are deep in decode
(per-row positions make the step batch heterogeneous). This is the
orca/vllm-style scheduling shape, expressed with static XLA shapes: the
step batch is always [slots, 1], caches are [slots, H, L, D] donated
buffers, and admission is a batched prefill (ONE dispatch for the whole
prompt — each dispatch costs a full relay RTT on this chip,
docs/PERF.md) scattered into the free row.

Sampling (temperature / top-k / top-p, zoo/sampling.py) runs on device
inside the step executable with PER-ROW parameters, so greedy and
sampled requests share one step batch and only one int per row crosses
the host link per step.

No preemption/paging: a request holds its row until done (bounded by
the compiled window), which matches the engine's static-shape design.
The reference (zpye/SimpleInfer) has no serving layer at all — this
whole module is superset capability (SURVEY.md §5).
"""
from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np


@dataclass
class _GenRequest:
    prompt: np.ndarray          # [P] int
    max_new: int
    eos_id: int | None
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=time.perf_counter)
    # streaming: accepted tokens are pushed here as the scheduler
    # discovers them (block granularity); None marks completion
    stream_q: object | None = None
    # set by GenerationService.cancel: an active row is freed at the
    # next drain (its future resolves with the tokens accepted so far)
    cancelled: bool = False
    # absolute perf_counter deadline (submit timeout_s); an expired
    # ACTIVE request resolves with its partial tokens, an expired
    # QUEUED request fails with TimeoutError at admission time
    deadline_s: float | None = None
    # admission priority: higher admits first; FIFO within a class
    # (queue insertion keeps arrival order stable)
    priority: int = 0


@dataclass
class GenStats:
    requests: int = 0
    completed: int = 0
    steps: int = 0
    prefills: int = 0
    tokens_out: int = 0
    occupancy_sum: float = 0.0
    latency_sum_ms: float = 0.0
    # decode steps dispatched on the capped-sampler fast path (auto
    # mode picks it per block whenever every live row is greedy or
    # 0 < top_k <= cap — distribution-exact by sampling.py's contract)
    capped_steps: int = 0
    # requests cancelled mid-flight (their rows freed early); queued
    # cancels don't count (never admitted)
    cancelled: int = 0
    # requests that hit their submit(timeout_s) deadline (active rows
    # freed with partial results; queued ones failed with TimeoutError)
    timed_out: int = 0

    @property
    def mean_occupancy(self) -> float:
        return self.occupancy_sum / max(1, self.steps)

    @property
    def mean_latency_ms(self) -> float:
        return self.latency_sum_ms / max(1, self.completed)


class StreamHandle:
    """Iterator over one request's generated tokens (submit_stream).

    Yields int token ids as the scheduler accepts them; iteration ends
    when the request completes (eos/deadline). `result(timeout)`
    returns the full [prompt + generated] np array (blocks until
    done). If the request errored, iteration and result() raise."""

    def __init__(self, req: _GenRequest):
        self._req = req
        self.future = req.future

    def __iter__(self):
        q = self._req.stream_q
        while True:
            tok = q.get()
            if tok is None:
                if self.future.exception() is not None:
                    raise self.future.exception()
                return
            yield tok

    def result(self, timeout: float | None = None) -> np.ndarray:
        return self.future.result(timeout=timeout)


class GenerationService:
    """Slot-scheduled generation over one causal-LM engine.

    usage:
        svc = GenerationService(engine, slots=8).start()
        fut = svc.submit([1, 5, 9], max_new=32, eos_id=2,
                         temperature=0.8, top_k=40)
        ids = fut.result()            # np.int64 [P + generated]
        svc.stop()

    Greedy requests (temperature=0, the default) are deterministic and
    batch-invariant up to f32 summation order: the default fast paths
    (scratch_blocks, kv_prefix rungs) split/shorten reduces at block
    boundaries, so logits match the bit-stable substrate to ulp —
    tests pin token equality empirically; construct with
    scratch_blocks=False, kv_prefix_ladder=None for the bit-stable
    path. Sampled requests draw from the service-level seed stream;
    their draws depend on admission timing (and, in auto cap mode, on
    which sampler variant each block dispatched), so per-request
    reproducibility under concurrency is not guaranteed (use
    CachedDecoder.generate(seed=...) for that).
    """

    #: default sampler cap for `sample_cap="auto"` — top-64 covers the
    #: common serving regimes (greedy, top_k <= 64) exactly and
    #: measured 2.32x on the 0.9B decode step (docs/PERF.md)
    DEFAULT_SAMPLE_CAP = 64
    #: smallest pool where decode_attn="auto" may dispatch the per-row
    #: flash-decoding kernel: at slots 8 the kernel's per-invocation
    #: overhead loses to XLA (0.87x), at slots 32 it wins 2.52x on
    #: aged pools (docs/PERF.md round-3 A/Bs) — crossover set between
    KERNEL_MIN_SLOTS = 16

    def __init__(self, engine, slots: int = 8,
                 tick_timeout_s: float = 0.01, seed: int = 0,
                 decode_horizon: int = 1,
                 adaptive_horizon: bool = False,
                 pipelined: bool = True,
                 kv_dtype: str | None = None,
                 scratch_blocks: bool = True,
                 sample_cap: int | None | str = "auto",
                 kv_prefix_ladder: tuple | list | str | None = "auto",
                 prefill_ladder: tuple | list | str | None = "auto",
                 decode_attn: str = "auto",
                 window: int | None = None):
        import jax

        from ..zoo.generate import CachedDecoder

        # kv_dtype: KV-cache storage (float32/bfloat16/int8) — fewer
        # cache bytes = faster KV-bound decode (bfloat16) or longer
        # windows per HBM byte (int8).
        #
        # scratch_blocks (DEFAULT ON since round-3): decode blocks stop
        # rewriting the big cache every step — measured 1.66-1.74x at
        # 0.9B/w2048 (docs/PERF.md). Token streams are mathematically
        # identical to the per-step path but not bit-guaranteed across
        # block sizes (the frozen+scratch softmax splits the f32
        # summation); pass False for the bit-stable substrate.
        #
        # sample_cap: "auto" (DEFAULT) picks the capped sampler
        # (DEFAULT_SAMPLE_CAP candidates via lax.top_k, 2.32x at 0.9B)
        # PER DISPATCH whenever every live row is greedy or has
        # 0 < top_k <= cap — distribution-exact by sampling.py's
        # contract — and falls back to the exact full-vocab sampler for
        # blocks where a nucleus-only/large-top_k row is live (no
        # truncation ever happens in auto mode). An int forces that cap
        # for every dispatch (out-of-regime rows truncate, one warning);
        # None forces the full-vocab sampler.
        if isinstance(sample_cap, str):
            if sample_cap != "auto":
                raise ValueError(f"sample_cap must be an int, None or "
                                 f"'auto', got {sample_cap!r}")
            self._cap_mode = "auto"
            self._cap = self.DEFAULT_SAMPLE_CAP
        elif sample_cap is None:
            self._cap_mode, self._cap = "off", None
        else:
            self._cap_mode, self._cap = "fixed", int(sample_cap)
        # note: a cap >= the vocabulary is the exact sampler anyway
        # (sampling.py ignores it), so auto mode is safe at any vocab;
        # the capped/uncapped executables then lower to identical HLO
        # and the persistent compile cache dedupes them
        # decode_attn:
        # - "xla" (default): rung-sliced XLA attention reads only.
        # - "pallas": EVERY block runs the per-row flash-decoding
        #   kernel (kernels/decode_attn); the pool-global rung ladder
        #   is superseded, so the auto ladder is dropped.
        # - "auto" (DEFAULT): dispatch rung-sliced XLA blocks while a
        #   rung covers the pool, and flip to the per-row kernel when
        #   an aged row blocks every rung AND the pool is >=
        #   KERNEL_MIN_SLOTS — the measured crossover policy (kernel
        #   2.52x on a mixed-age slots-32 pool at w2048; 0.87x of
        #   rungs at slots 8, docs/PERF.md round-3). Below the
        #   threshold (or scratch off / TP mesh / sliding windows)
        #   auto degrades to plain "xla".
        if decode_attn not in ("xla", "pallas", "auto"):
            raise ValueError(f"decode_attn must be 'xla', 'pallas' or "
                             f"'auto', got {decode_attn!r}")
        # window: cache-length cap below the model's seq_len — the
        # tiered-pool memory knob (TieredGenerationService): a short
        # tier's slots allocate window-sized caches, and submit()
        # rejects rows that could outgrow them
        self._dec = CachedDecoder(
            engine, kv_dtype=kv_dtype, scratch_blocks=scratch_blocks,
            sample_cap=self._cap if self._cap_mode == "fixed" else None,
            decode_attn="pallas" if decode_attn == "pallas" else "xla",
            window=window)
        self._attn_auto = (decode_attn == "auto"
                           and slots >= self.KERNEL_MIN_SLOTS
                           and self._dec.kernel_ok)
        if decode_attn == "pallas" and kv_prefix_ladder == "auto":
            kv_prefix_ladder = None
        self._cap_warned = False
        # kv_prefix_ladder: ascending static attention-read bounds
        # (e.g. (128, 256)); each block dispatches the smallest rung
        # covering max(live pos) + K, so young pools read a fraction
        # of the window's KV bytes (CachedDecoder.decode_block
        # kv_prefix — rung choice keeps every live read covered).
        # "auto" (DEFAULT) = {window/8, window/4, window/2} rungs >= 64
        # (1.89x on a young 0.9B pool at w2048, docs/PERF.md); None =
        # every block reads the full window.
        window = self._dec._window
        if isinstance(kv_prefix_ladder, str):
            if kv_prefix_ladder != "auto":
                raise ValueError(f"kv_prefix_ladder must be a sequence, "
                                 f"None or 'auto', got {kv_prefix_ladder!r}")
            ladder = sorted({p for p in (window // 8, window // 4,
                                         window // 2) if p >= 64})
        else:
            if isinstance(kv_prefix_ladder, int):
                kv_prefix_ladder = (kv_prefix_ladder,)
            ladder = sorted(int(p) for p in (kv_prefix_ladder or ()))
            if any(not 1 <= p <= window for p in ladder):
                raise ValueError(f"kv_prefix_ladder entries must be in "
                                 f"[1, {window}], got {ladder}")
        self._prefix_ladder = [p for p in ladder if p < window]
        # prefill_ladder: admission BUCKET widths — each admission wave
        # prefills at the smallest bucket covering its longest prompt
        # instead of always padding to the full window, so one long
        # prompt no longer inflates every short wave's admission
        # dispatch (prefill cost scales with the padded width). "auto"
        # (DEFAULT) = {64, 256, 1024} below the window, plus the window
        # itself (always a valid bucket). One executable per bucket;
        # causality makes results padding-width-independent.
        if isinstance(prefill_ladder, str):
            if prefill_ladder != "auto":
                raise ValueError(f"prefill_ladder must be a sequence, "
                                 f"None or 'auto', got {prefill_ladder!r}")
            buckets = [b for b in (64, 256, 1024) if b < window]
        else:
            if isinstance(prefill_ladder, int):
                prefill_ladder = (prefill_ladder,)
            buckets = sorted(int(b) for b in (prefill_ladder or ()))
            if any(not 1 <= b <= window for b in buckets):
                raise ValueError(f"prefill_ladder entries must be in "
                                 f"[1, {window}], got {buckets}")
            buckets = [b for b in buckets if b < window]
        self._prefill_ladder = buckets + [window]
        self._slots = int(slots)
        # keep ONE decode block in flight beyond the one being
        # processed, chained device-to-device from its predecessor's
        # last tokens (decode_block's [N] last-token output), so the
        # token fetch RTT (~26-33 ms on this relay) and the host
        # bookkeeping hide under the next block's device time. Token
        # streams are unchanged (same PRNG fold numbering, same fed
        # values); the cost is up to one extra block of admission
        # latency when a slot frees while a chained block is in flight.
        self._pipelined = bool(pipelined)
        # decode steps per dispatch (CachedDecoder.decode_block): >1
        # amortizes the ~26 ms relay RTT across K tokens at the cost of
        # up to K-1 wasted steps per row end and K-step admission
        # latency. 1 = one dispatch per token (the classic tick).
        self._horizon = max(1, int(decode_horizon))
        # cap decode blocks (pow2) at the nearest live deadline while
        # requests wait, so freed slots admit promptly. WIN when the
        # per-step device time dominates the dispatch cost (PCIe-class
        # hosts); LOSS on this relay (~26 ms RTT >> 3.6 ms step: the
        # extra tail dispatches cost more than the freed steps save —
        # measured 1352 vs 1532 tok/s, docs/PERF.md) -> default False.
        self._adaptive = bool(adaptive_horizon)
        # the ONLY block sizes the loop may dispatch (and warmup must
        # compile): the pow2 ladder under adaptivity, else just horizon
        ks, k = [], self._horizon
        while k >= 1:
            ks.append(k)
            if not self._adaptive:
                break
            k //= 2
        self._block_ladder = ks
        self._window = self._dec._window
        self._tick_timeout = tick_timeout_s
        self._key = jax.random.PRNGKey(seed)
        self._queue: list[_GenRequest] = []
        self._active: list = []          # set by the scheduler loop
        self._cv = threading.Condition()
        self._thread: threading.Thread | None = None
        self._running = False
        self.stats = GenStats()

    # ---- client API ------------------------------------------------------
    def submit(self, prompt_ids, max_new: int,
               eos_id: int | None = None, *, temperature: float = 0.0,
               top_k: int = 0, top_p: float = 1.0,
               timeout_s: float | None = None,
               priority: int = 0) -> Future:
        """timeout_s: request deadline — an ACTIVE request past it
        resolves with the tokens accepted so far (partial result, the
        cancel semantics); a QUEUED request past it fails with
        TimeoutError instead of admitting. None = no deadline.
        priority: higher admits first (FIFO within a class) — requests
        already HOLDING rows are never preempted (static-slot design),
        so priority orders the admission queue only."""
        return self._enqueue(prompt_ids, max_new, eos_id, temperature,
                             top_k, top_p, None, timeout_s,
                             priority).future

    def submit_stream(self, prompt_ids, max_new: int,
                      eos_id: int | None = None, *,
                      temperature: float = 0.0, top_k: int = 0,
                      top_p: float = 1.0,
                      timeout_s: float | None = None,
                      priority: int = 0) -> "StreamHandle":
        """Like submit, but returns a StreamHandle that yields each
        generated token id as the scheduler accepts it (block
        granularity: up to decode_horizon tokens arrive at once).
        Iterate the handle for tokens; `handle.result()` returns the
        full [prompt + generated] sequence."""
        import queue

        req = self._enqueue(prompt_ids, max_new, eos_id, temperature,
                            top_k, top_p, queue.Queue(), timeout_s,
                            priority)
        return StreamHandle(req)

    def _enqueue(self, prompt_ids, max_new, eos_id, temperature, top_k,
                 top_p, stream_q, timeout_s=None,
                 priority=0) -> _GenRequest:
        prompt = np.asarray(prompt_ids, np.int64).reshape(-1)
        if len(prompt) == 0:
            raise ValueError("empty prompt")
        if max_new < 1:
            raise ValueError(f"max_new must be >= 1, got {max_new}")
        if len(prompt) + max_new > self._window:
            raise ValueError(
                f"prompt ({len(prompt)}) + max_new ({max_new}) exceeds "
                f"the compiled window {self._window}")
        if not (0 <= top_p <= 1.0):
            raise ValueError(f"top_p must be in [0, 1], got {top_p}")
        if top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {top_k}")
        # only a FIXED cap can truncate; auto mode routes out-of-regime
        # rows to the exact full-vocab sampler instead
        cap = self._cap if self._cap_mode == "fixed" else None
        if (cap is not None and temperature > 0.0
                and not (0 < top_k <= cap)
                and not self._cap_warned):
            self._cap_warned = True
            import logging

            logging.getLogger(__name__).warning(
                "sample_cap=%d is active but a request sampled with "
                "top_k=%d — its draw is truncated to the top-%d "
                "candidates (exact only for 0 < top_k <= cap); "
                "further occurrences are not logged", cap, top_k, cap)
        if timeout_s is not None and timeout_s <= 0:
            raise ValueError(f"timeout_s must be > 0, got {timeout_s}")
        req = _GenRequest(prompt=prompt, max_new=max_new, eos_id=eos_id,
                          temperature=float(temperature),
                          top_k=int(top_k), top_p=float(top_p),
                          stream_q=stream_q,
                          deadline_s=None if timeout_s is None
                          else time.perf_counter() + timeout_s,
                          priority=int(priority))
        with self._cv:
            if not self._running:
                raise RuntimeError("service not started")
            # insert before the first LOWER-priority request: higher
            # priorities admit first, FIFO within a priority class.
            # The scan runs for priority 0 too — a 0 must still jump
            # ahead of queued NEGATIVE priorities (the scan stops at
            # the first strictly-lower priority, so FIFO-within-class
            # is preserved)
            at = len(self._queue)
            for i, q in enumerate(self._queue):
                if q.priority < req.priority:
                    at = i
                    break
            self._queue.insert(at, req)
            self.stats.requests += 1
            self._cv.notify()
        return req

    def cancel(self, future: Future) -> bool:
        """Cancel a submitted request (client disconnect/abandon).

        A QUEUED request is removed and its future is cancelled
        (concurrent.futures semantics: result() raises CancelledError).
        An ACTIVE request's slot is freed at the scheduler's next
        drain and its future resolves with the tokens ACCEPTED SO FAR
        (prompt + generated prefix — useful for partial results); its
        stream ends. Returns True if the request was found pending or
        active, False if unknown/already finished."""
        with self._cv:
            for i, req in enumerate(self._queue):
                if req.future is future:
                    self._queue.pop(i)
                    req.future.cancel()
                    if req.stream_q is not None:
                        req.stream_q.put(None)
                    return True
            for req in self._active:
                if req is not None and req.future is future:
                    req.cancelled = True
                    self._cv.notify()
                    return True
        return False

    def warmup(self) -> "GenerationService":
        """Compile every executable the serving loop is expected to
        dispatch — fused admission (prefill_install) and the full pow2
        decode-block ladder {horizon, horizon/2, ..., 1} — OUTSIDE the
        serving window. Without this, the first request wave pays each
        block size's cold compile in-band (measured 2026-08-19: the
        adaptive ladder's 4 extra compiles turned a 0.5 s bench phase
        into 40 s). In auto-cap mode both the capped (primary: block
        ladder + prefix rungs) and the uncapped fallback (full-horizon
        block + admission only; uncapped RUNG blocks compile in-band if
        a nucleus-only pool ever ages into one) are warmed.
        Call before start(); idempotent (persistent compile cache)."""
        import jax

        n = self._slots
        caches = self._dec.init_cache(n)
        t = np.zeros(n, np.float32)
        tk = np.zeros(n, np.int32)
        tp = np.ones(n, np.float32)
        toks = np.ones(n, np.int64)
        pos = np.ones(n, np.int32)
        rows = np.arange(n, dtype=np.int32)
        caps = [self._cap, None] if self._cap_mode == "auto" \
            else ["default"]
        out = last = None
        for ci, cap in enumerate(caps):
            # admission buckets: every ladder width for the primary cap,
            # the full window only for the fallback
            for width in (self._prefill_ladder if ci == 0
                          else self._prefill_ladder[-1:]):
                window = np.zeros((n, width), np.float32)
                window[:, 0] = 1.0
                _, caches = self._dec.prefill_install(
                    window, np.ones(n, np.int32), self._key, 0, t, tk,
                    tp, caches, rows, sample_cap=cap)
            for k in (self._block_ladder if ci == 0
                      else self._block_ladder[:1]):
                out, last, caches = self._dec.decode_block(
                    toks, pos, caches, self._key, 1, t, tk, tp, k,
                    sample_cap=cap)
            if ci == 0:
                for p in self._prefix_ladder:
                    # prefix rungs compile at the full horizon (the
                    # dominant dispatch); other (k, p) pairs compile
                    # in-band if reached
                    out, last, caches = self._dec.decode_block(
                        toks, pos, caches, self._key, 1, t, tk, tp,
                        self._block_ladder[0], p, sample_cap=cap)
                if self._attn_auto:
                    # the aged-pool kernel block (auto attention policy)
                    out, last, caches = self._dec.decode_block(
                        toks, pos, caches, self._key, 1, t, tk, tp,
                        self._block_ladder[0], None, sample_cap=cap,
                        attn_impl="pallas")
        if self._pipelined:
            self._dec.merge_tokens(np.zeros(n, np.int64), last,
                                   np.arange(n, dtype=np.int32))
        jax.block_until_ready(out)
        return self

    def start(self) -> "GenerationService":
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="si-genservice")
        self._thread.start()
        return self

    def stop(self, drain: bool = True) -> None:
        with self._cv:
            self._running = False
            self._cv.notify()
        if self._thread:
            self._thread.join(timeout=60 if drain else 5)
            self._thread = None

    # ---- scheduler loop --------------------------------------------------
    def _loop(self) -> None:
        try:
            self._loop_inner()
        except BaseException as e:  # fail fast, never hang clients
            with self._cv:
                pending = list(self._queue)
                self._queue.clear()
                self._running = False
            for req in pending + [r for r in self._active if r]:
                if not req.future.done():
                    req.future.set_exception(e)
                if req.stream_q is not None:
                    req.stream_q.put(None)
            raise

    def _loop_inner(self) -> None:
        n = self._slots
        caches = self._dec.init_cache(n)
        active: list[_GenRequest | None] = [None] * n
        self._active = active
        bufs = np.zeros((n, self._window), np.int64)
        pos = np.zeros(n, np.int32)        # index of the token to feed
        deadline = np.zeros(n, np.int32)   # stop when the write reaches this
        temp = np.zeros(n, np.float32)
        topk = np.zeros(n, np.int32)
        topp = np.ones(n, np.float32)
        seq = 0                            # fold_in counter for the PRNG
        # the chained block in flight: (toks_dev, last_dev, k, fed_pos,
        # live_frac) — dispatched but not yet fetched (pipelined mode)
        in_flight = None

        def choose_k(pos_now) -> int:
            # When requests are WAITING, the block is capped (pow2
            # ladder, so the compiled-executable set stays log-sized)
            # at the nearest deadline among live rows: tail waste only
            # costs throughput when a freed slot could have admitted
            # sooner.
            k = self._horizon
            with self._cv:
                waiting = len(self._queue)
            if self._adaptive and waiting and k > 1:
                rem = min(int(deadline[i]) - int(pos_now[i]) - 1
                          for i in range(n) if active[i] is not None)
                k = max((v for v in self._block_ladder
                         if v <= max(1, rem)), default=1)
            return k

        def choose_prefix(fed_pos, k):
            # smallest ladder rung covering every LIVE row's appends
            # (positions fed_pos .. fed_pos+k-1 must be readable:
            # P >= pos + k); discarded rows may exceed the rung.
            # Rungs apply only at the FULL horizon: warmup compiles
            # (k, rung) pairs for the dominant block size alone, and an
            # adaptive deadline-capped tail block dispatching an
            # unwarmed (k, rung) pair would pay a 10-20 s in-band
            # compile (measured 2026-08-20: the adaptive w512 service
            # ran at 18 tok/s doing exactly that).
            if k != self._horizon:
                return None
            # Host-side liveness is deliberately conservative under
            # pipelined chaining: a row that finished INSIDE the
            # in-flight block still counts as live here, keeping the
            # pool on its (larger) rung for one extra block. Do not
            # "fix" this with device-side liveness — the stale rung is
            # correct (a superset read), only fractionally slower.
            if not self._prefix_ladder:
                return None
            live = [int(fed_pos[i]) for i in range(n)
                    if active[i] is not None]
            need = (max(live) if live else 0) + k
            for p in self._prefix_ladder:
                if p >= need:
                    return p
            return None

        def choose_cap(reqs):
            # auto mode: the capped sampler is distribution-exact when
            # every row in `reqs` is greedy or keeps 0 < top_k <= cap
            # (sampling.py contract); ONE out-of-regime row forces the
            # exact full-vocab sampler for the whole dispatch, so auto
            # mode never truncates a draw. Under pipelined chaining the
            # live set has the same one-block staleness as
            # choose_prefix — conservative in the correct direction
            # (rows only LEAVE between dispatches, so cap eligibility
            # only grows; a stale uncapped block is still exact).
            if self._cap_mode != "auto":
                return "default"
            ok = all(r.temperature <= 0.0 or 0 < r.top_k <= self._cap
                     for r in reqs)
            return self._cap if ok else None

        def cap_is_fast(cap) -> bool:
            # "fast" = this cap value dispatches a warmed primary
            # executable (not the uncapped in-band fallback). In
            # "fixed" AND "off" modes "default" is the single stable
            # sampler the decoder was built with — both are warmed, so
            # the auto attention policy may use the pallas block there
            # too (previously "off" could never dispatch the kernel it
            # paid to compile in warmup)
            if cap == "default":
                return self._cap_mode != "auto"
            return cap is not None

        def dispatch(tokens, fed_pos, k):
            # K decode steps for the whole pool in ONE dispatch (mixed
            # depths/settings; K <= decode_horizon). Rows that finish
            # mid-block decode garbage for the block's tail — discarded
            # in process(); the RTT amortization pays for the waste.
            nonlocal caches, seq
            live = float(np.mean([r is not None for r in active]))
            seq += k
            cap = choose_cap([r for r in active if r is not None])
            prefix = choose_prefix(fed_pos, k)
            # auto attention policy: an aged pool no rung covers flips
            # the full-horizon block to the per-row kernel (warmed);
            # tail blocks stay XLA like the rungs do, and so do
            # UNCAPPED dispatches (warmup compiles the kernel block for
            # the primary cap only — the in-band-compile rule again)
            attn = "pallas" if (self._attn_auto and prefix is None
                                and k == self._horizon
                                and cap_is_fast(cap)) else "default"
            toks, last, caches = self._dec.decode_block(
                tokens, fed_pos, caches, self._key, seq - k + 1, temp,
                topk, topp, k, prefix, sample_cap=cap, attn_impl=attn)
            # stats flag = did the CAPPED SAMPLER actually run (distinct
            # from cap_is_fast, which also counts "off" mode's stable
            # full-vocab executable as warmed for the attn policy)
            sampler_capped = (self._cap is not None
                              if cap == "default" else cap is not None)
            return (toks, last, k, np.asarray(fed_pos, np.int32), live,
                    sampler_capped)

        def process(blk) -> None:
            # fetch the block's tokens (the one host<->device round
            # trip; in pipelined mode the successor block is already
            # running under it) and fold them into the row buffers
            toks_dev, _last, k, _fed, live, capped = blk
            toks = np.asarray(toks_dev)                 # [n, k]
            self.stats.steps += k
            if capped:
                self.stats.capped_steps += k
            self.stats.occupancy_sum += live * k
            for i in range(n):
                req = active[i]
                if req is None:
                    continue
                expired = (req.deadline_s is not None
                           and time.perf_counter() > req.deadline_s)
                if req.cancelled or expired:
                    # free the slot; resolve with the tokens accepted
                    # BEFORE this block (the in-flight block's tokens
                    # are discarded — cancellation/deadline semantics)
                    if req.cancelled:
                        self.stats.cancelled += 1
                    else:
                        self.stats.timed_out += 1
                    self._finish(i, active, bufs, int(pos[i]) + 1, req)
                    continue
                for j in range(k):
                    new_pos = pos[i] + 1  # index the fed token predicted
                    bufs[i, new_pos] = toks[i, j]
                    self.stats.tokens_out += 1
                    if req.stream_q is not None:
                        req.stream_q.put(int(toks[i, j]))
                    if (req.eos_id is not None
                            and toks[i, j] == req.eos_id) \
                            or new_pos + 1 >= deadline[i]:
                        self._finish(i, active, bufs, int(new_pos) + 1,
                                     req)
                        break
                    pos[i] = new_pos

        while True:
            with self._cv:
                have_active = any(r is not None for r in active)
                if not self._running and not self._queue \
                        and not have_active and in_flight is None:
                    return
                can_admit = bool(self._queue) and any(
                    r is None for r in active)
            if can_admit and in_flight is not None:
                # admission may only assign rows when NO block is
                # undrained: a chained block dispatched before a row's
                # finish was known still carries that row's garbage
                # tail, which must not be attributed to a newly
                # admitted request. Draining here also brings pos/bufs
                # current for the admission block's carried tokens.
                process(in_flight)
                in_flight = None
                continue   # re-evaluate: the drain may free more rows
            with self._cv:
                admitted: list[tuple[int, _GenRequest]] = []
                for i in range(n):
                    if active[i] is None and self._queue:
                        req = self._queue.pop(0)
                        if (req.deadline_s is not None
                                and time.perf_counter() > req.deadline_s):
                            self.stats.timed_out += 1
                            if not req.future.done():
                                req.future.set_exception(TimeoutError(
                                    "request deadline passed while "
                                    "queued"))
                            if req.stream_q is not None:
                                req.stream_q.put(None)
                            continue
                        active[i] = req
                        admitted.append((i, req))
                if not admitted and not any(
                        r is not None for r in active) \
                        and in_flight is None:
                    if not self._running:
                        return
                    self._cv.wait(timeout=self._tick_timeout)
                    continue

            # admission: ONE fused dispatch for ALL admitted requests —
            # batched prefill (padded to the slot count, a fixed shape)
            # + on-device sampling + scatter-install into the cache
            # rows (CachedDecoder.prefill_install). Earlier forms paid
            # 2 dispatches per request, then 2 per wave; on a ~26 ms-RTT
            # link every dispatch is a full RTT (docs/PERF.md).
            if admitted:
                assert in_flight is None   # guaranteed by the drain above
                # smallest prefill bucket covering the wave's longest
                # prompt (the ladder always ends at the full window).
                # UNCAPPED waves (a nucleus-only request aboard, auto
                # cap mode) admit at the full window: warmup compiles
                # sub-window buckets for the primary cap only, and an
                # unwarmed (bucket, uncapped) admission would stall the
                # loop on a 10-20 s in-band compile (the rung lesson)
                wave_cap = choose_cap([r for _, r in admitted])
                maxlen = max(len(r.prompt) for _, r in admitted)
                width = next(b for b in self._prefill_ladder
                             if b >= maxlen) \
                    if cap_is_fast(wave_cap) or self._cap_mode != "auto" \
                    else self._prefill_ladder[-1]
                window = np.zeros((n, width), np.float32)
                lengths = np.ones(n, np.int32)
                rows = np.full(n, n + 7, np.int32)   # OOB = dropped
                t_a = np.zeros(n, np.float32)
                k_a = np.zeros(n, np.int32)
                p_a = np.ones(n, np.float32)
                for j, (i, req) in enumerate(admitted):
                    p = len(req.prompt)
                    window[j, :p] = req.prompt
                    lengths[j] = p
                    rows[j] = i
                    t_a[j], k_a[j], p_a[j] = (req.temperature, req.top_k,
                                              req.top_p)
                seq += 1
                tok, caches = self._dec.prefill_install(
                    window, lengths, self._key, seq, t_a, k_a, p_a,
                    caches, rows, sample_cap=wave_cap)
                self.stats.prefills += len(admitted)
                # token-independent bookkeeping BEFORE the fetch, so
                # the first decode block can be enqueued chained from
                # the prefill's on-device tokens (merge_tokens) and the
                # prefill fetch RTT overlaps its device time
                for j, (i, req) in enumerate(admitted):
                    p = len(req.prompt)
                    bufs[i, :] = 0
                    bufs[i, :p] = req.prompt
                    deadline[i] = min(p + req.max_new, self._window)
                    temp[i], topk[i], topp[i] = (req.temperature,
                                                 req.top_k, req.top_p)
                if self._pipelined:
                    pos_fed = pos.copy()
                    for j, (i, _req) in enumerate(admitted):
                        pos_fed[i] = lengths[j]
                    carry = bufs[np.arange(n),
                                 np.minimum(pos_fed, self._window - 1)]
                    tokens_dev = self._dec.merge_tokens(carry, tok, rows)
                    in_flight = dispatch(tokens_dev, pos_fed,
                                         choose_k(pos_fed))
                nxt_a = np.asarray(tok)
                for j, (i, req) in enumerate(admitted):
                    p = len(req.prompt)
                    nxt = int(nxt_a[j])
                    bufs[i, p] = nxt
                    self.stats.tokens_out += 1
                    if req.stream_q is not None:
                        req.stream_q.put(nxt)
                    if (req.eos_id is not None and nxt == req.eos_id) \
                            or p + 1 >= deadline[i]:
                        self._finish(i, active, bufs, p + 1, req)
                    else:
                        pos[i] = p
            if not any(r is not None for r in active):
                if in_flight is not None:
                    process(in_flight)   # garbage block; rows all done
                    in_flight = None
                continue

            if in_flight is None:
                tokens = bufs[np.arange(n), pos]
                in_flight = dispatch(tokens, pos.copy(), choose_k(pos))
            nxt = None
            if self._pipelined:
                # enqueue the successor chained from the in-flight
                # block's last on-device tokens BEFORE fetching its
                # results: the fetch RTT + host bookkeeping run while
                # the successor computes. Rows that finish inside the
                # in-flight block decode garbage in the successor
                # (discarded in process(), same waste profile as the
                # horizon tail).
                pos_next = np.minimum(in_flight[3] + in_flight[2],
                                      self._window - 1)
                nxt = dispatch(in_flight[1], pos_next,
                               choose_k(pos_next))
            process(in_flight)
            in_flight = nxt

    def _finish(self, i, active, bufs, end, req) -> None:
        out = bufs[i, :end].copy()
        self.stats.completed += 1
        self.stats.latency_sum_ms += (
            time.perf_counter() - req.t_submit) * 1e3
        active[i] = None
        # a client may have cancel()ed the bare Future directly (not via
        # self.cancel); set_result on a CANCELLED future raises
        # InvalidStateError, which the fail-fast loop wrapper would
        # escalate into killing the whole service — guard like the
        # _loop exception handler does
        if not req.future.done():
            req.future.set_result(out)
        if req.stream_q is not None:
            req.stream_q.put(None)       # end-of-stream sentinel


class TieredGenerationService:
    """Tiered KV pools: route each request to the SMALLEST cache tier
    that provably fits it (len(prompt) + max_new <= tier window).

    The memory half of the paged-attention story (round-4; reads were
    already rung-bounded by the kv_prefix ladder): a uniform pool
    allocates the full model window per slot even though most requests
    are short, so HBM — not compute — caps concurrency. Two (or more)
    GenerationServices over the SAME engine (weights shared on device;
    caches per tier via CachedDecoder(window=...)) turn that into
    slots-at-fixed-HBM: e.g. at 0.9B/w2048, 24 slots at w512 + 8 at
    w2048 cost ~0.45x the KV memory of 32 uniform w2048 slots
    (cache bytes scale linearly with the window).

    No migration: routing by prompt+max_new bounds a row's TOTAL length
    at admission, so a tier-1 row can never outgrow its cache — token
    streams are exactly the single-tier service's (same machinery).
    Each tier runs its own scheduler loop; dispatches interleave on the
    one device stream and each tier's pipelining hides its own RTT.

    tiers: sequence of (slots, window) pairs, ascending windows; the
    last window may be None = the model's full seq_len. kwargs go to
    every underlying GenerationService.
    """

    def __init__(self, engine, tiers=((8, 512), (8, None)), **kwargs):
        if not tiers:
            raise ValueError("need at least one (slots, window) tier")
        wins = []
        self.services = []
        for slots, window in tiers:
            svc = GenerationService(engine, slots=int(slots),
                                    window=window, **kwargs)
            self.services.append(svc)
            wins.append(svc._window)
        if wins != sorted(wins) or len(set(wins)) != len(wins):
            raise ValueError(
                f"tier windows must be strictly ascending, got {wins}")
        self.windows = wins

    # ---- lifecycle (fan out to every tier) ---------------------------
    def warmup(self) -> "TieredGenerationService":
        for svc in self.services:
            svc.warmup()
        return self

    def start(self) -> "TieredGenerationService":
        for svc in self.services:
            svc.start()
        return self

    def stop(self, drain: bool = True) -> None:
        for svc in self.services:
            svc.stop(drain=drain)

    # ---- routing -----------------------------------------------------
    def _route(self, prompt_ids, max_new: int) -> GenerationService:
        need = len(prompt_ids) + int(max_new)
        for svc in self.services:
            if need <= svc._window:
                return svc
        raise ValueError(
            f"prompt ({len(prompt_ids)}) + max_new ({max_new}) exceeds "
            f"the largest tier window {self.windows[-1]}")

    def submit(self, prompt_ids, max_new: int, *args, **kwargs) -> Future:
        return self._route(prompt_ids, max_new).submit(
            prompt_ids, max_new, *args, **kwargs)

    def submit_stream(self, prompt_ids, max_new: int, *args, **kwargs):
        return self._route(prompt_ids, max_new).submit_stream(
            prompt_ids, max_new, *args, **kwargs)

    def cancel(self, future: Future) -> bool:
        return any(svc.cancel(future) for svc in self.services)

    # ---- accounting --------------------------------------------------
    @property
    def stats(self) -> GenStats:
        """Aggregated stats across tiers (per-tier detail via
        .services[i].stats)."""
        agg = GenStats()
        for svc in self.services:
            s = svc.stats
            for f in s.__dataclass_fields__:
                setattr(agg, f, getattr(agg, f) + getattr(s, f))
        return agg

    def cache_bytes(self) -> int:
        """Total KV-pool bytes across tiers (the slots-at-fixed-HBM
        receipt: compare against a uniform full-window pool). Computed
        analytically (CachedDecoder.cache_nbytes) — materializing a
        second copy of every tier's pool just to count bytes could OOM
        a live service near HBM capacity."""
        return sum(svc._dec.cache_nbytes(svc._slots)
                   for svc in self.services)
