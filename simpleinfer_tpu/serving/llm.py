"""Continuous-batching text generation service.

The LLM analog of serving/batcher.py's image service: a fixed pool of
`slots` rows steps through ONE jitted KV-cache decode executable
(zoo/generate.CachedDecoder), and requests are admitted into free rows
MID-FLIGHT — a new prompt starts prefilling while neighbours are deep
in decode (per-row positions make the step batch heterogeneous). This
is the orca/vllm-style scheduling shape, expressed with static XLA
shapes: the step batch is always [slots, 1], caches are [slots, H, L,
D] donated buffers, and admission is just writing a row.

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
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=time.perf_counter)


@dataclass
class GenStats:
    requests: int = 0
    completed: int = 0
    steps: int = 0
    tokens_out: int = 0
    occupancy_sum: float = 0.0
    latency_sum_ms: float = 0.0

    @property
    def mean_occupancy(self) -> float:
        return self.occupancy_sum / max(1, self.steps)

    @property
    def mean_latency_ms(self) -> float:
        return self.latency_sum_ms / max(1, self.completed)


class GenerationService:
    """Slot-scheduled greedy generation over one causal-LM engine.

    usage:
        svc = GenerationService(engine, slots=8).start()
        fut = svc.submit([1, 5, 9], max_new=32, eos_id=2)
        ids = fut.result()            # np.int64 [P + generated]
        svc.stop()
    """

    def __init__(self, engine, slots: int = 8,
                 tick_timeout_s: float = 0.01):
        from ..zoo.generate import CachedDecoder

        self._dec = CachedDecoder(engine)
        self._slots = int(slots)
        self._window = self._dec._window
        self._tick_timeout = tick_timeout_s
        self._queue: list[_GenRequest] = []
        self._cv = threading.Condition()
        self._thread: threading.Thread | None = None
        self._running = False
        self.stats = GenStats()

    # ---- client API ------------------------------------------------------
    def submit(self, prompt_ids, max_new: int,
               eos_id: int | None = None) -> Future:
        prompt = np.asarray(prompt_ids, np.int64).reshape(-1)
        if len(prompt) == 0:
            raise ValueError("empty prompt")
        if len(prompt) + max_new > self._window:
            raise ValueError(
                f"prompt ({len(prompt)}) + max_new ({max_new}) exceeds "
                f"the compiled window {self._window}")
        req = _GenRequest(prompt=prompt, max_new=max_new, eos_id=eos_id)
        with self._cv:
            if not self._running:
                raise RuntimeError("service not started")
            self._queue.append(req)
            self.stats.requests += 1
            self._cv.notify()
        return req.future

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
        n = self._slots
        caches = self._dec.init_cache(n)
        active: list[_GenRequest | None] = [None] * n
        bufs = np.zeros((n, self._window), np.int64)
        pos = np.zeros(n, np.int32)        # next position to feed
        plen = np.zeros(n, np.int32)       # prompt length per row
        deadline = np.zeros(n, np.int32)   # stop when pos reaches this

        while True:
            with self._cv:
                if not self._running and not self._queue and not any(
                        r is not None for r in active):
                    return
                # admit queued requests into free rows (mid-flight)
                for i in range(n):
                    if active[i] is None and self._queue:
                        req = self._queue.pop(0)
                        active[i] = req
                        p = len(req.prompt)
                        bufs[i, :] = 0
                        bufs[i, :p] = req.prompt
                        pos[i] = 0
                        plen[i] = p
                        deadline[i] = min(p + req.max_new, self._window)
                idle = not any(r is not None for r in active)
                if idle:
                    if not self._running:
                        return
                    self._cv.wait(timeout=self._tick_timeout)
                    continue

            live = np.array([r is not None for r in active])
            tokens = bufs[np.arange(n), pos].reshape(n, 1)
            logits, caches = self._dec.step(tokens, pos, caches)
            nxt = np.asarray(np.argmax(np.asarray(logits)[:, 0, :],
                                       axis=-1))
            self.stats.steps += 1
            self.stats.occupancy_sum += float(live.mean())

            for i in range(n):
                req = active[i]
                if req is None:
                    continue
                new_pos = pos[i] + 1  # index the fed token predicted
                if new_pos < plen[i]:
                    # still prefilling: next prompt token is already in buf
                    pos[i] = new_pos
                    continue
                if new_pos >= deadline[i]:
                    self._finish(i, active, bufs, int(deadline[i]), req)
                    continue
                bufs[i, new_pos] = nxt[i]
                self.stats.tokens_out += 1
                if (req.eos_id is not None and nxt[i] == req.eos_id) \
                        or new_pos + 1 >= deadline[i]:
                    self._finish(i, active, bufs, int(new_pos) + 1, req)
                    continue
                pos[i] = new_pos

    def _finish(self, i, active, bufs, end, req) -> None:
        out = bufs[i, :end].copy()
        self.stats.completed += 1
        self.stats.latency_sum_ms += (
            time.perf_counter() - req.t_submit) * 1e3
        active[i] = None
        req.future.set_result(out)
