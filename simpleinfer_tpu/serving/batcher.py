"""Continuous batching scheduler over an Engine.

Design (TPU-first, nothing like this exists in the reference):

- Static shapes: XLA compiles one executable per batch size, so arriving
  requests are packed into the smallest BUCKET >= queue depth and the
  batch is padded to that bucket (pad rows are computed and discarded —
  cheaper than a recompile). Buckets default to powers of two up to
  `max_batch`; each bucket compiles once, then is replayed forever.
- The scheduler thread drains the queue continuously: while the device
  works on batch N, batch N+1 is being gathered and staged (host work
  overlaps device work; the device stream serializes execution).
- Each request resolves a concurrent.futures.Future with its output row,
  so callers get per-request latency out of a batched backend.
"""
from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Request:
    array: np.ndarray  # one item, engine input layout (e.g. HWC)
    future: Future = field(default_factory=Future)
    enqueue_t: float = field(default_factory=time.perf_counter)


@dataclass
class BucketStats:
    """Per-bucket request latency accounting (enqueue -> resolve)."""

    batches: int = 0
    items: int = 0
    total_latency_s: float = 0.0
    max_latency_s: float = 0.0

    @property
    def mean_latency_ms(self) -> float:
        return 1e3 * self.total_latency_s / max(self.items, 1)


@dataclass
class ServiceStats:
    requests: int = 0
    batches: int = 0
    padded_items: int = 0
    total_latency_s: float = 0.0
    total_batch_time_s: float = 0.0
    batches_per_engine: list = field(default_factory=list)
    per_bucket: dict = field(default_factory=dict)  # bucket -> BucketStats

    @property
    def mean_latency_ms(self) -> float:
        return 1e3 * self.total_latency_s / max(self.requests, 1)

    @property
    def mean_batch_occupancy(self) -> float:
        done = self.requests
        return done / max(done + self.padded_items, 1)

    def slo_report(self, target_ms: float) -> dict:
        """Per-bucket mean/max latency vs a target; `within` is False
        for any bucket whose MAX observed latency exceeded it."""
        return {
            b: {"mean_ms": s.mean_latency_ms,
                "max_ms": s.max_latency_s * 1e3,
                "items": s.items,
                "within": s.max_latency_s * 1e3 <= target_ms}
            for b, s in sorted(self.per_bucket.items())}


def _default_buckets(max_batch: int) -> list:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


class BatchingService:
    """Continuous batching front-end for one Engine or a DP pool of them.

    Usage:
        svc = BatchingService(engine, input_name, out_name, max_batch=32)
        svc.start()
        fut = svc.submit(image_nhwc_row)      # -> Future
        result = fut.result()
        svc.stop()

    Pass a LIST of engines (each pinned to its own device/replica) for
    data-parallel serving: batches round-robin across engines and the
    pipeline runs len(engines) deep, so all devices compute concurrently
    while the host gathers the next batch. This is the multi-chip DP
    alternative to a single engine over a `data`-axis mesh: a mesh
    splits ONE batch across chips (lowest latency), the engine pool runs
    INDEPENDENT batches per chip (highest throughput, no collective
    launch, per-chip failure isolation).
    """

    def __init__(self, engine, input_name: str | None = None,
                 output_name: str | None = None, max_batch: int = 32,
                 buckets: list | None = None,
                 max_wait_ms: float = 2.0,
                 device_postprocess=None):
        """`device_postprocess` (optional jittable fn array->array) runs
        on the raw output ON DEVICE before the host fetch — e.g.
        zoo.detect.topk_candidates to shrink YOLO outputs ~80x."""
        self.engines = list(engine) if isinstance(
            engine, (list, tuple)) else [engine]
        if not self.engines:
            raise ValueError("need at least one engine")
        self.engine = self.engines[0]
        self.input_name = input_name or self.engine.input_names[0]
        self.output_name = output_name or self.engine.output_names[0]
        self.device_post = None
        if device_postprocess is not None:
            import jax

            self.device_post = jax.jit(device_postprocess)
        self.max_batch = max_batch
        self.buckets = sorted(buckets or _default_buckets(max_batch))
        self.max_wait_s = max_wait_ms / 1e3
        self.stats = ServiceStats(
            batches_per_engine=[0] * len(self.engines))
        self._q: queue.Queue = queue.Queue()
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()

    # ---- client side -----------------------------------------------------
    def submit(self, array: np.ndarray) -> Future:
        if self._thread is None:
            raise RuntimeError("service not started")
        req = Request(np.asarray(array))
        self._q.put(req)
        return req.future

    def warmup(self, probe_spill: bool = False,
               spill_budget_bytes: int = 32 << 20) -> None:
        """Compile every bucket up front (avoids first-request stalls).
        Engines sharing a model compile once each — identical programs
        on different devices still need their own executable.

        probe_spill=True additionally asks XLA how many TEMP bytes each
        bucket's executable materializes (Engine.temp_bytes) and DROPS
        buckets above `spill_budget_bytes`: measured on yolov5s-640
        int8w, b8 compiles fully fused (temp 0) while b16 spills 216 MB
        of stage temporaries and pays ~24% throughput (docs/PERF.md) —
        a b32 offered load is then served as 4 x b8 waves instead of
        paying the spill implicitly. The smallest bucket is always
        kept; a backend without memory_analysis keeps all buckets.
        """
        if probe_spill:
            kept = self.buckets[:1]
            for b in self.buckets[1:]:
                t = self.engine.temp_bytes(b)
                if t is None or t <= spill_budget_bytes:
                    kept.append(b)
                else:
                    import logging

                    logging.getLogger("simpleinfer_tpu").warning(
                        "serving bucket b%d drops: XLA temp spill "
                        "%.0f MB > budget %.0f MB (loads route to the "
                        "surviving buckets)", b, t / 2**20,
                        spill_budget_bytes / 2**20)
            self.buckets = kept
            self.max_batch = min(self.max_batch, kept[-1])
        for eng in self.engines:
            eng.warmup(self.buckets)

    # ---- lifecycle -------------------------------------------------------
    def start(self) -> "BatchingService":
        if self._thread is not None:
            return self
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="si-batcher")
        self._thread.start()
        return self

    def stop(self, drain: bool = True) -> None:
        if self._thread is None:
            return
        if drain:
            self._q.join()
        self._stop.set()
        self._thread.join()
        self._thread = None

    # ---- scheduler -------------------------------------------------------
    def _gather(self) -> list:
        """Block for one request, then drain whatever arrived (up to
        max_batch), waiting at most max_wait_s for stragglers."""
        try:
            first = self._q.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            # a fuller bucket is always better; only wait when the
            # current size would pad heavily
            try:
                batch.append(self._q.get(block=remaining > 0,
                                         timeout=max(remaining, 0)))
            except queue.Empty:
                break
        return batch

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _dispatch(self, batch: list, engine_idx: int):
        """Stage + forward one batch on one engine; returns (batch,
        device_out, t0, bucket) with the output still on device (NOT
        fetched)."""
        t0 = time.perf_counter()
        n = len(batch)
        bucket = self._bucket_for(n)
        x = np.stack([r.array for r in batch])
        if bucket > n:
            pad = np.zeros((bucket - n, *x.shape[1:]), x.dtype)
            x = np.concatenate([x, pad])
        eng = self.engines[engine_idx]
        eng.input(self.input_name, x)
        eng.forward()
        out = eng.extract(self.output_name, as_numpy=False)
        if self.device_post is not None:
            out = self.device_post(out)
        self.stats.batches_per_engine[engine_idx] += 1
        return batch, out, t0, bucket

    def _resolve(self, inflight) -> None:
        """Fetch a dispatched batch's output and complete its futures."""
        batch, out, t0, bucket = inflight
        n = len(batch)
        try:
            host = np.asarray(out)  # blocks until the device finishes
            for i, r in enumerate(batch):
                r.future.set_result(host[i])
        except Exception as e:  # noqa: BLE001 — propagate to all waiters
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)
        finally:
            now = time.perf_counter()
            self.stats.requests += n
            self.stats.batches += 1
            self.stats.padded_items += bucket - n
            self.stats.total_batch_time_s += now - t0
            lat = [now - r.enqueue_t for r in batch]
            self.stats.total_latency_s += sum(lat)
            bs = self.stats.per_bucket.setdefault(bucket, BucketStats())
            bs.batches += 1
            bs.items += n
            bs.total_latency_s += sum(lat)
            bs.max_latency_s = max(bs.max_latency_s, max(lat, default=0.0))
            for _ in batch:
                self._q.task_done()

    def _loop(self) -> None:
        """Pipelined schedule, len(engines) deep: while every device
        computes its batch, the host gathers/stages the next one, and a
        device's previous output is fetched only when that device is
        about to be reused (or the queue goes idle) — the
        continuous-batching pipeline overlap of BASELINE.json config 5,
        generalized from double-buffering (1 engine) to a DP pool."""
        depth = len(self.engines)
        inflight: deque = deque()  # oldest first
        rr = 0  # round-robin engine cursor
        while not self._stop.is_set():
            batch = self._gather()
            if batch:
                # dispatch BEFORE fetching the oldest output: enqueueing
                # on a busy device is free (its stream serializes), and
                # fetching first would idle every device behind one
                # blocking host read. The previous output array survives
                # re-dispatch — extract() returned an independent buffer.
                dispatched = False
                try:
                    inflight.append(self._dispatch(batch, rr % depth))
                    rr += 1
                    dispatched = True
                except Exception as e:  # noqa: BLE001 — staging failed
                    for r in batch:
                        if not r.future.done():
                            r.future.set_exception(e)
                    for _ in batch:
                        self._q.task_done()
                    self.stats.requests += len(batch)
                    self.stats.batches += 1
                # resolve the oldest output once the pipeline is full;
                # after a FAILED dispatch resolve unconditionally, so a
                # stream of bad requests can never starve futures whose
                # batches the device already finished
                if len(inflight) > depth or (not dispatched and inflight):
                    self._resolve(inflight.popleft())
            elif inflight:
                # idle: complete waiters promptly
                self._resolve(inflight.popleft())
        while inflight:
            self._resolve(inflight.popleft())
