"""Continuous batching service tests (CPU, tiny models)."""
import threading
import time

import numpy as np
import pytest

from simpleinfer_tpu import Engine
from simpleinfer_tpu.serving import BatchingService
from simpleinfer_tpu.zoo import build_resnet18

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def engine():
    graph, _, _ = build_resnet18(batch=1, image_size=32, num_classes=6,
                                 width=8)
    return Engine().load_model(None, graph=graph)


def _ref_outputs(engine, items):
    out = engine.run({engine.input_names[0]: np.stack(items)})
    return out[engine.output_names[0]]


def test_single_request(engine):
    svc = BatchingService(engine, max_batch=4).start()
    try:
        x = RNG.standard_normal((32, 32, 3)).astype(np.float32)
        got = svc.submit(x).result(timeout=60)
        want = _ref_outputs(engine, [x])[0]
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    finally:
        svc.stop()


def test_requests_batched_and_correct(engine):
    svc = BatchingService(engine, max_batch=8, max_wait_ms=50).start()
    try:
        xs = [RNG.standard_normal((32, 32, 3)).astype(np.float32)
              for _ in range(16)]
        futs = [svc.submit(x) for x in xs]
        got = np.stack([f.result(timeout=120) for f in futs])
        want = _ref_outputs(engine, xs)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
        assert svc.stats.requests == 16
        # 16 requests at max_batch 8 with a 50ms gather window should use
        # far fewer than 16 batches
        assert svc.stats.batches < 16
    finally:
        svc.stop()


def test_bucket_padding_accounting(engine):
    svc = BatchingService(engine, max_batch=8, buckets=[1, 4, 8],
                          max_wait_ms=100).start()
    try:
        xs = [RNG.standard_normal((32, 32, 3)).astype(np.float32)
              for _ in range(3)]
        futs = [svc.submit(x) for x in xs]
        for f in futs:
            f.result(timeout=120)
        svc.stop()
        # 3 requests can't exceed one bucket-4 batch (plus maybe splits);
        # padding must be recorded whenever a bucket was not exactly full
        assert svc.stats.requests == 3
        assert svc.stats.padded_items >= 1
        assert 0 < svc.stats.mean_batch_occupancy <= 1.0
    finally:
        svc.stop()


def test_concurrent_submitters(engine):
    """Many client threads submit concurrently; the engine itself is
    owned solely by the service thread (submit() is the thread-safe
    surface), so references are computed after the service drains."""
    svc = BatchingService(engine, max_batch=8, max_wait_ms=10).start()
    results: dict = {}
    errs = []

    def client(seed):
        try:
            rng = np.random.default_rng(seed)
            x = rng.standard_normal((32, 32, 3)).astype(np.float32)
            results[seed] = (x, svc.submit(x).result(timeout=120))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    svc.stop()
    assert not errs, errs
    assert len(results) == 12
    xs = [results[i][0] for i in sorted(results)]
    want = _ref_outputs(engine, xs)
    got = np.stack([results[i][1] for i in sorted(results)])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_device_postprocess(engine):
    """On-device postprocess runs before the host fetch."""
    import jax.numpy as jnp

    svc = BatchingService(engine, max_batch=4,
                          device_postprocess=lambda o: o[:, :3] * 2.0)
    svc.start()
    try:
        x = RNG.standard_normal((32, 32, 3)).astype(np.float32)
        got = svc.submit(x).result(timeout=60)
        want = _ref_outputs(engine, [x])[0][:3] * 2.0
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    finally:
        svc.stop()


def test_topk_candidates():
    from simpleinfer_tpu.zoo.detect import topk_candidates

    pred = np.zeros((2, 100, 85), np.float32)
    pred[0, 7, 4] = 0.9
    pred[0, 7, 5] = 1.0  # top row image 0
    pred[1, 42, 4] = 0.8
    pred[1, 42, 9] = 1.0
    out = np.asarray(topk_candidates(pred, k=5))
    assert out.shape == (2, 5, 85)
    assert out[0, 0, 4] == np.float32(0.9)
    assert out[1, 0, 4] == np.float32(0.8)


def test_error_propagates_to_future(engine):
    svc = BatchingService(engine, max_batch=2).start()
    try:
        bad = np.zeros((7, 7), np.float32)  # wrong rank -> engine raises
        with pytest.raises(Exception):
            svc.submit(bad).result(timeout=60)
    finally:
        svc.stop(drain=False)


def test_multi_engine_pool_round_robins(engine):
    """DP pool: batches spread across engines, results stay correct."""
    graph2, _, _ = build_resnet18(batch=1, image_size=32, num_classes=6,
                                  width=8)
    eng2 = Engine().load_model(None, graph=graph2)
    # same weights on both replicas so outputs are comparable
    eng2._device_weights = engine._device_weights
    svc = BatchingService([engine, eng2], max_batch=2,
                          max_wait_ms=1.0).start()
    try:
        xs = [RNG.standard_normal((32, 32, 3)).astype(np.float32)
              for _ in range(12)]
        futs = [svc.submit(x) for x in xs]
        got = np.stack([f.result(timeout=120) for f in futs])
        want = _ref_outputs(engine, xs)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
        # both engines must have been used
        assert all(b > 0 for b in svc.stats.batches_per_engine)
        assert sum(svc.stats.batches_per_engine) == svc.stats.batches
    finally:
        svc.stop()


def test_device_pinned_engines_distinct_devices():
    """EngineConfig.device_index commits weights + compute to that chip
    (here: distinct devices of the simulated 8-CPU-device slice)."""
    import jax

    from simpleinfer_tpu import EngineConfig

    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=6, width=8)
    engines = [
        Engine(EngineConfig(device_index=i)).load_model(None, graph=graph)
        for i in (0, 1)]
    x = RNG.standard_normal((2, 32, 32, 3)).astype(np.float32)
    outs = []
    for i, eng in enumerate(engines):
        eng.input(in_name, x)
        eng.forward()
        out = eng.extract(out_name, as_numpy=False)
        assert out.devices() == {jax.devices()[i]}, \
            f"engine {i} output not on its pinned device"
        outs.append(np.asarray(out))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5, rtol=1e-5)


def test_multi_engine_pool_pinned_devices():
    """BASELINE config-5 shape on the simulated slice: a DP pool of
    engines pinned to their own devices, round-robin dispatch, pipeline
    overlap, per-request latency + occupancy accounted."""
    from simpleinfer_tpu import EngineConfig

    graph, _, _ = build_resnet18(batch=1, image_size=32, num_classes=6,
                                 width=8, seed=5)
    engines = [
        Engine(EngineConfig(device_index=i)).load_model(None, graph=graph)
        for i in range(4)]
    svc = BatchingService(engines, max_batch=4, buckets=[1, 2, 4],
                          max_wait_ms=1.0).start()
    try:
        xs = [RNG.standard_normal((32, 32, 3)).astype(np.float32)
              for _ in range(24)]
        futs = [svc.submit(x) for x in xs]
        got = np.stack([f.result(timeout=120) for f in futs])
        want = _ref_outputs(engines[0], xs)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
        # every pinned engine took batches; totals reconcile
        assert all(b > 0 for b in svc.stats.batches_per_engine)
        assert sum(svc.stats.batches_per_engine) == svc.stats.batches
        assert svc.stats.requests == len(xs)
        # per-request latency was recorded (mean > 0) and the bucket
        # SLO report covers every bucket used
        assert svc.stats.mean_latency_ms > 0
        report = svc.stats.slo_report(target_ms=60_000)
        assert sum(s["items"] for s in report.values()) == len(xs)
        assert all(s["within"] for s in report.values())
        # occupancy: bucketing never padded more than it served
        assert svc.stats.mean_batch_occupancy > 0.5
    finally:
        svc.stop()


def test_temp_bytes_report(engine):
    """Engine.temp_bytes returns an int (or None on backends without
    memory_analysis) — the b16 spill signal used by the serving probe."""
    t = engine.temp_bytes(2)
    assert t is None or (isinstance(t, int) and t >= 0)


def test_warmup_spill_probe_drops_spilled_buckets(engine, monkeypatch):
    """Buckets whose executables spill XLA temps beyond the budget are
    dropped: a b16 offered load is then served as b8 waves instead of
    paying the measured ~24% spill tax implicitly (docs/PERF.md)."""
    svc = BatchingService(engine, max_batch=16, buckets=[1, 4, 8, 16],
                          max_wait_ms=20.0)
    spill = {1: 0, 4: 0, 8: 0, 16: 216 << 20}
    monkeypatch.setattr(engine, "temp_bytes", lambda b: spill[b])
    svc.warmup(probe_spill=True)
    assert svc.buckets == [1, 4, 8]
    assert svc.max_batch == 8
    svc.start()
    try:
        xs = [RNG.standard_normal((32, 32, 3)).astype(np.float32)
              for _ in range(16)]
        futs = [svc.submit(x) for x in xs]
        got = np.stack([f.result(timeout=120) for f in futs])
        np.testing.assert_allclose(got, _ref_outputs(engine, xs),
                                   atol=1e-4, rtol=1e-4)
        # nothing dispatched above the capped bucket
        assert max(svc.stats.per_bucket) <= 8
    finally:
        svc.stop()


def test_multi_engine_single_is_default(engine):
    svc = BatchingService(engine, max_batch=4)
    assert svc.engines == [engine]
    assert svc.stats.batches_per_engine == [0]


def test_failed_dispatches_do_not_starve_inflight(engine):
    """A stream of malformed requests must not withhold results of
    batches the device already computed (the failure path resolves the
    oldest in-flight batch too)."""
    svc = BatchingService(engine, max_batch=1, max_wait_ms=1.0).start()
    try:
        good = svc.submit(RNG.standard_normal((32, 32, 3))
                          .astype(np.float32))
        bads = [svc.submit(np.zeros(3, np.float32)) for _ in range(8)]
        got = good.result(timeout=60)  # must resolve despite bad stream
        assert got.shape[-1] == 6
        for b in bads:
            with pytest.raises(Exception):
                b.result(timeout=60)
    finally:
        svc.stop(drain=False)


def test_per_bucket_latency_stats_and_slo(engine):
    svc = BatchingService(engine, max_batch=4, buckets=[1, 4],
                          max_wait_ms=1.0).start()
    try:
        xs = [RNG.standard_normal((32, 32, 3)).astype(np.float32)
              for _ in range(6)]
        for f in [svc.submit(x) for x in xs]:
            f.result(timeout=60)
        assert svc.stats.per_bucket  # at least one bucket used
        total_items = sum(b.items for b in svc.stats.per_bucket.values())
        assert total_items == 6
        rep = svc.stats.slo_report(target_ms=60_000)
        assert all(v["within"] for v in rep.values())
        rep_tight = svc.stats.slo_report(target_ms=0.0)
        assert not any(v["within"] for v in rep_tight.values())
    finally:
        svc.stop()


# ------------------------------------------------- LLM generation service
def _gpt_engine(seq_len=24, vocab=40):
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_gpt

    graph, _, _ = build_gpt(variant="nano", batch=1, seq_len=seq_len,
                            vocab_size=vocab, depth=2, width=32,
                            num_heads=4)
    return Engine().load_model(None, graph=graph)


def test_generation_service_matches_solo_decode():
    """Continuous batching must be RESULT-INVARIANT: rows admitted
    mid-flight (mixed prefill/decode depths in one step batch) produce
    exactly the tokens a solo KV-cache decode produces."""
    import time as _time

    from simpleinfer_tpu.serving.llm import GenerationService
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 40, size=p).tolist() for p in (3, 5, 2, 7)]
    dec = CachedDecoder(eng)
    want = [dec.generate(np.asarray([p]), steps=6)[0] for p in prompts]

    svc = GenerationService(eng, slots=2).start()  # 4 reqs > 2 slots
    futs = []
    for p in prompts:
        futs.append(svc.submit(p, max_new=6))
        _time.sleep(0.01)  # stagger admissions mid-flight
    got = [f.result(timeout=60) for f in futs]
    svc.stop()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert svc.stats.completed == 4
    assert svc.stats.tokens_out == 4 * 6
    assert 0 < svc.stats.mean_occupancy <= 1.0


def test_generation_service_eos_and_errors():
    from simpleinfer_tpu.serving.llm import GenerationService
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    dec = CachedDecoder(eng)
    ref = dec.generate(np.asarray([[4, 8]]), steps=10)[0]
    eos = int(ref[4])  # a token the greedy continuation emits
    first = 2 + int(np.argmax(ref[2:] == eos))  # its first occurrence
    svc = GenerationService(eng, slots=2).start()
    out = svc.submit([4, 8], max_new=10, eos_id=eos).result(timeout=60)
    # stops right after emitting the FIRST eos occurrence
    np.testing.assert_array_equal(out, ref[:first + 1])
    with pytest.raises(ValueError):
        svc.submit([1] * 30, max_new=10)  # window overflow
    with pytest.raises(ValueError):
        svc.submit([], max_new=2)
    svc.stop()
    with pytest.raises(RuntimeError):
        svc.submit([1], max_new=1)


def test_generation_service_pipelined_matches_sequential():
    """pipelined=True (one chained decode block in flight, admission
    overlapped via merge_tokens) must produce exactly the completions
    of pipelined=False — the chained tokens are the same device values
    the host would have re-fed, and the PRNG fold numbering is
    dispatch-order identical."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 40, size=p).tolist() for p in (3, 6, 2, 5)]

    def run(pipelined):
        svc = GenerationService(eng, slots=2, decode_horizon=4,
                                pipelined=pipelined).start()
        futs = [svc.submit(p, max_new=7) for p in prompts]
        got = [f.result(timeout=120) for f in futs]
        svc.stop()
        return got, svc.stats

    got_p, stats_p = run(True)
    got_s, _ = run(False)
    for a, b in zip(got_p, got_s):
        np.testing.assert_array_equal(a, b)
    assert stats_p.completed == 4
    assert stats_p.tokens_out >= 4 * 7


def test_generation_service_pipelined_chains_device_tokens():
    """In pipelined mode the successor block must be dispatched from the
    predecessor's on-device last-token array (no host fetch between
    dispatches): at least one decode_block call receives a non-numpy
    (device) token argument."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    svc = GenerationService(eng, slots=1, decode_horizon=2)
    orig = svc._dec.decode_block
    token_types = []

    def spy(tokens, *a, **kw):
        token_types.append(type(tokens).__module__)
        return orig(tokens, *a, **kw)

    svc._dec.decode_block = spy
    svc.start()
    out = svc.submit([3, 1, 4], max_new=8).result(timeout=120)
    svc.stop()
    assert len(out) == 3 + 8
    assert any(not m.startswith("numpy") for m in token_types), \
        f"no chained device-token dispatch seen: {token_types}"


def test_generation_service_pipelined_eos_mid_block():
    """EOS inside an in-flight chained block frees the slot and the
    next queued request is admitted correctly (the successor block's
    garbage for that row is discarded)."""
    from simpleinfer_tpu.serving.llm import GenerationService
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    dec = CachedDecoder(eng)
    ref = dec.generate(np.asarray([[4, 8]]), steps=10)[0]
    eos = int(ref[5])
    first = 2 + int(np.argmax(ref[2:] == eos))
    want2 = dec.generate(np.asarray([[7, 2, 9]]), steps=5)[0]

    svc = GenerationService(eng, slots=1, decode_horizon=4).start()
    f1 = svc.submit([4, 8], max_new=10, eos_id=eos)
    f2 = svc.submit([7, 2, 9], max_new=5)
    out1 = f1.result(timeout=120)
    out2 = f2.result(timeout=120)
    svc.stop()
    np.testing.assert_array_equal(out1, ref[:first + 1])
    np.testing.assert_array_equal(out2, want2)


def test_generation_service_kv_int8_mha_path():
    """int8 KV cache on the nn.MultiheadAttention (GPT) decode path:
    the learned-position/packed-MHA lineage uses _mha_decode, whose
    cache append/read goes through the same quantized codec."""
    from simpleinfer_tpu.serving.llm import GenerationService
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    dec = CachedDecoder(eng, kv_dtype="int8")
    want = dec.generate(np.asarray([[4, 8, 2]]), steps=6)[0]
    svc = GenerationService(eng, slots=2, kv_dtype="int8").start()
    got = svc.submit([4, 8, 2], max_new=6).result(timeout=120)
    svc.stop()
    np.testing.assert_array_equal(got, want)


def test_generation_service_scratch_blocks_mha_path():
    """scratch_blocks on the nn.MultiheadAttention (GPT) lineage."""
    from simpleinfer_tpu.serving.llm import GenerationService
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    ref = CachedDecoder(eng)
    want = ref.generate(np.asarray([[4, 8, 2]]), steps=6)[0]
    svc = GenerationService(eng, slots=2, decode_horizon=3,
                            scratch_blocks=True).start()
    got = svc.submit([4, 8, 2], max_new=6).result(timeout=120)
    svc.stop()
    np.testing.assert_array_equal(got, want)


def test_generation_service_window_edge_pipelined_scratch():
    """Requests whose prompt+max_new exactly fill the compiled window,
    served with every fast path on (pipelined + scratch blocks +
    horizon overrun): chained blocks advance pos past the deadline and
    must clamp/discard without corrupting neighbours or the result."""
    from simpleinfer_tpu.serving.llm import GenerationService
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine(seq_len=16)
    dec = CachedDecoder(eng, scratch_blocks=True)
    p1 = [3, 1, 4, 1, 5]
    p2 = [2, 7]
    want1 = dec.generate(np.asarray([p1]), steps=16 - len(p1))[0]
    want2 = dec.generate(np.asarray([p2]), steps=3)[0]
    svc = GenerationService(eng, slots=2, decode_horizon=8,
                            scratch_blocks=True).start()
    f1 = svc.submit(p1, max_new=16 - len(p1))   # fills the window
    f2 = svc.submit(p2, max_new=3)              # finishes early
    out1 = f1.result(timeout=120)
    out2 = f2.result(timeout=120)
    svc.stop()
    np.testing.assert_array_equal(out1, want1)
    np.testing.assert_array_equal(out2, want2)
    assert len(out1) == 16


def test_generation_service_streaming():
    """submit_stream yields exactly the generated tokens in order,
    ending at eos; result() returns the full sequence."""
    from simpleinfer_tpu.serving.llm import GenerationService
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    dec = CachedDecoder(eng)
    ref = dec.generate(np.asarray([[4, 8]]), steps=10)[0]
    eos = int(ref[5])
    want = dec.generate(np.asarray([[4, 8]]), steps=10, eos_id=eos)[0]

    svc = GenerationService(eng, slots=2, decode_horizon=4).start()
    h = svc.submit_stream([4, 8], max_new=10, eos_id=eos)
    streamed = list(h)
    ids = h.result(timeout=60)
    svc.stop()
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_array_equal(streamed, want[2:])  # generated only


def test_http_generate_sse_stream():
    """POST /v1/generate with stream=true returns SSE events: one per
    token, then a done event carrying the full ids."""
    import json
    import urllib.request

    from simpleinfer_tpu.serving.http import InferenceServer
    from simpleinfer_tpu.serving.llm import GenerationService
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    eng = _gpt_engine()
    want = CachedDecoder(eng).generate(np.asarray([[4, 8, 1]]),
                                       steps=7)[0]
    svc = GenerationService(eng, slots=2, decode_horizon=4).start()
    server = InferenceServer(None, port=0, gen_service=svc).start()
    body = json.dumps({"prompt": [4, 8, 1], "max_new": 7,
                       "stream": True}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.address[1]}/v1/generate", data=body,
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers["Content-Type"] == "text/event-stream"
        for line in resp:
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[6:]))
    server.stop()
    svc.stop()
    toks = [e["token"] for e in events if "token" in e]
    done = [e for e in events if e.get("done")]
    assert len(done) == 1
    np.testing.assert_array_equal(done[0]["ids"], want)
    np.testing.assert_array_equal(toks, want[3:])
    assert done[0]["prompt_len"] == 3


def test_generation_service_cancel_queued_and_active():
    """cancel(): a queued request's future raises CancelledError and
    never runs; an active request's slot frees at the next drain and
    its future resolves with the tokens accepted so far."""
    import concurrent.futures as cf

    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    svc = GenerationService(eng, slots=1, decode_horizon=2).start()
    import time as _time

    # slot 1: a long-running active request; the second queues behind it
    f_active = svc.submit([4, 8, 2], max_new=16)
    for _ in range(500):           # wait until it is actually ADMITTED
        if svc.stats.prefills >= 1:
            break
        _time.sleep(0.01)
    f_queued = svc.submit([5, 5], max_new=16)
    assert svc.cancel(f_queued) is True
    with pytest.raises(cf.CancelledError):
        f_queued.result(timeout=60)
    was_live = svc.cancel(f_active)     # may have finished already
    out = f_active.result(timeout=60)   # partial: prompt + some tokens
    if was_live:
        assert 3 <= len(out) < 3 + 16
        assert svc.stats.cancelled == 1
    else:
        assert len(out) == 3 + 16       # raced to completion: full
    np.testing.assert_array_equal(out[:3], [4, 8, 2])
    # finished futures report False
    assert svc.cancel(f_active) is False
    # the freed slot serves new requests normally
    out2 = svc.submit([7, 1], max_new=4).result(timeout=60)
    assert len(out2) == 2 + 4
    svc.stop()


def test_generation_service_cancel_stream_ends():
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    svc = GenerationService(eng, slots=1, decode_horizon=2).start()
    h = svc.submit_stream([4, 8], max_new=18)
    got = []
    for tok in h:
        got.append(tok)
        if len(got) == 2:
            svc.cancel(h.future)
    assert len(got) < 18            # the stream ended early
    out = h.result(timeout=60)
    np.testing.assert_array_equal(out[:2], [4, 8])
    svc.stop()


def test_generation_service_request_deadlines():
    """submit(timeout_s=...): queued requests past their deadline fail
    with TimeoutError at admission; active requests resolve with the
    tokens accepted so far."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    svc = GenerationService(eng, slots=1, decode_horizon=1).start()
    with pytest.raises(ValueError):
        svc.submit([1], max_new=2, timeout_s=0)
    # an active long request with a tiny deadline ends early, partial
    f = svc.submit([4, 8, 2], max_new=18, timeout_s=0.05)
    out = f.result(timeout=60)
    assert 3 <= len(out) < 3 + 18
    assert svc.stats.timed_out >= 1
    # a queued request behind a long one can expire before admission
    f_long = svc.submit([5, 5], max_new=18)
    f_q = svc.submit([7, 1], max_new=4, timeout_s=0.001)
    with pytest.raises(TimeoutError):
        f_q.result(timeout=60)
    f_long.result(timeout=60)
    svc.stop()


def test_generation_service_priority_admission_order():
    """Higher-priority requests jump the admission queue (FIFO within
    a class); active rows are never preempted."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    import time as _time

    svc = GenerationService(eng, slots=1, decode_horizon=1).start()
    blocker = svc.submit([4, 8], max_new=12)       # occupies the slot
    for _ in range(500):          # wait until it actually holds the row
        if svc.stats.prefills >= 1:
            break
        _time.sleep(0.01)
    lo1 = svc.submit([1, 1], max_new=2)
    lo2 = svc.submit([2, 2], max_new=2)
    hi = svc.submit([3, 3], max_new=2, priority=5)
    with svc._cv:
        order = [tuple(r.prompt) for r in svc._queue]
    assert order == [(3, 3), (1, 1), (2, 2)]       # hi jumped the lows
    for f in (blocker, hi, lo1, lo2):
        f.result(timeout=120)
    svc.stop()


def test_generation_service_priority_zero_beats_negative():
    """A default-priority (0) request submitted after a NEGATIVE-
    priority request must still admit first — the insertion scan runs
    for priority 0 too (round-3 advisor finding)."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    svc = GenerationService(eng, slots=1, decode_horizon=1).start()
    blocker = svc.submit([4, 8], max_new=12)
    for _ in range(500):
        if svc.stats.prefills >= 1:
            break
        time.sleep(0.01)
    neg = svc.submit([1, 1], max_new=2, priority=-3)
    zero = svc.submit([2, 2], max_new=2)           # default priority 0
    with svc._cv:
        order = [tuple(r.prompt) for r in svc._queue]
    assert order == [(2, 2), (1, 1)]               # 0 jumped the -3
    for f in (blocker, neg, zero):
        f.result(timeout=120)
    svc.stop()


def test_generation_service_survives_direct_future_cancel():
    """future.cancel() called directly on the handed-back Future (not
    via svc.cancel) must not crash the scheduler when it later tries
    to resolve the finished row — and other requests keep completing
    (round-3 advisor medium finding)."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    svc = GenerationService(eng, slots=2, decode_horizon=1).start()
    doomed = svc.submit([4, 8], max_new=4)
    doomed.cancel()           # CANCELLED while pending/active
    other = svc.submit([1, 2, 3], max_new=4)
    out = other.result(timeout=120)   # service still alive and serving
    assert len(out) >= 3
    later = svc.submit([5, 6], max_new=2)
    assert len(later.result(timeout=120)) >= 2
    svc.stop()


def test_generation_service_window_override_token_equal():
    """A window-capped service produces the same tokens as the
    full-window service for rows that fit (the tiered-pool substrate),
    and rejects rows that could outgrow the cap."""
    from simpleinfer_tpu.serving.llm import GenerationService

    eng = _gpt_engine()
    full = GenerationService(eng, slots=2, decode_horizon=2).start()
    a = full.submit([5, 2, 7], max_new=6).result(timeout=120)
    full.stop()
    short = GenerationService(eng, slots=2, decode_horizon=2,
                              window=12).start()
    b = short.submit([5, 2, 7], max_new=6).result(timeout=120)
    with pytest.raises(ValueError, match="window"):
        short.submit([5, 2, 7], max_new=11)
    short.stop()
    np.testing.assert_array_equal(a, b)


def test_tiered_generation_service_routes_and_matches():
    """TieredGenerationService: short requests land in the short tier,
    long ones in the full tier; every stream token-equal to the uniform
    full-window service; tier pool memory is the windows-weighted sum."""
    import jax

    from simpleinfer_tpu.serving.llm import (GenerationService,
                                             TieredGenerationService)

    eng = _gpt_engine()     # model window 24
    uniform = GenerationService(eng, slots=2, decode_horizon=2).start()
    short_prompt, long_prompt = [5, 2, 7], [3, 1, 4, 1, 5, 9, 2, 6]
    want_short = uniform.submit(short_prompt, max_new=5).result(120)
    want_long = uniform.submit(long_prompt, max_new=14).result(120)
    uniform.stop()

    svc = TieredGenerationService(eng, tiers=((2, 12), (2, None)),
                                  decode_horizon=2)
    assert svc.windows == [12, 24]
    # routing: by prompt+max_new bound
    assert svc._route(short_prompt, 5) is svc.services[0]
    assert svc._route(long_prompt, 14) is svc.services[1]
    with pytest.raises(ValueError, match="largest tier"):
        svc._route(long_prompt, 20)

    svc.start()
    got_short = svc.submit(short_prompt, max_new=5).result(timeout=120)
    got_long = svc.submit(long_prompt, max_new=14).result(timeout=120)
    svc.stop()
    np.testing.assert_array_equal(got_short, want_short)
    np.testing.assert_array_equal(got_long, want_long)
    assert svc.services[0].stats.completed == 1
    assert svc.services[1].stats.completed == 1
    assert svc.stats.completed == 2

    # the memory receipt: tier pool bytes = sum(slots_i * window_i)
    # scaling, i.e. (2*12 + 2*24) / (4*24) = 0.75x of a uniform pool
    # with the same total slots
    tiered = svc.cache_bytes()
    caches = uniform._dec.init_cache(4)
    uni = sum(leaf.nbytes for leaf in jax.tree_util.tree_leaves(caches))
    assert tiered == pytest.approx(0.75 * uni, rel=0.01)


def test_http_generate_with_tiered_service():
    """TieredGenerationService is drop-in behind the HTTP server
    (submit/submit_stream/stats/cancel surface): short and long
    requests serve through their tiers, /v1/stats aggregates."""
    import json
    import urllib.request

    from simpleinfer_tpu.serving.http import InferenceServer
    from simpleinfer_tpu.serving.llm import TieredGenerationService

    eng = _gpt_engine()   # window 24
    svc = TieredGenerationService(eng, tiers=((2, 12), (2, None)),
                                  decode_horizon=2).start()
    server = InferenceServer(None, port=0, gen_service=svc).start()
    url = f"http://127.0.0.1:{server.address[1]}"

    def gen(prompt, max_new):
        body = json.dumps({"prompt": prompt,
                           "max_new": max_new}).encode()
        req = urllib.request.Request(
            f"{url}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read())

    short = gen([4, 8], 5)
    long_ = gen([3, 1, 4, 1, 5, 9], 14)
    assert len(short["ids"]) == 7 and len(long_["ids"]) == 20
    with urllib.request.urlopen(f"{url}/v1/stats", timeout=30) as resp:
        stats = json.loads(resp.read())
    server.stop()
    svc.stop()
    assert svc.services[0].stats.completed == 1   # routed to tier 1
    assert svc.services[1].stats.completed == 1   # routed to tier 2
    assert stats["completed"] == 2                # aggregated
