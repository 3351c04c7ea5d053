"""HTTP serving front-end tests (CPU, tiny model, ephemeral port)."""
import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from simpleinfer_tpu import Engine
from simpleinfer_tpu.serving import BatchingService, InferenceServer
from simpleinfer_tpu.serving.http import NPY_CONTENT_TYPE
from simpleinfer_tpu.zoo import build_resnet18

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def served():
    graph, _, _ = build_resnet18(batch=1, image_size=32, num_classes=6,
                                 width=8)
    eng = Engine().load_model(None, graph=graph)
    svc = BatchingService(eng, max_batch=8, max_wait_ms=20).start()
    server = InferenceServer(svc, port=0).start()
    host, port = server.address[:2]
    yield eng, svc, f"http://{host}:{port}"
    server.stop()
    svc.stop(drain=False)


def _post(url, body: bytes, ctype: str):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def _get_json(url):
    with urllib.request.urlopen(url, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz(served):
    _, _, base = served
    status, body = _get_json(base + "/healthz")
    assert status == 200 and body == {"status": "ok"}


def test_infer_npy_roundtrip(served):
    eng, _, base = served
    x = RNG.standard_normal((32, 32, 3)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, x, allow_pickle=False)
    status, ctype, body = _post(base + "/v1/infer", buf.getvalue(),
                                NPY_CONTENT_TYPE)
    assert status == 200 and ctype == NPY_CONTENT_TYPE
    got = np.load(io.BytesIO(body), allow_pickle=False)
    want = eng.run({eng.input_names[0]: x[None]})[eng.output_names[0]][0]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_infer_json_roundtrip(served):
    eng, _, base = served
    x = RNG.standard_normal((32, 32, 3)).astype(np.float32)
    status, _, body = _post(base + "/v1/infer",
                            json.dumps({"input": x.tolist()}).encode(),
                            "application/json")
    assert status == 200
    payload = json.loads(body)
    got = np.asarray(payload["output"], dtype=np.float32)
    assert payload["shape"] == list(got.shape)
    want = eng.run({eng.input_names[0]: x[None]})[eng.output_names[0]][0]
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_concurrent_requests_batched(served):
    eng, svc, base = served
    import concurrent.futures as cf

    xs = [RNG.standard_normal((32, 32, 3)).astype(np.float32)
          for _ in range(12)]

    def one(x):
        buf = io.BytesIO()
        np.save(buf, x, allow_pickle=False)
        status, _, body = _post(base + "/v1/infer", buf.getvalue(),
                                NPY_CONTENT_TYPE)
        assert status == 200
        return np.load(io.BytesIO(body), allow_pickle=False)

    before = svc.stats.batches
    with cf.ThreadPoolExecutor(max_workers=12) as ex:
        got = np.stack(list(ex.map(one, xs)))
    want = eng.run({eng.input_names[0]: np.stack(xs)})[eng.output_names[0]]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # concurrent posts should merge into fewer device batches
    assert svc.stats.batches - before < 12


def test_stats_endpoint(served):
    _, svc, base = served
    status, body = _get_json(base + "/v1/stats?slo_ms=1000")
    assert status == 200
    assert body["requests"] == svc.stats.requests
    assert body["item_shape"] == [32, 32, 3]
    assert "slo" in body and isinstance(body["per_bucket"], dict)


def test_metrics_prometheus_format(served):
    _, svc, base = served
    with urllib.request.urlopen(base + "/metrics", timeout=30) as resp:
        assert resp.status == 200
        assert resp.headers.get("Content-Type", "").startswith("text/plain")
        text = resp.read().decode()
    assert f"si_requests_total {svc.stats.requests}" in text
    assert "# TYPE si_batches_total counter" in text
    assert "si_batch_occupancy" in text


def test_bad_shape_is_400(served):
    _, _, base = served
    buf = io.BytesIO()
    np.save(buf, np.zeros((8, 8, 3), np.float32), allow_pickle=False)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/infer", buf.getvalue(), NPY_CONTENT_TYPE)
    assert ei.value.code == 400
    assert "expected item shape" in json.loads(ei.value.read())["error"]


def test_bad_body_is_400(served):
    _, _, base = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/infer", b"not npy or json", NPY_CONTENT_TYPE)
    assert ei.value.code == 400


def test_bf16_output_is_portable():
    """bf16 engines must not leak ml_dtypes arrays onto the wire
    (np.save writes them as void16; JSON encoding fails) — the server
    casts to float32."""
    from simpleinfer_tpu import EngineConfig

    graph, _, _ = build_resnet18(batch=1, image_size=32, num_classes=6,
                                 width=8)
    eng = Engine(EngineConfig(compute_dtype="bfloat16")).load_model(
        None, graph=graph)
    svc = BatchingService(eng, max_batch=4, max_wait_ms=5).start()
    server = InferenceServer(svc, port=0).start()
    try:
        host, port = server.address[:2]
        base = f"http://{host}:{port}"
        x = RNG.standard_normal((32, 32, 3)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x, allow_pickle=False)
        status, _, body = _post(base + "/v1/infer", buf.getvalue(),
                                NPY_CONTENT_TYPE)
        assert status == 200
        got = np.load(io.BytesIO(body), allow_pickle=False)
        assert got.dtype == np.float32
        status, _, body = _post(base + "/v1/infer",
                                json.dumps({"input": x.tolist()}).encode(),
                                "application/json")
        assert status == 200 and json.loads(body)["shape"] == [6]
    finally:
        server.stop()
        svc.stop(drain=False)


def test_unknown_route_is_404(served):
    _, _, base = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get_json(base + "/nope")
    assert ei.value.code == 404


def test_uint8_request_deterministic_under_cobatching(served):
    """uint8 items must be u8_scale-normalized at the HTTP boundary:
    co-batching with f32 requests previously dtype-promoted them
    UNSCALED (result depended on what else was in flight)."""
    eng, _, base = served
    import concurrent.futures as cf

    u8 = (RNG.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
    want = eng.run({eng.input_names[0]:
                    (u8.astype(np.float32) / 255.0)[None]})[
        eng.output_names[0]][0]

    def post_npy(arr):
        buf = io.BytesIO()
        np.save(buf, arr, allow_pickle=False)
        status, _, body = _post(base + "/v1/infer", buf.getvalue(),
                                NPY_CONTENT_TYPE)
        assert status == 200
        return np.load(io.BytesIO(body), allow_pickle=False)

    # alone
    got_alone = post_npy(u8)
    np.testing.assert_allclose(got_alone, want, atol=1e-4, rtol=1e-4)
    # co-batched with f32 traffic
    f32s = [RNG.standard_normal((32, 32, 3)).astype(np.float32)
            for _ in range(6)]
    with cf.ThreadPoolExecutor(max_workers=7) as ex:
        futs = [ex.submit(post_npy, a) for a in [u8] + f32s]
        got_mixed = futs[0].result()
    np.testing.assert_allclose(got_mixed, want, atol=1e-4, rtol=1e-4)


def test_oversized_request_does_not_desync_keepalive(served):
    """An early 400 (unread body) must close the connection — otherwise
    the next request on the socket is parsed from leftover body bytes."""
    import http.client

    _, _, base = served
    host, port = base.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.request("POST", "/v1/infer", body=b"x" * 10,
                     headers={"Content-Type": NPY_CONTENT_TYPE,
                              "Content-Length": str(2**40)})
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        # server must have closed; a reused connection either raises or
        # (after auto-reconnect) serves the request correctly — never
        # returns a 501 from parsing leftover bytes
        try:
            conn.request("GET", "/healthz")
            resp2 = conn.getresponse()
            assert resp2.status == 200
        except (http.client.HTTPException, ConnectionError, OSError):
            pass  # closed connection is the expected behavior
    finally:
        conn.close()


# ----------------------------------------------------------- /v1/detect
@pytest.fixture(scope="module")
def detect_served():
    from simpleinfer_tpu.zoo import build_yolov5
    from simpleinfer_tpu.zoo.detect import decode_device

    graph, _, _ = build_yolov5("n", batch=1, image_size=64)
    eng = Engine().load_model(None, graph=graph)
    svc = BatchingService(eng, max_batch=4, max_wait_ms=5).start()
    server = InferenceServer(svc, port=0).start()
    host, port = server.address[:2]

    eng2 = Engine().load_model(None, graph=graph)
    svc2 = BatchingService(
        eng2, max_batch=4, max_wait_ms=5,
        device_postprocess=lambda o: decode_device(
            o, conf_thresh=0.01, max_det=64)).start()
    server2 = InferenceServer(svc2, port=0).start()
    host2, port2 = server2.address[:2]
    yield f"http://{host}:{port}", f"http://{host2}:{port2}"
    server.stop(); svc.stop(drain=False)
    server2.stop(); svc2.stop(drain=False)


def _detect_json(base, img, query=""):
    body = json.dumps({"image": img.tolist()}).encode()
    return _post(base + "/v1/detect" + query, body, "application/json")


def test_detect_endpoint_host_decode(detect_served):
    base, _ = detect_served
    img = RNG.integers(0, 255, (48, 72, 3)).astype(np.uint8)
    status, ctype, body = _detect_json(base, img, "?conf=0.01")
    assert status == 200 and ctype.startswith("application/json")
    out = json.loads(body)
    assert out["count"] == len(out["detections"])
    for d in out["detections"]:
        x1, y1, x2, y2 = d["box"]
        assert 0 <= x1 <= 72 and 0 <= y2 <= 48
        assert 0 < d["score"] <= 1 and isinstance(d["class_name"], str)


def test_detect_endpoint_npy_body(detect_served):
    base, _ = detect_served
    img = RNG.integers(0, 255, (40, 40, 3)).astype(np.uint8)
    buf = io.BytesIO(); np.save(buf, img, allow_pickle=False)
    status, _, body = _post(base + "/v1/detect?conf=0.01", buf.getvalue(),
                            NPY_CONTENT_TYPE)
    assert status == 200
    assert json.loads(body)["count"] >= 0


def test_detect_endpoint_device_decoded_rows(detect_served):
    base_host, base_dev = detect_served
    img = RNG.integers(0, 255, (48, 72, 3)).astype(np.uint8)
    _, _, hb = _detect_json(base_host, img, "?conf=0.01")
    _, _, db = _detect_json(base_dev, img)
    host_dets = json.loads(hb)["detections"]
    dev_dets = json.loads(db)["detections"]
    # device decode caps at max_det=64; both paths agree on the top rows
    n = min(len(host_dets), len(dev_dets))
    assert n > 0
    for a, b in zip(host_dets[:n], dev_dets[:n]):
        assert a["class_id"] == b["class_id"]
        assert abs(a["score"] - b["score"]) < 1e-3


def test_detect_endpoint_bad_image_is_400(detect_served):
    base, _ = detect_served
    img = RNG.integers(0, 255, (8, 8)).astype(np.uint8)  # not HWC
    with pytest.raises(urllib.error.HTTPError) as ei:
        _detect_json(base, img)
    assert ei.value.code == 400
    assert "HWC" in json.loads(ei.value.read())["error"]


def test_detect_endpoint_on_classifier_errors(served):
    _, _, base = served  # resnet service: item is square, decode fails
    img = RNG.integers(0, 255, (20, 20, 3)).astype(np.uint8)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _detect_json(base, img, "?conf=0.5")
    # classifier output rows don't decode; server must answer, not hang
    assert ei.value.code in (400, 500)


def test_detect_endpoint_single_class_raw_rows_host_decoded():
    """A 1-class yolov5 raw head row is 6 columns wide — the server
    must branch on service configuration (device_post), not row shape,
    or raw xywh rows get misread as decoded xyxy (review finding)."""
    from simpleinfer_tpu.zoo import build_yolov5

    graph, _, _ = build_yolov5("n", batch=1, image_size=64,
                               num_classes=1)
    eng = Engine().load_model(None, graph=graph)
    svc = BatchingService(eng, max_batch=2, max_wait_ms=5).start()
    server = InferenceServer(svc, port=0).start()
    host, port = server.address[:2]
    try:
        img = RNG.integers(0, 255, (48, 72, 3)).astype(np.uint8)
        _, _, body = _detect_json(f"http://{host}:{port}", img,
                                  "?conf=0.01")
        out = json.loads(body)
        # host decode ran: boxes are inside the image, class ids valid
        for d in out["detections"]:
            x1, y1, x2, y2 = d["box"]
            assert 0 <= x1 <= x2 <= 72 and 0 <= y1 <= y2 <= 48
            assert d["class_id"] == 0
            assert 0 < d["score"] <= 1
    finally:
        server.stop()
        svc.stop(drain=False)


def test_detect_endpoint_bad_query_param_is_400(detect_served):
    base, _ = detect_served
    img = RNG.integers(0, 255, (20, 20, 3)).astype(np.uint8)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _detect_json(base, img, "?conf=abc")
    assert ei.value.code == 400
    assert "conf" in json.loads(ei.value.read())["error"]


# ---------------------------------------------------------- /v1/generate
@pytest.fixture(scope="module")
def gen_served():
    from simpleinfer_tpu.serving.llm import GenerationService
    from simpleinfer_tpu.zoo import build_gpt

    graph, _, _ = build_gpt(variant="nano", batch=1, seq_len=24,
                            vocab_size=40, depth=2, width=32, num_heads=4)
    eng = Engine().load_model(None, graph=graph)
    gsvc = GenerationService(eng, slots=2).start()
    server = InferenceServer(None, port=0, gen_service=gsvc).start()
    host, port = server.address[:2]
    yield eng, gsvc, f"http://{host}:{port}"
    server.stop()
    gsvc.stop()


def test_generate_endpoint(gen_served):
    eng, _, base = gen_served
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    want = CachedDecoder(eng).generate(np.asarray([[3, 7, 11]]),
                                       steps=5)[0]
    body = json.dumps({"prompt": [3, 7, 11], "max_new": 5}).encode()
    status, _, out = _post(base + "/v1/generate", body, "application/json")
    assert status == 200
    payload = json.loads(out)
    assert payload["prompt_len"] == 3
    np.testing.assert_array_equal(payload["ids"], want)


def test_generate_validation_and_stats(gen_served):
    _, _, base = gen_served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/generate",
              json.dumps({"max_new": 5}).encode(), "application/json")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/infer",
              json.dumps({"input": [1.0]}).encode(), "application/json")
    assert ei.value.code == 400  # generation-only server
    status, stats = _get_json(base + "/v1/stats")
    assert status == 200 and stats["tokens_out"] >= 5
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        text = r.read().decode()
    assert "si_gen_tokens_total" in text
