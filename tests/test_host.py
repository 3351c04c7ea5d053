"""Native host library tests: C implementations vs Python references.

Follows the reference's kernel-vs-Ref discipline (GemmPack4F32 vs
GemmPack4F32Ref): every native path is compared against the pure-Python
implementation it accelerates. Skipped when no C++ toolchain is present.
"""
import io
import zlib

import numpy as np
import pytest

from simpleinfer_tpu import host

pytestmark = pytest.mark.skipif(not host.available(),
                                reason="native host library not built")

RNG = np.random.default_rng(17)


def test_crc32_matches_zlib():
    for n in (0, 1, 7, 8, 9, 1000, 65537):
        data = bytes(RNG.integers(0, 256, n, dtype=np.uint8))
        assert host.crc32(data) == zlib.crc32(data)
    # seeded/incremental
    a, b = b"hello ", b"world"
    assert host.crc32(b, host.crc32(a)) == zlib.crc32(b, zlib.crc32(a))


def test_storezip_index_matches_python(tmp_path):
    from simpleinfer_tpu.ir.storezip import StoreZipReader, StoreZipWriter

    path = str(tmp_path / "t.bin")
    blobs = {f"op{i}.weight": bytes(RNG.integers(0, 256, 1000 + i,
                                                 dtype=np.uint8))
             for i in range(20)}
    with StoreZipWriter(path) as w:
        for name, data in blobs.items():
            w.write_file(name, data)
    with open(path, "rb") as f:
        buf = f.read()
    idx = host.storezip_index(buf)
    assert idx is not None and set(idx) == set(blobs)
    for name, (off, size) in idx.items():
        assert buf[off:off + size] == blobs[name]
    # and the python reader (which may itself route through native for
    # big files) agrees
    with StoreZipReader(path) as r:
        for name, data in blobs.items():
            assert r.read_file(name) == data


def test_native_reader_on_large_archive(tmp_path):
    """Archive above the native threshold exercises _try_native_index."""
    from simpleinfer_tpu.ir.storezip import StoreZipReader, StoreZipWriter

    path = str(tmp_path / "big.bin")
    big = bytes(RNG.integers(0, 256, 2 << 20, dtype=np.uint8))
    with StoreZipWriter(path) as w:
        w.write_file("big.weight", big)
        w.write_file("small.bias", b"abcd")
    with StoreZipReader(path) as r:
        assert r.read_file("big.weight") == big
        assert r.read_file("small.bias") == b"abcd"
        assert r.get_file_size("missing") == 0


def test_letterbox_native_matches_numpy():
    from simpleinfer_tpu.zoo.detect import letterbox

    for h, w in ((48, 80), (80, 48), (64, 64), (37, 53)):
        img = RNG.integers(0, 256, (h, w, 3)).astype(np.uint8)
        got, lb_n = letterbox(img, size=64, use_native=True)
        want, lb_p = letterbox(img, size=64, use_native=False)
        assert lb_n.scale == pytest.approx(lb_p.scale)
        assert (lb_n.pad_x, lb_n.pad_y) == (lb_p.pad_x, lb_p.pad_y)
        np.testing.assert_allclose(got, want, atol=2e-2)


def test_letterbox_batch_matches_single():
    imgs = [RNG.integers(0, 256, (h, w, 3)).astype(np.uint8)
            for h, w in ((48, 80), (32, 32), (100, 40))]
    batch = host.letterbox_batch(imgs, size=64)
    assert batch is not None and batch.shape == (3, 64, 64, 3)
    for i, im in enumerate(imgs):
        single = host.letterbox_one(im, size=64)
        np.testing.assert_array_equal(batch[i], single)


# ------------------------------------------------------------------- nms
def _py_nms(boxes, scores, iou_thresh=0.45, max_keep=300):
    """The numpy reference loop (zoo.detect.nms fallback), inlined so
    this test stays independent of the dispatch under test."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size and len(keep) < max_keep:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        b, a = boxes[rest], boxes[i]
        x1 = np.maximum(a[0], b[:, 0]); y1 = np.maximum(a[1], b[:, 1])
        x2 = np.minimum(a[2], b[:, 2]); y2 = np.minimum(a[3], b[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_a = (a[2] - a[0]) * (a[3] - a[1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        ious = inter / np.maximum(area_a + area_b - inter, 1e-9)
        order = rest[ious <= iou_thresh]
    return np.asarray(keep, dtype=np.int64)


def _random_boxes(n, seed):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 600, (n, 2)).astype(np.float32)
    wh = rng.uniform(4, 120, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], 1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("n", [0, 1, 7, 500, 3000])
def test_nms_native_matches_python(n):
    boxes, scores = _random_boxes(n, seed=n + 1)
    got = host.nms(boxes, scores, 0.45, 300)
    want = _py_nms(boxes, scores, 0.45, 300)
    np.testing.assert_array_equal(got, want)


def test_nms_native_tie_scores_stable():
    boxes, _ = _random_boxes(64, seed=3)
    scores = np.full(64, 0.5, np.float32)  # all tied: order by index
    got = host.nms(boxes, scores, 0.45, 300)
    want = _py_nms(boxes, scores, 0.45, 300)
    np.testing.assert_array_equal(got, want)


def test_nms_native_max_keep():
    boxes = np.asarray([[i * 200.0, 0, i * 200 + 10, 10]
                        for i in range(10)], np.float32)  # disjoint
    scores = np.linspace(0.9, 0.1, 10).astype(np.float32)
    got = host.nms(boxes, scores, 0.45, max_keep=4)
    np.testing.assert_array_equal(got, [0, 1, 2, 3])


def test_zoo_nms_dispatches_native():
    """zoo.detect.nms returns identical results whether or not the
    native path is taken (f32 inputs dispatch; f64 falls back)."""
    from simpleinfer_tpu.zoo.detect import nms as zoo_nms

    boxes, scores = _random_boxes(400, seed=9)
    native = zoo_nms(boxes, scores, 0.45, 300)
    fallback = zoo_nms(boxes.astype(np.float64),
                       scores.astype(np.float64), 0.45, 300)
    np.testing.assert_array_equal(native, fallback)


def test_nms_nan_scores_fall_back():
    boxes, scores = _random_boxes(16, seed=5)
    scores[3] = np.nan
    assert host.nms(boxes, scores, 0.45, 300) is None  # python fallback
    from simpleinfer_tpu.zoo.detect import nms as zoo_nms

    keep = zoo_nms(boxes, scores, 0.45, 300)  # must not crash
    assert len(keep) >= 1


def test_storezip_index_overflow_returns_none():
    """>4096-entry archives overflow the native index buffers; the
    walker must return None (python fallback) rather than a silently
    truncated index."""
    from simpleinfer_tpu import host
    from simpleinfer_tpu.ir.storezip import StoreZipWriter

    if not host.available():
        import pytest

        pytest.skip("native host library unavailable")
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".zip") as f:
        w = StoreZipWriter(f.name)
        for i in range(4100):
            w.write_file(f"f{i:04d}", b"x")
        w.close()
        data = open(f.name, "rb").read()
    assert host.storezip_index(data) is None  # fall back, don't truncate
