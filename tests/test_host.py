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
