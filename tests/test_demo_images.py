"""The reference's real demo photos through the full detect pipeline.

The reference's flagship artifact is the annotated-JPEG YOLO demo on
real photos (/root/reference/test/test_yolo/test_yolo.cpp:278-441,
README.md:23-33, source images /root/reference/imgs/). These tests run
that chain on the REAL image bytes — PIL decode -> letterbox -> engine
forward -> NMS -> unletterbox -> draw -> imwrite -> re-decode — with a
tiny random-weight model (fast on CPU; the full-size on-chip run is
scripts/yolo_real_images_demo.py, artifacts in docs/imgs/).
"""
import os

import numpy as np
import pytest

REF_IMG = "/root/reference/imgs/bus.jpg"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_IMG),
    reason="reference demo images not present")


@pytest.fixture(scope="module")
def bus():
    from simpleinfer_tpu.zoo.imageio import imread

    img = imread(REF_IMG)          # HWC uint8 BGR, like cv::imread
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 256 and img.shape[1] > 256  # real photo
    return img


def test_letterbox_geometry_native_matches_python_on_real_jpeg(bus):
    """The csrc native letterbox and the numpy path agree on the real
    photo: identical scale/pad geometry, near-identical pixels."""
    from simpleinfer_tpu import host
    from simpleinfer_tpu.zoo.detect import letterbox

    want, lb_p = letterbox(bus, size=320, use_native=False)
    assert want.shape == (320, 320, 3)
    # geometry must be exactly the reference's: scale = 320/max(h,w),
    # pad centers the short side (test_yolo.cpp PreProcess)
    h, w = bus.shape[:2]
    scale = 320.0 / max(h, w)
    assert lb_p.scale == pytest.approx(scale)
    new_w, new_h = round(w * scale), round(h * scale)
    assert (lb_p.pad_x, lb_p.pad_y) == ((320 - new_w) // 2,
                                        (320 - new_h) // 2)
    if host.available():
        got, lb_n = letterbox(bus, size=320, use_native=True)
        assert lb_n.scale == pytest.approx(lb_p.scale)
        assert (lb_n.pad_x, lb_n.pad_y) == (lb_p.pad_x, lb_p.pad_y)
        np.testing.assert_allclose(got, want, atol=2e-2)


def test_real_jpeg_detect_roundtrip(bus, tmp_path):
    """Full chain on real bytes: JPEG -> letterbox -> forward -> NMS ->
    draw -> imwrite -> re-decode. Box count is NMS-bounded, every box
    lands inside the photo, and the annotated JPEG round-trips."""
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo.builders import build_yolov5
    from simpleinfer_tpu.zoo.detect import detect_images
    from simpleinfer_tpu.zoo.imageio import (draw_detections, imread,
                                             imwrite)

    graph, _, _ = build_yolov5("n", batch=1, image_size=160, seed=3)
    eng = Engine().load_model(None, graph=graph)
    (dets,) = detect_images(eng, [bus], size=160, max_det=50,
                            device_decode=True)
    assert 0 < len(dets) <= 50                    # finite, NMS-bounded
    h, w = bus.shape[:2]
    for d in dets:
        x1, y1, x2, y2 = d.box
        assert 0 <= x1 <= x2 <= w + 1e-3
        assert 0 <= y1 <= y2 <= h + 1e-3
        assert 0.0 <= d.score <= 1.0
        assert isinstance(d.class_name, str)
    out = tmp_path / "result_bus.jpg"
    imwrite(str(out), draw_detections(bus.copy(), dets[:10]))
    back = imread(str(out))
    assert back.shape == bus.shape                # valid JPEG written


def test_real_jpeg_device_decode_matches_host_decode(bus):
    """device_decode=True (on-device score filter + NMS, the remote-chip
    mode the demo uses) finds the same boxes as the host numpy decode."""
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo.builders import build_yolov5
    from simpleinfer_tpu.zoo.detect import detect_images

    graph, _, _ = build_yolov5("n", batch=1, image_size=160, seed=3)
    eng = Engine().load_model(None, graph=graph)
    (dev,) = detect_images(eng, [bus], size=160, device_decode=True)
    (hst,) = detect_images(eng, [bus], size=160, device_decode=False)
    assert len(dev) == len(hst)
    a = sorted(dev, key=lambda d: -d.score)
    b = sorted(hst, key=lambda d: -d.score)
    for x, y in zip(a[:20], b[:20]):
        assert x.class_id == y.class_id
        assert x.score == pytest.approx(y.score, abs=1e-4)
        np.testing.assert_allclose(x.box, y.box, atol=0.5)
