"""Tests for the demo layer: letterbox, NMS, decode, classify pipeline.

Oracle discipline follows the reference's app-level checks
(test_yolo.cpp pre/postprocess, SURVEY.md §3.4): scalar reference
implementations inline in the tests.
"""
import numpy as np
import pytest

from simpleinfer_tpu.zoo.classify import preprocess_classify, softmax, top_k
from simpleinfer_tpu.zoo.detect import (
    Letterbox,
    decode_predictions,
    detect_images,
    iou_xyxy,
    letterbox,
    nms,
)

RNG = np.random.default_rng(3)


# -------------------------------------------------------------- letterbox
def test_letterbox_geometry():
    img = np.full((100, 200, 3), 255, np.uint8)  # wide image
    canvas, lb = letterbox(img, size=64, normalize=False)
    assert canvas.shape == (64, 64, 3)
    assert lb.scale == pytest.approx(64 / 200)
    # vertical padding: scaled height = 32, so 16 px gray top and bottom
    assert lb.pad_y == 16 and lb.pad_x == 0
    assert (canvas[:16] == 114.0).all() and (canvas[-16:] == 114.0).all()
    assert (canvas[16:48] == 255.0).all()


def test_letterbox_unmap_roundtrip():
    lb = Letterbox(scale=0.5, pad_x=10, pad_y=20)
    boxes = np.asarray([[10.0, 20.0, 110.0, 120.0]])
    back = lb.unmap(boxes)
    np.testing.assert_allclose(back, [[0.0, 0.0, 200.0, 200.0]])


def test_letterbox_bgr_to_rgb():
    img = np.zeros((10, 10, 3), np.uint8)
    img[..., 0] = 200  # blue channel (BGR)
    canvas, _ = letterbox(img, size=10, normalize=False)
    assert (canvas[..., 2] == 200).all() and (canvas[..., 0] == 0).all()


# -------------------------------------------------------------------- nms
def test_iou_exact():
    a = np.asarray([0.0, 0, 10, 10])
    b = np.asarray([[5.0, 5, 15, 15], [20, 20, 30, 30], [0, 0, 10, 10]])
    got = iou_xyxy(a, b)
    np.testing.assert_allclose(got, [25 / 175, 0.0, 1.0], atol=1e-6)


def test_nms_suppresses_overlaps():
    boxes = np.asarray([[0.0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]])
    scores = np.asarray([0.9, 0.8, 0.7])
    keep = nms(boxes, scores, iou_thresh=0.45)
    assert list(keep) == [0, 2]


def test_nms_keeps_all_when_disjoint():
    boxes = np.asarray([[i * 20.0, 0, i * 20 + 10, 10] for i in range(5)])
    scores = RNG.uniform(0.1, 1.0, 5)
    keep = nms(boxes, scores, iou_thresh=0.45)
    assert sorted(keep) == list(range(5))
    # keep is ordered by descending score
    assert (np.diff(scores[keep]) <= 1e-9).all()


# ------------------------------------------------------------------ decode
def _pred_row(cx, cy, w, h, obj, cls_probs):
    return np.asarray([cx, cy, w, h, obj, *cls_probs], np.float32)


def test_decode_thresholds_and_classes():
    nc = 3
    pred = np.stack([
        _pred_row(100, 100, 20, 20, 0.9, [0.9, 0.05, 0.05]),  # class 0
        _pred_row(100, 100, 22, 22, 0.8, [0.0, 0.9, 0.1]),    # class 1 overlap
        _pred_row(300, 300, 40, 40, 0.9, [0.0, 0.1, 0.9]),    # class 2
        _pred_row(50, 50, 10, 10, 0.1, [0.9, 0.05, 0.05]),    # below thresh
    ])
    dets = decode_predictions(pred, conf_thresh=0.25, iou_thresh=0.45)
    # class-wise NMS: overlapping boxes of DIFFERENT classes both survive
    assert len(dets) == 3
    assert sorted(d.class_id for d in dets) == [0, 1, 2]
    d0 = next(d for d in dets if d.class_id == 0)
    assert d0.box == pytest.approx((90, 90, 110, 110))
    assert d0.score == pytest.approx(0.9 * 0.9)


def test_decode_class_agnostic_suppresses_cross_class():
    pred = np.stack([
        _pred_row(100, 100, 20, 20, 0.9, [0.9, 0.05]),
        _pred_row(100, 100, 22, 22, 0.8, [0.0, 0.9]),
    ])
    dets = decode_predictions(pred, conf_thresh=0.25, class_agnostic=True)
    assert len(dets) == 1 and dets[0].class_id == 0


def test_decode_unmap_and_clip():
    pred = np.stack([_pred_row(5, 5, 20, 20, 0.9, [1.0])])
    lb = Letterbox(scale=1.0, pad_x=0, pad_y=0)
    dets = decode_predictions(pred, lb, image_shape=(100, 100))
    assert dets[0].box == pytest.approx((0, 0, 15, 15))  # clipped at 0


def test_decode_empty():
    pred = np.zeros((10, 85), np.float32)
    assert decode_predictions(pred) == []


# ---------------------------------------------------------------- classify
def test_preprocess_classify_shape_and_norm():
    img = RNG.integers(0, 255, (300, 400, 3)).astype(np.uint8)
    x = preprocess_classify(img, size=64)
    assert x.shape == (64, 64, 3)
    # un-normalized variant stays in [0,1]
    x2 = preprocess_classify(img, size=64, normalize=False)
    assert 0.0 <= x2.min() and x2.max() <= 1.0


def test_softmax_topk():
    logits = np.asarray([[0.0, 2.0, 1.0]])
    p = softmax(logits)
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-6)
    tk = top_k(logits, k=2)
    assert tk[0][0][0] == 1 and tk[0][1][0] == 2


# ------------------------------------------------------- end-to-end demo
def test_nms_jax_matches_numpy():
    from simpleinfer_tpu.zoo.detect import nms_jax

    rng = np.random.default_rng(11)
    boxes = rng.uniform(0, 80, (64, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 30, (64, 2))
    scores = rng.permutation(64).astype(np.float32) / 64  # distinct
    for thr in (0.3, 0.45, 0.7):
        want = nms(boxes, scores, iou_thresh=thr)
        got = np.asarray(nms_jax(boxes, scores, iou_thresh=thr,
                                 max_keep=64))
        got = got[got >= 0]
        assert list(got) == list(want), thr


def test_nms_jax_max_keep_and_padding():
    from simpleinfer_tpu.zoo.detect import nms_jax

    boxes = np.asarray([[i * 20.0, 0, i * 20 + 10, 10]
                        for i in range(5)], np.float32)
    scores = np.asarray([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
    out = np.asarray(nms_jax(boxes, scores, max_keep=3))
    assert list(out) == [0, 1, 2]  # truncated at max_keep
    # negative scores are absent rows
    scores[1] = -1.0
    out = np.asarray(nms_jax(boxes, scores, max_keep=5))
    assert list(out) == [0, 2, 3, 4, -1]


def test_decode_device_matches_host():
    from simpleinfer_tpu.zoo.detect import decode_device

    rng = np.random.default_rng(12)
    nc, m, n = 4, 96, 2
    pred = np.zeros((n, m, 5 + nc), np.float32)
    cxy = rng.uniform(30, 600, (n, m, 2))
    wh = rng.uniform(8, 60, (n, m, 2))
    pred[..., :2], pred[..., 2:4] = cxy, wh
    pred[..., 4] = rng.uniform(0, 1, (n, m))
    pred[..., 5:] = rng.dirichlet(np.ones(nc), (n, m))
    rows = np.asarray(decode_device(pred, conf_thresh=0.25,
                                    iou_thresh=0.45, max_det=96))
    assert rows.shape == (n, 96, 6)
    for i in range(n):
        want = decode_predictions(pred[i], conf_thresh=0.25,
                                  iou_thresh=0.45)
        got = rows[i][rows[i][:, 4] >= 0]
        assert len(got) == len(want)
        for g, d in zip(got, want):  # both score-ordered
            assert g[:4] == pytest.approx(d.box, abs=1e-3)
            assert g[4] == pytest.approx(d.score, abs=1e-5)
            assert int(g[5]) == d.class_id


def test_decode_device_bf16_input_matches_f32():
    """bf16 engine outputs must not break the 4096-class-offset NMS
    (bf16's 8-bit mantissa would collapse same-class boxes and stop all
    suppression — caught in review, fixed by decoding in f32)."""
    import jax.numpy as jnp

    from simpleinfer_tpu.zoo.detect import decode_device

    rng = np.random.default_rng(13)
    m = 60
    pred = np.zeros((1, m, 5 + 3), np.float32)
    # 10 clusters of 6 heavily-overlapping same-class boxes
    centers = rng.uniform(100, 500, (10, 2))
    for ci, (cx, cy) in enumerate(centers):
        for j in range(6):
            r = ci * 6 + j
            pred[0, r, :2] = (cx + rng.uniform(-1, 1),
                              cy + rng.uniform(-1, 1))
            pred[0, r, 2:4] = (40, 40)
            pred[0, r, 4] = 0.9 - 0.01 * j
            pred[0, r, 5 + (ci % 3)] = 1.0
    f32 = np.asarray(decode_device(pred, max_det=60))
    b16 = np.asarray(decode_device(jnp.asarray(pred, jnp.bfloat16),
                                   max_det=60))
    n32 = int((f32[0, :, 4] >= 0).sum())
    n16 = int((b16[0, :, 4] >= 0).sum())
    assert n32 == 10  # one survivor per cluster
    assert n16 == n32
    np.testing.assert_array_equal(f32[0, :, 5], b16[0, :, 5])


def test_decode_device_v8_and_empty():
    from simpleinfer_tpu.zoo.detect import decode_device

    pred = np.zeros((1, 20, 4 + 3), np.float32)  # all zero-confidence
    rows = np.asarray(decode_device(pred, head="v8", max_det=8))
    assert rows.shape == (1, 8, 6)
    assert (rows[0, :, 4] < 0).all()


def test_detect_images_device_decode_matches_host():
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_yolov5

    graph, in_name, _ = build_yolov5("n", batch=2, image_size=64)
    eng = Engine().load_model(None, graph=graph)
    imgs = [RNG.integers(0, 255, (48, 80, 3)).astype(np.uint8),
            RNG.integers(0, 255, (80, 48, 3)).astype(np.uint8)]
    host = detect_images(eng, imgs, size=64, conf_thresh=0.01)
    dev = detect_images(eng, imgs, size=64, conf_thresh=0.01,
                        device_decode=True)
    assert len(dev) == len(host) == 2
    for hd, dd in zip(host, dev):
        assert len(hd) == len(dd)
        for a, b in zip(hd, dd):
            assert a.class_id == b.class_id
            assert a.score == pytest.approx(b.score, abs=1e-4)
            assert a.box == pytest.approx(b.box, abs=0.1)


def test_detect_images_uint8_staging_close_to_float():
    """stage_uint8 ships the canvas as bytes + normalizes on device;
    the <=0.5/255 rounding perturbation must leave scores ~unchanged.
    (Detections of a random-weight model have near-tied scores whose
    ORDER can flip under any perturbation, so compare score/box
    populations, not positions.)"""
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_yolov5

    graph, _, _ = build_yolov5("n", batch=1, image_size=64)
    eng = Engine().load_model(None, graph=graph)
    img = RNG.integers(0, 255, (48, 80, 3)).astype(np.uint8)
    f32 = detect_images(eng, [img], size=64, conf_thresh=0.05)[0]
    u8 = detect_images(eng, [img], size=64, conf_thresh=0.05,
                       stage_uint8=True)[0]
    assert abs(len(u8) - len(f32)) <= max(2, len(f32) // 20)
    a = np.sort([d.score for d in f32])
    b = np.sort([d.score for d in u8])
    n = min(len(a), len(b))
    np.testing.assert_allclose(a[-n:], b[-n:], atol=0.02)


def test_detect_images_end_to_end():
    """Full demo path through a real (tiny) yolov5 engine."""
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_yolov5

    graph, in_name, _ = build_yolov5("n", batch=2, image_size=64)
    eng = Engine().load_model(None, graph=graph)
    imgs = [RNG.integers(0, 255, (48, 80, 3)).astype(np.uint8),
            RNG.integers(0, 255, (80, 48, 3)).astype(np.uint8)]
    results = detect_images(eng, imgs, size=64)
    assert len(results) == 2
    for dets, img in zip(results, imgs):
        for d in dets:
            x1, y1, x2, y2 = d.box
            assert 0 <= x1 <= img.shape[1] and 0 <= y2 <= img.shape[0]
            assert 0.0 < d.score <= 1.0
            assert isinstance(d.class_name, str)


def test_classify_images_end_to_end():
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_resnet18
    from simpleinfer_tpu.zoo.classify import classify_images

    graph, in_name, _ = build_resnet18(batch=1, image_size=64,
                                       num_classes=10, width=8)
    eng = Engine().load_model(None, graph=graph)
    img = RNG.integers(0, 255, (100, 120, 3)).astype(np.uint8)
    tk = classify_images(eng, [img], size=64, k=3)
    assert len(tk) == 1 and len(tk[0]) == 3
    assert abs(sum(p for _, p in tk[0])) <= 1.0 + 1e-6


def test_detect_images_yolov8_auto_head():
    """detect_images auto-detects the v8 head (no objectness column)."""
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_yolov8
    from simpleinfer_tpu.zoo.detect import detect_images

    g, _, _ = build_yolov8("n", batch=1, image_size=64)
    eng = Engine().load_model(None, graph=g)
    img = (np.random.default_rng(3).integers(0, 255, (80, 60, 3))
           .astype(np.uint8))
    dets = detect_images(eng, [img], size=64, conf_thresh=0.0)
    assert isinstance(dets[0], list)
    if dets[0]:
        d = dets[0][0]
        assert 0 <= d.class_id < 80 and 0.0 <= d.score <= 1.0


def test_large_variant_presets_build():
    """yolov5x and yolov8l presets produce runnable graphs with wider/
    deeper structure than their s/n siblings."""
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_yolov5, build_yolov8

    for build, variant, small in ((build_yolov5, "x", "s"),
                                  (build_yolov8, "l", "n")):
        g, in_name, out_name = build(variant, batch=1, image_size=64)
        g_small, _, _ = build(small, batch=1, image_size=64)
        assert len(g.ops) > len(g_small.ops)
        eng = Engine().load_model(None, graph=g)
        x = RNG.standard_normal((1, 64, 64, 3)).astype(np.float32)
        y = np.asarray(eng.run({in_name: x})[out_name], np.float32)
        assert np.isfinite(y).all()
        eng.release()


# ----------------------------------------------------------- segmentation
def test_unet_parity():
    """UNet builder vs the torch oracle (transpose convs + skip cats)."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from torch_ref import run_graph_torch

    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_unet

    g, in_name, out_name = build_unet(batch=1, image_size=32,
                                      num_classes=5, width=8, depth=2)
    x = RNG.standard_normal((1, 3, 32, 32)).astype(np.float32)
    want = run_graph_torch(g, {in_name: x})[out_name]
    eng = Engine().load_model(None, graph=g)
    got = eng.run({in_name: np.transpose(x, (0, 2, 3, 1))})[out_name]
    got = np.transpose(got, (0, 3, 1, 2))
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, atol=2e-3 * scale, rtol=1e-3)


def test_densenet_parity():
    """DenseNet builder vs the torch oracle (dense concat growth,
    pre-activation BN-ReLU-conv, avgpool transitions)."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from torch_ref import run_graph_torch

    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_densenet

    g, in_name, out_name = build_densenet((2, 3), batch=2, image_size=32,
                                          num_classes=7, growth_rate=4,
                                          init_width=8)
    x = RNG.standard_normal((2, 3, 32, 32)).astype(np.float32)
    want = run_graph_torch(g, {in_name: x})[out_name]
    eng = Engine().load_model(None, graph=g)
    got = eng.run({in_name: np.transpose(x, (0, 2, 3, 1))})[out_name]
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, atol=2e-3 * scale, rtol=1e-3)


def test_densenet_presets_build():
    from simpleinfer_tpu.zoo import build_densenet

    g, _, _ = build_densenet("121", batch=1, image_size=224)
    convs = [op for op in g.ops if op.type == "nn.Conv2d"]
    # 121 = 1 stem + 2*58 dense-layer convs + 3 transitions + classifier
    assert len(convs) == 1 + 2 * (6 + 12 + 24 + 16) + 3
    cats = [op for op in g.ops if op.type == "torch.cat"]
    assert len(cats) == 6 + 12 + 24 + 16


def test_squeezenet_parity():
    """SqueezeNet builder vs the torch oracle (fire modules: parallel
    1x1/3x3 expand cats, conv classifier + GAP)."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from torch_ref import run_graph_torch

    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_squeezenet

    g, in_name, out_name = build_squeezenet(batch=2, image_size=64,
                                            num_classes=7, width_mult=0.25)
    x = RNG.standard_normal((2, 3, 64, 64)).astype(np.float32)
    want = run_graph_torch(g, {in_name: x})[out_name]
    eng = Engine().load_model(None, graph=g)
    got = eng.run({in_name: np.transpose(x, (0, 2, 3, 1))})[out_name]
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, atol=2e-3 * scale, rtol=1e-3)


def test_segment_pipeline_end_to_end():
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo import build_unet
    from simpleinfer_tpu.zoo.segment import (colorize_mask,
                                             preprocess_segment,
                                             segment_images)

    g, _, _ = build_unet(batch=2, image_size=32, num_classes=4,
                         width=8, depth=1)
    eng = Engine().load_model(None, graph=g)
    imgs = [RNG.integers(0, 255, (48, 64, 3)).astype(np.uint8),
            RNG.integers(0, 255, (32, 32, 3)).astype(np.uint8)]
    masks = segment_images(eng, imgs)
    assert masks[0].shape == (48, 64) and masks[1].shape == (32, 32)
    assert masks[0].dtype == np.int32
    assert set(np.unique(masks[0])) <= set(range(4))
    # device argmax (default) is bit-identical to the host path
    host_masks = segment_images(eng, imgs, device_argmax=False)
    for a, b in zip(masks, host_masks):
        np.testing.assert_array_equal(a, b)
    overlay = colorize_mask(imgs[0], masks[0])
    assert overlay.shape == imgs[0].shape and overlay.dtype == np.uint8
    x = preprocess_segment(imgs[0], 32)
    assert x.shape == (32, 32, 3) and 0.0 <= x.min() and x.max() <= 1.0


def test_segment_cli(tmp_path):
    from simpleinfer_tpu.tools import main
    from simpleinfer_tpu.zoo import build_unet
    from simpleinfer_tpu.zoo.imageio import imwrite

    g, _, _ = build_unet(batch=1, image_size=32, num_classes=4,
                         width=8, depth=1)
    param, binf = str(tmp_path / "u.pnnx.param"), str(tmp_path / "u.pnnx.bin")
    g.save(param, binf)
    img_path = str(tmp_path / "img.ppm")
    imwrite(img_path, RNG.integers(0, 255, (40, 40, 3)).astype(np.uint8))
    rc = main(["segment", param, binf, img_path, "--dtype", "float32",
               "--out", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "img.ppm").exists()


def test_pipelines_adapt_to_nchw_engines():
    """zoo pipelines stage NHWC internally; an io_layout='nchw' engine
    must produce the SAME detections/masks/top-k (was silently mangled
    before zoo/common.stage_for_engine)."""
    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.zoo import build_unet, build_yolov5
    from simpleinfer_tpu.zoo.classify import classify_images
    from simpleinfer_tpu.zoo.segment import segment_images

    img = RNG.integers(0, 255, (40, 56, 3)).astype(np.uint8)

    gd, _, _ = build_yolov5("n", batch=1, image_size=64)
    nhwc = Engine().load_model(None, graph=gd)
    nchw = Engine(EngineConfig(io_layout="nchw")).load_model(None, graph=gd)
    a = detect_images(nhwc, [img], size=64, conf_thresh=0.05)[0]
    b = detect_images(nchw, [img], size=64, conf_thresh=0.05)[0]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.class_id == y.class_id
        assert x.score == pytest.approx(y.score, abs=1e-5)

    gs, _, _ = build_unet(batch=1, image_size=32, num_classes=4, width=8,
                          depth=1)
    m_nhwc = segment_images(Engine().load_model(None, graph=gs), [img])[0]
    m_nchw = segment_images(Engine(EngineConfig(io_layout="nchw"))
                            .load_model(None, graph=gs), [img])[0]
    np.testing.assert_array_equal(m_nhwc, m_nchw)

    from simpleinfer_tpu.zoo import build_resnet18
    gc, _, _ = build_resnet18(batch=1, image_size=32, num_classes=6,
                              width=8)
    c_nhwc = classify_images(Engine().load_model(None, graph=gc), [img],
                             size=32, k=3)
    c_nchw = classify_images(Engine(EngineConfig(io_layout="nchw"))
                             .load_model(None, graph=gc), [img],
                             size=32, k=3)
    assert [i for i, _ in c_nhwc[0]] == [i for i, _ in c_nchw[0]]


def test_unet_int8w_close_to_fp32():
    """ConvTranspose2d weights now quantize (int8w): UNet masks under
    weight-only int8 should rarely differ from fp32 (decoder weights
    dominate the model)."""
    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.zoo import build_unet
    from simpleinfer_tpu.zoo.segment import segment_images

    g, _, _ = build_unet(batch=1, image_size=32, num_classes=4, width=8,
                         depth=2)
    img = RNG.integers(0, 255, (40, 40, 3)).astype(np.uint8)
    m_fp = segment_images(Engine().load_model(None, graph=g), [img])[0]
    m_q = segment_images(Engine(EngineConfig(
        compute_dtype="bfloat16", quant="int8w")).load_model(
            None, graph=g), [img])[0]
    # random-weight logits are near-tied, so allow some flips; bulk must
    # agree
    assert (m_fp == m_q).mean() > 0.85
