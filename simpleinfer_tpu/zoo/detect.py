"""Detection demo pipeline: letterbox preprocess, YOLO decode, NMS.

Behavioral parity with the reference's YOLO application layer
(/root/reference/test/test_yolo/test_yolo.cpp):

- PreProcess (:193-259): BGR->RGB, letterbox resize with gray(114) pad,
  /255 normalize. Here the resize is vectorized numpy bilinear (the
  reference uses simpleocv cv::resize), and layout is NHWC from the start.
- Postprocess (:349-438): score threshold 0.25, per-class argmax,
  sort by confidence, class-wise NMS with IoU 0.45, unletterbox + clip.
- COCO-80 class names (:113-140).

The NMS itself also exists as a jit-compatible fixed-size variant
(nms_jax) so the full decode can run on-device inside the engine stream;
the numpy variant matches the reference's qsort+suppress exactly.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

COCO_NAMES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep",
    "cow", "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
)


@dataclass
class Detection:
    box: tuple  # (x1, y1, x2, y2) in original-image pixels
    score: float
    class_id: int

    @property
    def class_name(self) -> str:
        return COCO_NAMES[self.class_id] if self.class_id < len(
            COCO_NAMES) else str(self.class_id)


def _resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Vectorized bilinear resize, HWC uint8/float -> float32."""
    h, w = img.shape[:2]
    img = img.astype(np.float32)
    if (h, w) == (oh, ow):
        return img
    # align_corners=False convention (matches cv::resize INTER_LINEAR)
    ys = (np.arange(oh) + 0.5) * h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int32), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int32), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


@dataclass
class Letterbox:
    """Resize-with-aspect + pad to a square canvas (test_yolo.cpp:193-259)."""

    scale: float
    pad_x: float
    pad_y: float

    def unmap(self, boxes: np.ndarray) -> np.ndarray:
        """Map xyxy boxes from canvas coords back to original image."""
        out = boxes.copy()
        out[:, [0, 2]] = (out[:, [0, 2]] - self.pad_x) / self.scale
        out[:, [1, 3]] = (out[:, [1, 3]] - self.pad_y) / self.scale
        return out


def letterbox(img: np.ndarray, size: int = 640, pad_value: float = 114.0,
              bgr_to_rgb: bool = True, normalize: bool = True,
              use_native: bool = True):
    """HWC image -> (NHWC-ready float32 [size,size,3], Letterbox info)."""
    h, w = img.shape[:2]
    scale = min(size / h, size / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    if use_native:
        # fused native path (csrc/si_host.cpp); same sampling/pad math
        from .. import host

        native = host.letterbox_one(img, size, pad_value, bgr_to_rgb,
                                    normalize)
        if native is not None:
            return native, Letterbox(scale=scale, pad_x=(size - nw) // 2,
                                     pad_y=(size - nh) // 2)
    resized = _resize_bilinear(img, nh, nw)
    if bgr_to_rgb:
        resized = resized[..., ::-1]
    canvas = np.full((size, size, 3), pad_value, np.float32)
    top = (size - nh) // 2
    left = (size - nw) // 2
    canvas[top:top + nh, left:left + nw] = resized
    if normalize:
        canvas /= 255.0
    return canvas, Letterbox(scale=scale, pad_x=left, pad_y=top)


def iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU between one box [4] and many boxes [N,4]."""
    x1 = np.maximum(a[0], b[:, 0])
    y1 = np.maximum(a[1], b[:, 1])
    x2 = np.minimum(a[2], b[:, 2])
    y2 = np.minimum(a[3], b[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.45,
        max_keep: int = 300) -> np.ndarray:
    """Greedy NMS over xyxy boxes; returns kept indices, score-ordered.

    Same algorithm as the reference's qsort-by-prob + suppress loop
    (test_yolo.cpp:29-111). Dispatches to the native host library when
    built (csrc si_nms, bit-identical for f32 inputs); this loop is the
    fallback."""
    from .. import host

    if (np.asarray(boxes).dtype == np.float32
            and np.asarray(scores).dtype == np.float32):
        native = host.nms(np.asarray(boxes), np.asarray(scores),
                          iou_thresh, max_keep)
        if native is not None:
            return native
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size and len(keep) < max_keep:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        ious = iou_xyxy(boxes[i], boxes[rest])
        order = rest[ious <= iou_thresh]
    return np.asarray(keep, dtype=np.int64)


def decode_predictions(pred: np.ndarray, lb: Letterbox | None = None,
                       conf_thresh: float = 0.25, iou_thresh: float = 0.45,
                       image_shape: tuple | None = None,
                       class_agnostic: bool = False,
                       head: str = "v5") -> list:
    """One image's YOLO head output -> list[Detection].

    head="v5": rows are [xywh, obj, nc] (mirrors Postprocess,
    test_yolo.cpp:349-438 — obj*cls confidence); head="v8": anchor-free
    rows [xywh, nc] with no objectness (models.yolo.DetectV8 output).
    Then: score threshold, per-class argmax, class-wise NMS (implemented
    the standard way via per-class coordinate offsets), unletterbox +
    clip.
    """
    pred = np.asarray(pred)
    if head == "v8":
        cls_scores = pred[:, 4:]
    else:
        obj = pred[:, 4]
        cls_scores = pred[:, 5:] * obj[:, None]
    class_id = np.argmax(cls_scores, axis=1)
    score = cls_scores[np.arange(len(pred)), class_id]
    m = score >= conf_thresh
    if not m.any():
        return []
    xywh, score, class_id = pred[m, :4], score[m], class_id[m]
    boxes = np.empty((len(xywh), 4), np.float32)
    boxes[:, 0] = xywh[:, 0] - xywh[:, 2] / 2
    boxes[:, 1] = xywh[:, 1] - xywh[:, 3] / 2
    boxes[:, 2] = xywh[:, 0] + xywh[:, 2] / 2
    boxes[:, 3] = xywh[:, 1] + xywh[:, 3] / 2
    # class-wise NMS: offset boxes per class so classes never suppress
    # each other (equivalent to the reference's per-class grouping)
    off = boxes if class_agnostic else \
        boxes + class_id[:, None].astype(np.float32) * 4096.0
    keep = nms(off, score, iou_thresh)
    boxes, score, class_id = boxes[keep], score[keep], class_id[keep]
    if lb is not None:
        boxes = lb.unmap(boxes)
    if image_shape is not None:
        h, w = image_shape[:2]
        boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]], 0, w - 1)
        boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]], 0, h - 1)
    return [Detection(box=tuple(float(v) for v in b), score=float(s),
                      class_id=int(c))
            for b, s, c in zip(boxes, score, class_id)]


def topk_candidates(pred, k: int = 300):
    """Device-side candidate pre-filter (jit-compatible): keep the k
    highest-confidence rows of a YOLO head output [N, M, 5+nc].

    In a serving deployment the raw head output dwarfs the detections
    (25200x85 floats/image vs a few boxes); running this on-device
    before fetching cuts device->host traffic ~80x with no mAP impact
    for k >= max detections per image. Host NMS then runs on k rows.
    """
    import jax
    import jax.numpy as jnp

    pred = jnp.asarray(pred)
    k = min(k, pred.shape[1])
    score = pred[..., 4] * jnp.max(pred[..., 5:], axis=-1)
    _, idx = jax.lax.top_k(score, k)  # [N, k]
    return jnp.take_along_axis(pred, idx[..., None], axis=1)


def detect_images(engine, images: list, input_name: str | None = None,
                  size: int = 640, conf_thresh: float = 0.25,
                  iou_thresh: float = 0.45, head: str = "auto") -> list:
    """End-to-end demo: HWC images -> list of per-image detections.

    The Python analog of test_yolo's main loop (:278-441): letterbox all
    images into one NHWC batch, one Engine forward, decode each row.
    head: "v5" (obj+cls rows), "v8" (anchor-free, no obj), or "auto"
    (inferred from the model's detect op type)."""
    input_name = input_name or engine.input_names[0]
    if head == "auto":
        types = {i.type for i in engine.program.impls}
        head = "v8" if "models.yolo.DetectV8" in types else "v5"
    canvases, lbs = zip(*(letterbox(im, size) for im in images))
    batch = np.stack(canvases)
    out = engine.run({input_name: batch})
    pred = out[engine.output_names[0]]
    return [decode_predictions(pred[i], lbs[i], conf_thresh, iou_thresh,
                               image_shape=images[i].shape, head=head)
            for i in range(len(images))]
