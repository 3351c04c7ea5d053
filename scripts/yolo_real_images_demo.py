"""The reference's flagship YOLO visual demo, on its real photos.

Mirrors /root/reference/test/test_yolo/test_yolo.cpp:278-441 end to end,
through the framework's REAL file surface:

  build yolov5s -> save .pnnx.param/.bin (ir.Graph.save) ->
  Engine.load_model(param, bin) -> PIL-decode the reference's demo
  JPEGs (imgs/{bus,zidane,car,31}.jpg, read-only) -> letterbox(640,
  pad 114) -> one batched forward -> score filter + class-wise NMS ->
  unletterbox -> draw boxes/labels -> write docs/imgs/result_*.jpg

The reference demo runs a TRAINED yolov5s checkpoint from its model
submodule; that submodule is empty in this snapshot and the environment
has no egress (docs/BASELINE_RESULTS.md "real weights" protocol), so the
weights here are the zoo builder's random init. The boxes in the result
images are therefore arbitrary — what this demo proves is the full
real-image path: JPEG bytes -> preprocess -> pnnx load -> TPU forward ->
device decode -> postprocess -> annotated JPEG, the same artifact chain
as README.md:23-33.

Usage:  python scripts/yolo_real_images_demo.py [--size 640] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

IMGS = ("bus.jpg", "zidane.jpg", "car.jpg", "31.jpg")
REF_IMG_DIR = "/root/reference/imgs"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--variant", default="s")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "imgs"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (no TPU compile wait)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import numpy as np

    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.zoo.builders import build_yolov5
    from simpleinfer_tpu.zoo.detect import detect_images
    from simpleinfer_tpu.zoo.imageio import (draw_detections, imread,
                                             imwrite)

    paths = [os.path.join(REF_IMG_DIR, n) for n in IMGS]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        print(f"reference images not found: {missing}", file=sys.stderr)
        return 1

    # the reference demo loads model FILES (LoadModel(param, bin)) —
    # exercise the same surface: save the built graph as a real pnnx
    # pair, then load it back through the engine
    import tempfile

    graph, in_name, _ = build_yolov5(args.variant, batch=len(IMGS),
                                     image_size=args.size, seed=7)
    with tempfile.TemporaryDirectory() as td:
        param = os.path.join(td, f"yolov5{args.variant}.pnnx.param")
        binp = os.path.join(td, f"yolov5{args.variant}.pnnx.bin")
        graph.save(param, binp)
        print(f"saved pnnx pair ({os.path.getsize(binp)/1e6:.1f} MB bin)",
              file=sys.stderr)
        eng = Engine().load_model(param, binp)

    images = [imread(p) for p in paths]          # HWC uint8 BGR
    t0 = time.perf_counter()
    results = detect_images(eng, images, size=args.size,
                            conf_thresh=args.conf, iou_thresh=args.iou,
                            device_decode=True)
    dt = time.perf_counter() - t0
    print(f"detect_images({len(images)} images) in {dt:.1f}s "
          f"(includes compile)", file=sys.stderr)

    os.makedirs(args.out, exist_ok=True)
    for path, img, dets in zip(paths, images, results):
        name = os.path.basename(path)
        # the reference prints one line per box (test_yolo.cpp:147-154)
        print(f"{name}: {len(dets)} detections "
              f"({img.shape[1]}x{img.shape[0]})")
        for d in dets[:5]:
            x1, y1, x2, y2 = (int(v) for v in d.box)
            print(f"  {d.class_name:14s} {d.score:.3f} "
                  f"[{x1},{y1},{x2},{y2}]")
        if len(dets) > 5:
            print(f"  ... {len(dets) - 5} more")
        for d in dets:          # boxes must land inside the image
            x1, y1, x2, y2 = d.box
            assert 0 <= x1 <= x2 <= img.shape[1] + 1e-3, d.box
            assert 0 <= y1 <= y2 <= img.shape[0] + 1e-3, d.box
        # random weights saturate NMS's max_det; draw the top-20 so the
        # committed artifact stays legible (a trained checkpoint would
        # emit a handful of boxes like README.md:23-33)
        top = sorted(dets, key=lambda d: -d.score)[:20]
        out_path = os.path.join(args.out, f"result_{name}")
        imwrite(out_path, draw_detections(img.copy(), top))
        print(f"  -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
