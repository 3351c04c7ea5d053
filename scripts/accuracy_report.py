"""INT8-vs-FP32 acceptance report (BASELINE.json config 3 discipline).

Without labeled datasets in this environment, the fp32 engine acts as
ground truth: the report shows detection mAP of the int8 engine scored
against fp32 detections (a behavior-preservation proxy: lossless
quantization -> mAP 1.0), plus classification top-1 agreement.

    python scripts/accuracy_report.py [--variant n] [--img 320] [--n 8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="n")
    ap.add_argument("--img", type=int, default=320)
    ap.add_argument("--n", type=int, default=8, help="images")
    ap.add_argument("--classes", type=int, default=80)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--quant", default="int8w", choices=["int8w", "int8"],
                    help="int8w = weight-only; int8 = static activation "
                         "quant (calibrates on a held-out batch first)")
    ap.add_argument("--per-channel", action="store_true",
                    help="with --quant int8: per-channel activation "
                         "scales (SmoothQuant-balanced weight folding)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.zoo import build_resnet18, build_yolov5
    from simpleinfer_tpu.zoo.metrics import int8_parity_report, top1_accuracy

    rng = np.random.default_rng(0)

    # ---- detection -----------------------------------------------------
    g_fp, in_name, _ = build_yolov5(args.variant, batch=args.n,
                                    image_size=args.img)
    g_q, _, _ = build_yolov5(args.variant, batch=args.n,
                             image_size=args.img)
    fp = Engine(EngineConfig()).load_model(None, graph=g_fp)
    q = Engine(EngineConfig(compute_dtype="bfloat16",
                            quant=args.quant)).load_model(None, graph=g_q)
    x = rng.standard_normal(
        (args.n, args.img, args.img, 3)).astype(np.float32) / 2
    if args.quant == "int8":
        calib = rng.standard_normal(
            (args.n, args.img, args.img, 3)).astype(np.float32) / 2
        q.calibrate([{in_name: calib}])
    rep = int8_parity_report(fp, q, x, conf_thresh=0.25,
                             num_classes=args.classes)
    print(rep)
    fp.release()
    q.release()

    # ---- classification ------------------------------------------------
    g_fp, in_name, out_name = build_resnet18(batch=args.n, image_size=224,
                                             num_classes=1000)
    g_q, _, _ = build_resnet18(batch=args.n, image_size=224,
                               num_classes=1000)
    fp = Engine(EngineConfig()).load_model(None, graph=g_fp)
    q = Engine(EngineConfig(compute_dtype="bfloat16",
                            quant=args.quant)).load_model(None, graph=g_q)
    xi = rng.standard_normal((args.n, 224, 224, 3)).astype(np.float32)
    if args.quant == "int8":
        q.calibrate([{in_name: rng.standard_normal(
            (args.n, 224, 224, 3)).astype(np.float32)}])
    lf = fp.run({in_name: xi})[out_name]
    lq = np.asarray(q.run({in_name: xi})[out_name], np.float32)
    agree = top1_accuracy(lq, np.argmax(lf, axis=-1))
    print(f"resnet18 int8 top-1 agreement with fp32: {agree:.1%} over "
          f"{args.n} inputs (drift budget 0.5%)")


if __name__ == "__main__":
    main()
