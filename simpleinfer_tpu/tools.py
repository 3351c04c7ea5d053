"""Command-line tools: model inspection and demo pipelines.

The analog of the reference's utility binaries:
- `dump`      ~ test-pnnx-ir (prints every operator/operand/param/attr,
               /root/reference/test/test_pnnx/test_pnnx_ir.cpp)
- `detect`    ~ test-yolo (letterbox -> engine -> NMS -> annotated image,
               test/test_yolo/test_yolo.cpp)
- `classify`  ~ test-classify (argmax/top-k printout,
               test/test_classify/test_classify.cpp)
- `roofline`  ~ (new) per-op cost table from profiling.py

Usage: python -m simpleinfer_tpu <command> [args]
"""
from __future__ import annotations

import argparse
import os
import sys


def cmd_dump(args) -> int:
    from .ir.dtypes import type_to_string
    from .ir.graph import Graph

    g = Graph.load(args.param, args.bin)
    print(f"{len(g.ops)} operators, {len(g.operands)} operands")
    for op in g.ops:
        print(f"\n{op.type} {op.name}")
        for r in op.inputs:
            print(f"  in:  {r.name} {type_to_string(r.type)}{r.shape}")
        for r in op.outputs:
            print(f"  out: {r.name} {type_to_string(r.type)}{r.shape}")
        for k, p in op.params.items():
            print(f"  param {k} = {p.encode()}")
        for k, a in op.attrs.items():
            print(f"  attr {k}: {type_to_string(a.type)}{a.shape}"
                  f" ({a.nbytes} bytes)")
    return 0


def _load_engine(args):
    from . import Engine, EngineConfig

    quant = args.quant or ("int8w" if args.int8 else None)
    cfg = EngineConfig(compute_dtype=args.dtype, quant=quant)
    return Engine(cfg).load_model(args.param, args.bin)


def _maybe_calibrate(eng, batch: "np.ndarray") -> None:
    """Static-int8 CLI flow: calibrate on the (preprocessed) inference
    batch itself — the demo-tool shortcut; production should calibrate
    on held-out data via Engine.calibrate."""
    if eng.config.quant == "int8":
        eng.calibrate([{eng.input_names[0]: batch}])


def cmd_detect(args) -> int:
    from .zoo.detect import detect_images
    from .zoo.imageio import draw_detections, imread, imwrite

    eng = _load_engine(args)
    images = [imread(p) for p in args.images]
    if eng.config.quant == "int8":
        import numpy as np

        from .zoo.detect import letterbox

        _maybe_calibrate(eng, np.stack(
            [letterbox(im, args.size)[0] for im in images]))
    results = detect_images(eng, images, size=args.size,
                            conf_thresh=args.conf, iou_thresh=args.iou,
                            device_decode=args.device_decode,
                            stage_uint8=args.stage_uint8)
    for path, img, dets in zip(args.images, images, results):
        print(f"{path}: {len(dets)} detections")
        for d in dets:
            x1, y1, x2, y2 = (int(v) for v in d.box)
            print(f"  {d.class_name:16s} {d.score:.3f} "
                  f"[{x1},{y1},{x2},{y2}]")
        if args.out:
            out_path = f"{args.out}/{path.split('/')[-1]}"
            imwrite(out_path, draw_detections(img, dets))
            print(f"  -> {out_path}")
    return 0


def cmd_classify(args) -> int:
    from .zoo.classify import classify_images
    from .zoo.imageio import imread

    eng = _load_engine(args)
    images = [imread(p, bgr=False) for p in args.images]
    if eng.config.quant == "int8":
        import numpy as np

        from .zoo.classify import preprocess_classify

        _maybe_calibrate(eng, np.stack(
            [preprocess_classify(im, args.size) for im in images]))
    for path, topk in zip(args.images,
                          classify_images(eng, images, size=args.size,
                                          k=args.topk)):
        print(f"{path}:")
        for cls, prob in topk:
            print(f"  class {cls}: {prob:.4f}")
    return 0


def cmd_segment(args) -> int:
    import numpy as np

    from .zoo.imageio import imread, imwrite
    from .zoo.segment import colorize_mask, segment_images

    eng = _load_engine(args)
    images = [imread(p) for p in args.images]
    masks = segment_images(eng, images, size=args.size or None)
    for path, img, m in zip(args.images, images, masks):
        classes, counts = np.unique(m, return_counts=True)
        top = sorted(zip(counts, classes), reverse=True)[:5]
        print(f"{path}: classes " + ", ".join(
            f"{c}({n}px)" for n, c in top))
        if args.out:
            out_path = f"{args.out}/{path.split('/')[-1]}"
            imwrite(out_path, colorize_mask(img, m))
            print(f"  -> {out_path}")
    return 0


def cmd_roofline(args) -> int:
    from .config import EngineConfig
    from .executor import build_program
    from .ir.graph import Graph
    from .profiling import summarize_roofline

    g = Graph.load(args.param, args.bin)
    program = build_program(g, EngineConfig())
    print(summarize_roofline(program, batch=args.batch,
                             dtype=args.dtype, top=args.top))
    return 0


def cmd_profile(args) -> int:
    """Measured per-HLO-op device profile (the runtime complement of
    `roofline`'s static table). Loads the model, compiles the forward,
    traces N enqueued forwards, prints xprof hlo_stats."""
    import numpy as np

    from .config import EngineConfig
    from .engine import Engine
    from .ir.graph import Graph
    from .profiling import device_profile, format_hlo_stats

    cfg = EngineConfig(compute_dtype=args.dtype,
                       quant=getattr(args, "quant", None))
    g = Graph.load(args.param, args.bin)
    eng = Engine(cfg).load_model(None, graph=g)
    spec = eng.program.inputs[0]
    shape = [args.batch if d == -1 else d for d in (spec.shape or [])]
    if not shape:
        raise SystemExit("model declares no input shape; cannot profile")
    x = (np.random.default_rng(0).standard_normal(shape)
         .astype(np.float32) / 4.0)
    name = spec.name
    if cfg.quant == "int8":
        eng.calibrate([{name: x}])

    import jax.numpy as jnp
    weights, program = eng._device_weights, eng.program
    # stem-packed, like Engine.input() stages it (free reshape)
    xd = program.pack_input(name, jnp.asarray(x, cfg.compute_jnp_dtype))
    out_name = program.output_names[0]

    def fwd(xi):
        return program.fn(weights, {name: xi})[out_name]

    rows = device_profile(fwd, xd, iters=args.iters, logdir=args.logdir)
    print(format_hlo_stats(rows, top=args.top, iters=args.iters))
    return 0


def cmd_export(args) -> int:
    """Serialize a model as a self-contained StableHLO artifact."""
    from .config import EngineConfig
    from .engine import Engine
    from .ir.graph import Graph

    cfg = EngineConfig(compute_dtype=args.dtype,
                       quant=getattr(args, "quant", None))
    g = Graph.load(args.param, args.bin)
    eng = Engine(cfg).load_model(None, graph=g)
    if cfg.quant == "int8" and args.calibration:
        eng.load_calibration(args.calibration)
    eng.export_model(args.out, batch=args.batch)
    print(f"wrote {args.out}")
    return 0


def cmd_calibrate(args) -> int:
    """Offline static-int8 calibration: sample batches in -> reusable
    scales artifact out (Engine.save_calibration). Each sample file is
    an npz of {input name: batch array}; feed representative data."""
    import numpy as np

    from . import Engine, EngineConfig

    cfg = EngineConfig(compute_dtype=args.dtype, quant="int8",
                       act_clip_percentile=args.percentile,
                       act_per_channel=args.per_channel)
    eng = Engine(cfg).load_model(args.param, args.bin)

    def batches():
        for path in args.samples:
            with np.load(path) as z:
                yield {k: z[k] for k in z.files}

    scales = eng.calibrate(batches())
    eng.save_calibration(args.out)
    print(f"calibrated {len(scales)} ops from {len(args.samples)} "
          f"sample file(s) -> {args.out}")
    return 0


def cmd_serve(args) -> int:
    """HTTP inference server: pnnx model -> continuous-batched endpoint
    (serving/http.py). Blocks until interrupted."""
    from .serving import BatchingService, InferenceServer

    eng = _load_engine(args)
    if eng.config.quant == "int8":
        if not args.calibration:
            raise SystemExit(
                "serve: static int8 needs offline calibration; pass "
                "--calibration scales.npz (from the calibrate command) "
                "or use --quant int8w")
        eng.load_calibration(args.calibration)
    if args.generate:
        from .serving.llm import GenerationService

        # CLI string normalization: case-insensitive keywords, clean
        # argparse-style errors instead of bare int() tracebacks on
        # inputs like 'AUTO' or '128;256'
        def _cap(v):
            if v is None:
                return "auto"
            s = v.strip().lower()
            if s == "auto":
                return "auto"
            if s in ("off", "none"):
                return None
            try:
                return int(s)
            except ValueError:
                raise SystemExit(
                    f"error: --sample-cap: expected an int, 'auto' or "
                    f"'off', got {v!r}")
        cap = _cap(args.sample_cap)

        def _ladder(name, v):
            if v is None:
                return "auto"
            s = v.strip().lower()
            if s == "auto":
                return "auto"
            if not s or s in ("off", "none"):
                return None     # empty string = disabled (env passthru)
            try:
                return tuple(int(x) for x in s.split(","))
            except ValueError:
                raise SystemExit(
                    f"error: --{name}: expected comma-separated ints "
                    f"(e.g. 128,256), 'auto' or 'off', got {v!r}")

        kwargs = dict(decode_horizon=args.decode_horizon,
                      pipelined=not args.no_pipeline,
                      kv_dtype=args.kv_dtype,
                      scratch_blocks=args.scratch_blocks,
                      sample_cap=cap,
                      kv_prefix_ladder=_ladder(
                          "kv-prefix-ladder", args.kv_prefix_ladder),
                      prefill_ladder=_ladder(
                          "prefill-ladder", args.prefill_ladder),
                      decode_attn=args.decode_attn)
        if getattr(args, "tiers", None):
            from .serving.llm import TieredGenerationService

            def _tier(tok):
                try:
                    slots, win = tok.split(":")
                    return (int(slots), None if win.strip().lower()
                            in ("full", "none") else int(win))
                except ValueError:
                    raise SystemExit(
                        f"error: --tiers: expected slots:window pairs "
                        f"(e.g. 24:512,8:full), got {tok!r}")
            gsvc = TieredGenerationService(
                eng, tiers=[_tier(t) for t in args.tiers.split(",")],
                **kwargs)
        else:
            gsvc = GenerationService(eng, slots=args.max_batch, **kwargs)
        if args.warmup:
            print("compiling admission + decode blocks ...", flush=True)
            gsvc.warmup()
        gsvc.start()
        server = InferenceServer(None, host=args.host, port=args.port,
                                 gen_service=gsvc).start()
        host, port = server.address[:2]
        print(f"serving {args.param} on http://{host}:{port} "
              f"(POST /v1/generate, GET /v1/stats, GET /healthz)",
              flush=True)
        try:
            import time

            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            print("shutting down", flush=True)
        finally:
            server.stop()
            gsvc.stop()
        return 0
    post = None
    if args.device_decode:
        from .zoo.detect import decode_device

        post = (lambda o: decode_device(o, conf_thresh=args.conf,
                                        iou_thresh=args.iou,
                                        max_det=args.max_det))
    svc = BatchingService(eng, max_batch=args.max_batch,
                          max_wait_ms=args.max_wait_ms,
                          device_postprocess=post)
    if args.warmup:
        print("compiling buckets "
              f"{svc.buckets} ...", flush=True)
        svc.warmup(probe_spill=args.probe_spill)
        if args.probe_spill:
            print(f"spill-probed buckets: {svc.buckets}", flush=True)
    svc.start()
    server = InferenceServer(svc, host=args.host, port=args.port).start()
    host, port = server.address[:2]
    print(f"serving {args.param} on http://{host}:{port} "
          f"(POST /v1/infer, POST /v1/detect, GET /v1/stats, "
          f"GET /healthz)", flush=True)
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        print("shutting down", flush=True)
    finally:
        server.stop()
        svc.stop(drain=False)
    return 0


def main(argv=None) -> int:
    # honor JAX_PLATFORMS even when a TPU PJRT plugin is installed (the
    # plugin registers itself above the env var; jax.config wins)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat.split(",")[0])

    ap = argparse.ArgumentParser(prog="simpleinfer_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("dump", help="print the pnnx IR of a model")
    p.add_argument("param")
    p.add_argument("bin", nargs="?")
    p.set_defaults(fn=cmd_dump)

    for name, fn in (("detect", cmd_detect), ("classify", cmd_classify)):
        p = sub.add_parser(name, help=f"{name} demo pipeline")
        p.add_argument("param")
        p.add_argument("bin")
        p.add_argument("images", nargs="+")
        p.add_argument("--size", type=int,
                       default=640 if name == "detect" else 224)
        p.add_argument("--dtype", default="bfloat16",
                       choices=["float32", "bfloat16"])
        p.add_argument("--int8", action="store_true",
                       help="shorthand for --quant int8w")
        p.add_argument("--quant", choices=["int8w", "int8", "int4w"],
                       help="int8w = weight-only; int8 = static "
                            "activation quant (calibrates on the input "
                            "batch)")
        if name == "detect":
            p.add_argument("--conf", type=float, default=0.25)
            p.add_argument("--iou", type=float, default=0.45)
            p.add_argument("--out", help="directory for annotated images")
            p.add_argument("--stage-uint8", action="store_true",
                           help="ship the letterboxed canvas as uint8 "
                                "bytes and normalize on device (4x "
                                "fewer upload bytes)")
            p.add_argument("--device-decode", action="store_true",
                           help="run score-filter + NMS on the TPU and "
                                "fetch only the kept rows (fast when "
                                "the chip is remote)")
        else:
            p.add_argument("--topk", type=int, default=5)
        p.set_defaults(fn=fn)

    p = sub.add_parser("profile",
                       help="measured per-HLO-op device profile "
                            "(jax.profiler + xprof hlo_stats)")
    p.add_argument("param")
    p.add_argument("bin", nargs="?")
    p.add_argument("--batch", type=int, default=1,
                   help="substituted for ?-dims in the declared shape")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--quant", choices=["int8w", "int8", "int4w"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--logdir", default="/tmp/si_device_profile")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("segment", help="semantic segmentation demo "
                                       "pipeline")
    p.add_argument("param")
    p.add_argument("bin")
    p.add_argument("images", nargs="+")
    p.add_argument("--size", type=int, default=0,
                   help="input size (default: model's declared size)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--int8", action="store_true",
                   help="shorthand for --quant int8w")
    p.add_argument("--quant", choices=["int8w", "int8", "int4w"])
    p.add_argument("--out", help="directory for overlay images")
    p.set_defaults(fn=cmd_segment)

    p = sub.add_parser("serve", help="HTTP inference server "
                                     "(continuous batching)")
    p.add_argument("param")
    p.add_argument("bin", nargs="?")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--int8", action="store_true",
                   help="shorthand for --quant int8w")
    p.add_argument("--quant", choices=["int8w", "int8", "int4w"])
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--max-wait-ms", type=float, default=2.0)
    p.add_argument("--warmup", action="store_true",
                   help="compile every bucket before accepting traffic")
    p.add_argument("--decode-horizon", type=int, default=16,
                   help="with --generate: decode steps per dispatch "
                        "(K tokens per relay RTT; 16 measured 6x over "
                        "per-token, docs/PERF.md)")
    p.add_argument("--probe-spill", action="store_true",
                   help="with --warmup: drop buckets whose executables "
                        "spill XLA temps (>32 MB) — large offered "
                        "loads are served as clean-bucket waves "
                        "instead of paying the spill (docs/PERF.md)")
    p.add_argument("--calibration",
                   help="scales npz from the calibrate command "
                        "(required with --quant int8)")
    p.add_argument("--device-decode", action="store_true",
                   help="detection models: run score-filter + NMS on "
                        "device; /v1/infer and /v1/detect return "
                        "[max_det, 6] rows instead of the raw head")
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--generate", action="store_true",
                   help="causal LM: serve continuous-batching KV-cache "
                        "generation (POST /v1/generate) instead of "
                        "/v1/infer; --max-batch sets the slot count")
    p.add_argument("--no-pipeline", action="store_true",
                   help="with --generate: disable the chained in-flight "
                        "decode block (strictly sequential dispatch)")
    p.add_argument("--kv-dtype", choices=["float32", "bfloat16", "int8"],
                   help="with --generate: KV-cache storage — bfloat16 "
                        "halves the per-step cache read (1.54x decode "
                        "at long windows, docs/PERF.md), int8 quarters "
                        "the cache footprint (longer windows per HBM "
                        "byte)")
    import argparse as _ap

    p.add_argument("--scratch-blocks", action=_ap.BooleanOptionalAction,
                   default=True,
                   help="with --generate: decode blocks accumulate new "
                        "k/v in a per-block scratch and merge once, "
                        "instead of rewriting the cache every step "
                        "(distribution-identical, not bit-identical "
                        "across block sizes). Default ON "
                        "(--no-scratch-blocks for the bit-stable path)")
    p.add_argument("--kv-prefix-ladder", default="auto",
                   help="with --generate: comma-separated ascending "
                        "attention-read bounds (e.g. 128,256); each "
                        "decode block reads only the smallest rung "
                        "covering the live rows' positions instead of "
                        "the whole window (rungs compile at --warmup). "
                        "Default 'auto' (window/8, /4, /2); 'off' reads "
                        "the full window every block")
    p.add_argument("--decode-attn", choices=["xla", "pallas", "auto"],
                   default="auto",
                   help="with --generate: frozen-cache attention read "
                        "inside decode blocks — 'pallas' runs the "
                        "flash-decoding kernel with PER-ROW lengths "
                        "(each row reads only its occupied cache "
                        "blocks; supersedes --kv-prefix-ladder) and "
                        "in-register int8 dequant; 'auto' keeps rung "
                        "blocks while a rung covers the pool and flips "
                        "to the kernel when an aged row blocks every "
                        "rung (pools >= 16 slots; measured 2.52x on a "
                        "mixed-age slots-32 pool)")
    p.add_argument("--tiers", default=None,
                   help="with --generate: tiered KV pools as "
                        "slots:window pairs (e.g. '24:512,8:full') — "
                        "each request is routed to the smallest tier "
                        "whose window fits prompt+max_new, so short "
                        "requests stop paying full-window cache memory "
                        "(supersedes --max-batch; 'full' = the model "
                        "window)")
    p.add_argument("--prefill-ladder", default="auto",
                   help="with --generate: comma-separated admission "
                        "prefill bucket widths (e.g. 64,256); each "
                        "admission wave prefills at the smallest bucket "
                        "covering its longest prompt instead of the "
                        "full window. Default 'auto' (64,256,1024 + "
                        "window); 'off' always pads to the window")
    p.add_argument("--sample-cap", default="auto",
                   help="with --generate: sample from the top-N "
                        "candidates (lax.top_k + exact full-vocab "
                        "logsumexp) instead of sorting the whole "
                        "vocabulary each decode step. Default 'auto': "
                        "per-dispatch choice, capped whenever every "
                        "live row is greedy or 0 < top_k <= 64 (never "
                        "truncates); an int forces that cap; 'off' "
                        "always sorts the full vocabulary")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("calibrate",
                       help="offline static-int8 calibration -> "
                            "scales npz artifact")
    p.add_argument("param")
    p.add_argument("bin", nargs="?")
    p.add_argument("samples", nargs="+",
                   help="npz files of {input name: batch array}")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--percentile", type=float,
                   help="clip to this percentile of |x| instead of absmax")
    p.add_argument("--per-channel", action="store_true",
                   help="per-channel activation scales, SmoothQuant-"
                        "balanced and folded into the weights (zero "
                        "inference cost; helps skewed channel ranges). "
                        "Load the artifact with the same flag.")
    p.set_defaults(fn=cmd_calibrate)

    p = sub.add_parser("export",
                       help="compile to a self-contained StableHLO "
                            "artifact (weights baked in; load with "
                            "simpleinfer_tpu.load_exported)")
    p.add_argument("param")
    p.add_argument("bin", nargs="?")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--quant", choices=["int8w", "int8", "int4w"])
    p.add_argument("--calibration",
                   help="scales npz (from the calibrate command) for "
                        "--quant int8")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("roofline", help="per-op roofline cost table")
    p.add_argument("param")
    p.add_argument("bin", nargs="?")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--top", type=int, default=20)
    p.set_defaults(fn=cmd_roofline)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
