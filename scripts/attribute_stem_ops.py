"""PER-OP attribution of the yolov5 high-res stem region (round-5).

The round-4 config-4 attribution showed 47% of yolov5l int8 wall time
in `conv_1..conv_14` (stem + conv1 + first C3) at 9-21% MXU util —
bandwidth-bound. Before building the cross-conv VMEM fusion kernel,
this script resolves WHERE inside that segment the milliseconds sit
(stem 6x6s2 / conv1 3x3s2 / the C3 1x1s / the C3 3x3s): the kernel's
fusion boundary should wrap the ops that actually pay, and per-op
roofline arithmetic says the answer is not obvious (the C3's hid-width
3x3s are K=N=hid matmuls at 25% MXU ceiling — fusing them trades a
bandwidth problem for a compute problem unless they are a small share).

Uses profiling.attribute_slices with EXPLICIT per-op cuts over the
first `--ops` plan entries (one prefix program per op), then one final
cut for the rest of the model.

Usage: python scripts/attribute_stem_ops.py [--variant l --batch 16
       --quant int8] [--ops 16]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--variant", default="l")
    ap.add_argument("--ops", type=int, default=16)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--quant", default="int8",
                    choices=["int8", "int8w", "none"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.profiling import (attribute_slices,
                                           chip_speed_factor)
    from simpleinfer_tpu.zoo import build_yolov5

    cfg = EngineConfig(compute_dtype="bfloat16",
                       quant=None if args.quant == "none" else args.quant)
    graph, in_name, out_name = build_yolov5(args.variant,
                                            batch=args.batch,
                                            image_size=args.img)
    eng = Engine(cfg).load_model(None, graph=graph)
    x_np = (np.random.default_rng(0).standard_normal(
        (args.batch, args.img, args.img, 3)).astype(np.float32) / 4.0)
    if cfg.quant == "int8":
        eng.calibrate([{in_name: x_np}])

    factor = chip_speed_factor()
    print(f"chip_speed_factor before: {factor:.3f}", flush=True)

    program, weights = eng.program, eng._device_weights
    xs = program.pack_input(in_name, jnp.asarray(
        x_np, cfg.compute_jnp_dtype))

    for i, (impl, ins, outs) in enumerate(program.plan[:args.ops]):
        shapes = program.op_output_shapes.get(impl.name, [])
        print(f"  plan[{i:2d}] {impl.name:12s} {impl.type:20s} "
              f"-> {shapes}", flush=True)

    cuts = list(range(1, args.ops + 1))
    rows = attribute_slices(program, weights, {in_name: xs},
                            cuts=cuts, iters=args.iters,
                            compiler_options=eng.
                            _effective_compiler_options())
    t_sum = sum(r[2] for r in rows) or 1e-9
    print(f"\n{'op segment':28s} {'ms':>8s} {'%':>5s} {'GFLOP':>8s} "
          f"{'TFLOP/s':>8s}")
    for label, ops, t, flops in rows:
        fl = flops * args.batch
        tf = fl / t / 1e12 if t > 0 else float("nan")
        print(f"{label[:28]:28s} {t * 1e3:8.3f} {t / t_sum * 100:5.1f} "
              f"{fl / 1e9:8.1f} {tf:8.1f}")
    print(f"\nchip_speed_factor after: {chip_speed_factor():.3f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
