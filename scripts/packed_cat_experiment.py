"""Paired A/B: cat-split 1x1 convs in the packed domain vs unpacking.

Motivation (docs/PERF.md): the yolov5s-640-b8 bf16 profile shows the
packed 160px region paying 2x ~0.1 ms unpack copies (conv.py PackedW
.unpack at the C3 cat junction) plus matching repacks. The packed
cat-split path (ops/conv._apply_split_packed) slices the block-diagonal
bt_in{g} weight per source so the region flows packed through the 1x1.

Same-process paired measurement with profiling.measure_device_time;
the ops.conv._PACKED_CAT_SPLIT flag flips between engine builds.
"""
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def build_fwd(enabled: bool, cfg, batch, img):
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.ops import conv as conv_mod
    from simpleinfer_tpu.zoo import build_yolov5

    conv_mod._PACKED_CAT_SPLIT = enabled
    graph, in_name, out_name = build_yolov5("s", batch=batch,
                                            image_size=img)
    eng = Engine(cfg).load_model(None, graph=graph)
    program, weights = eng.program, eng._device_weights

    def fwd(xi):
        return program.fn(weights, {in_name: xi})[out_name]

    return fwd, program, in_name


def main() -> int:
    import jax.numpy as jnp

    from simpleinfer_tpu import EngineConfig
    from simpleinfer_tpu.profiling import measure_device_time

    batch, img = 8, 640
    cfg = EngineConfig(compute_dtype="bfloat16")
    x_np = (np.random.default_rng(0)
            .standard_normal((batch, img, img, 3)).astype(np.float32) / 4)

    results = {}
    outs = {}
    for label, enabled in (("A unpack-at-cat", False),
                           ("B packed-cat   ", True)):
        fwd, program, in_name = build_fwd(enabled, cfg, batch, img)
        x = program.pack_input(in_name, jnp.asarray(
            x_np, cfg.compute_jnp_dtype))
        t0 = time.perf_counter()
        dt = measure_device_time(fwd, x, iters=12)
        outs[label] = np.asarray(fwd(x), np.float32)
        results[label] = dt
        print(f"{label}: {dt * 1e3:7.3f} ms  "
              f"(compile+measure {time.perf_counter() - t0:.0f}s)")
    (a, b) = results.values()
    print(f"speedup A/B: {a / b:.3f}x")
    oa, ob = outs.values()
    err = float(np.max(np.abs(oa - ob)))
    print(f"max |A-B|: {err:.4f} (bf16 tolerance ~1e-1 on decode scale)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
