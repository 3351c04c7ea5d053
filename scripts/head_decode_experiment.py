"""Paired A/B/C/D: YOLO head decode placement x upsample implementation.

Flags measured (same process, profiling.measure_device_time, yolov5s
640 b8 bf16 with packed stem input):
  ops.yolo._DECODE_AFTER_CONCAT  — one fused decode after a bf16 logits
    concat (halves the head-concat traffic) vs per-level f32 decode.
  ops.shape._UPSAMPLE_BROADCAST  — integer-scale nearest upsample as
    broadcast+reshape vs two gathers (gathers materialize transposed
    operand relayout copies in the yolov5s trace).
"""
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main() -> int:
    import jax.numpy as jnp

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.ops import shape as shape_mod
    from simpleinfer_tpu.ops import yolo as yolo_mod
    from simpleinfer_tpu.profiling import measure_device_time
    from simpleinfer_tpu.zoo import build_yolov5

    batch, img = 8, 640
    cfg = EngineConfig(compute_dtype="bfloat16")
    x_np = (np.random.default_rng(0)
            .standard_normal((batch, img, img, 3)).astype(np.float32) / 4)

    combos = [
        ("A perlevel+gather   ", False, False),
        ("B perlevel+broadcast", False, True),
        ("C concat  +gather   ", True, False),
        ("D concat  +broadcast", True, True),
    ]
    for label, dec, ups in combos:
        yolo_mod._DECODE_AFTER_CONCAT = dec
        shape_mod._UPSAMPLE_BROADCAST = ups
        graph, in_name, out_name = build_yolov5("s", batch=batch,
                                                image_size=img)
        eng = Engine(cfg).load_model(None, graph=graph)
        program, weights = eng.program, eng._device_weights
        x = program.pack_input(in_name, jnp.asarray(
            x_np, cfg.compute_jnp_dtype))

        def fwd(xi, _p=program, _w=weights, _i=in_name, _o=out_name):
            return _p.fn(_w, {_i: xi})[_o]

        t0 = time.perf_counter()
        dt = measure_device_time(fwd, x, iters=12)
        print(f"{label}: {dt * 1e3:7.3f} ms  "
              f"(compile+measure {time.perf_counter() - t0:.0f}s)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
