"""A/B: XLA-chosen (AUTO) input layouts vs default for the headline model.

Motivation (docs/PERF.md, measured 2026-08-17 with scripts/
profile_model.py): the bf16 yolov5s-640-b8 forward spends ~435 us/iter
(17.5%) in `data formatting` copies, ~207 us of which re-lay the INPUT
for the packed stem conv (copy.10 [8,640,640,3] + copy.11
[8,640,80,24]) on every call. XLA would rather receive the argument in
the conv's preferred layout — jax.experimental.layout.Layout.AUTO asks
the compiler for that layout, and device_put can stage the array in it.

Measures, with profiling.measure_device_time (chained loop):
  A. status quo: raw [B,H,W,3] input, default layouts
  B. host-pre-packed input (program.pack_input — a free row-major
     reshape), default layouts
  C. pre-packed input + AUTO arg layout, carry pinned with
     with_layout_constraint inside the loop body
"""
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.profiling import measure_device_time
    from simpleinfer_tpu.zoo import build_yolov5

    batch, img = 8, 640
    graph, in_name, out_name = build_yolov5("s", batch=batch,
                                            image_size=img)
    cfg = EngineConfig(compute_dtype="bfloat16")
    eng = Engine(cfg).load_model(None, graph=graph)
    program, weights = eng.program, eng._device_weights

    x_np = (np.random.default_rng(0)
            .standard_normal((batch, img, img, 3)).astype(np.float32) / 4)
    x_raw = jnp.asarray(x_np, cfg.compute_jnp_dtype)
    x_pack_host = program.pack_input(in_name, x_np.astype(np.float32))
    print(f"packed host shape: {np.asarray(x_pack_host).shape}",
          file=sys.stderr)
    x_pack = jnp.asarray(np.asarray(x_pack_host), cfg.compute_jnp_dtype)

    def fwd(xi):
        return program.fn(weights, {in_name: xi})[out_name]

    # A: raw input, default layouts
    t0 = time.perf_counter()
    dt_a = measure_device_time(fwd, x_raw, iters=12)
    print(f"A raw+default : {dt_a * 1e3:7.3f} ms  "
          f"(compile+measure {time.perf_counter() - t0:.0f}s)")

    # B: pre-packed input (engine detects packed shape), default layouts
    t0 = time.perf_counter()
    dt_b = measure_device_time(fwd, x_pack, iters=12)
    print(f"B packed+def  : {dt_b * 1e3:7.3f} ms  "
          f"(compile+measure {time.perf_counter() - t0:.0f}s)")

    # C: ask XLA for its preferred layout of the packed input
    jfwd = jax.jit(fwd, in_shardings=Format(Layout.AUTO))
    compiled = jfwd.lower(x_pack).compile()
    fmts = compiled.input_formats
    fmt = jax.tree_util.tree_leaves(fmts)[0]
    print(f"XLA-preferred input format: {fmt}", file=sys.stderr)

    from jax.experimental.layout import with_layout_constraint

    def fwd_pinned(xi):
        # with_layout_constraint takes the Layout, not the Format wrapper
        return fwd(with_layout_constraint(xi, fmt.layout))

    x_dev = jax.device_put(x_pack, fmt)
    t0 = time.perf_counter()
    dt_c = measure_device_time(fwd_pinned, x_dev, iters=12)
    print(f"C packed+AUTO : {dt_c * 1e3:7.3f} ms  "
          f"(compile+measure {time.perf_counter() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
