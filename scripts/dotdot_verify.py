"""Verify the rwb+dotdot compiler-option win: numerics + repeatability.

1.71x from disabling dot-dot fusion is large enough to demand proof the
compiled program still computes the same function: this script compiles
the int8w headline forward under each option set, compares outputs
elementwise on the SAME device input, then repeats the paired timing.

Usage: python scripts/dotdot_verify.py [--iters 12] [--repeats 2]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402

OPTION_SETS = [
    ("default", None),
    ("dotdot", {"xla_tpu_dot_dot_fusion": False}),
    ("rwb", {"xla_tpu_rwb_fusion": False}),
    ("rwb+dotdot", {"xla_tpu_rwb_fusion": False,
                    "xla_tpu_dot_dot_fusion": False}),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--config", default="int8w",
                    choices=["fp32", "bf16", "int8w"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.profiling import measure_device_time
    from simpleinfer_tpu.zoo import build_yolov5

    cfg = {
        "fp32": EngineConfig(xla_compiler_options={}),
        "bf16": EngineConfig(compute_dtype="bfloat16",
                             xla_compiler_options={}),
        "int8w": EngineConfig(compute_dtype="bfloat16", quant="int8w",
                              xla_compiler_options={}),
    }[args.config]
    graph, in_name, out_name = build_yolov5("s", batch=8, image_size=640)
    eng = Engine(cfg).load_model(None, graph=graph)
    program, weights = eng.program, eng._device_weights
    x = jnp.asarray(np.asarray(program.pack_input(
        in_name, (np.random.default_rng(0).standard_normal(
            (8, 640, 640, 3)).astype(np.float32) / 4))),
        cfg.compute_jnp_dtype)

    def fwd(xi):
        return program.fn(weights, {in_name: xi})[out_name]

    # ---- numerics: same input through each compiled executable ----------
    outs = {}
    for label, opts in OPTION_SETS:
        compiled = jax.jit(fwd).lower(x).compile(opts)
        # fingerprint the OPTIMIZED HLO: if two option sets produce the
        # same hash, the backend ignored the difference (e.g. an
        # HLO-keyed compile-service cache) and any timing delta between
        # them is noise, not the flag
        import hashlib

        try:
            fp = hashlib.sha1(
                compiled.as_text().encode()).hexdigest()[:12]
        except Exception:  # noqa: BLE001 — text unavailable on backend
            fp = "?"
        outs[label] = np.asarray(compiled(x), np.float32)
        print(f"{label:12s} compiled; hlo_fp={fp} out[0,0,:4] = "
              f"{outs[label][0, 0, :4]}", flush=True)
    ref = outs["default"]
    scale = max(1.0, float(np.abs(ref).max()))
    ok = True
    for label, o in outs.items():
        if label == "default":
            continue
        err = float(np.abs(o - ref).max())
        rel = err / scale
        # bf16 programs: reassociation-level differences only
        verdict = "OK" if rel < 2e-2 else "MISMATCH"
        ok &= verdict == "OK"
        print(f"numerics {label:12s} max|d|={err:.4g} rel={rel:.2e} "
              f"{verdict}", flush=True)

    # ---- paired timing repeats ------------------------------------------
    for r in range(args.repeats):
        row = []
        for label, opts in OPTION_SETS:
            dt = measure_device_time(fwd, x, iters=args.iters,
                                     compiler_options=opts)
            row.append(f"{label} {dt * 1e3:.3f}ms")
        print(f"repeat {r}: " + "  ".join(row), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
