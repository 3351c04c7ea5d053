"""Roofline accounting and instrumented-run tests."""
import numpy as np

import jax.numpy as jnp

from simpleinfer_tpu import Engine, EngineConfig
from simpleinfer_tpu.profiling import (
    V5E,
    OpCost,
    roofline_report,
    summarize_roofline,
    timed_run,
)
from simpleinfer_tpu.zoo import build_resnet18, build_yolov5

RNG = np.random.default_rng(41)


def test_opcost_bounds():
    # big dense matmul: compute bound
    big = OpCost("m", "nn.Linear", flops=2 * 4096 ** 3,
                 weight_bytes=4096 * 4096 * 2, out_bytes=4096 * 4096 * 2,
                 out_shape=[4096, 4096])
    assert big.bound(V5E) == "compute"
    # elementwise op: bandwidth bound
    ew = OpCost("r", "nn.ReLU", flops=10 ** 6, weight_bytes=0,
                out_bytes=4 * 10 ** 6, out_shape=[1, 10 ** 6])
    assert ew.bound(V5E) == "bandwidth"
    assert ew.min_time_us(V5E) > 0


def test_roofline_report_totals_match_program():
    graph, _, _ = build_yolov5("n", batch=1, image_size=64)
    eng = Engine().load_model(None, graph=graph)
    costs = roofline_report(eng.program, batch=1)
    assert sum(c.flops for c in costs) == eng.program.flops_per_item
    assert all(c.out_bytes >= 0 for c in costs)
    # conv ops carry weights; activations don't
    convs = [c for c in costs if c.type == "nn.Conv2d"]
    assert convs and all(c.weight_bytes > 0 for c in convs)
    text = summarize_roofline(eng.program, batch=8)
    assert "speed-of-light" in text and "nn.Conv2d" in text


def test_timed_run_matches_jitted():
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=5, width=8)
    eng = Engine().load_model(None, graph=graph)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    want = eng.run({in_name: x})[out_name]
    rows = timed_run(eng.program, eng._device_weights,
                     {in_name: jnp.asarray(x)})
    assert len(rows) == len(eng.program.impls)
    assert all(t >= 0 for _, _, t in rows)


def test_measure_device_time_compiler_options():
    """compiler_options reach the backend compile (an invalid option
    must fail; a valid one must measure normally) — the per-executable
    tuning surface scripts/xla_flags_experiment.py sweeps."""
    import pytest

    from simpleinfer_tpu.profiling import measure_device_time

    f = lambda x: jnp.tanh(x @ x.T)  # noqa: E731
    x = jnp.asarray(RNG.standard_normal((16, 16)), jnp.float32)
    dt = measure_device_time(
        f, x, iters=3,
        compiler_options={"xla_cpu_enable_fast_math": False})
    assert dt > 0
    with pytest.raises(Exception):
        measure_device_time(
            f, x, iters=3,
            compiler_options={"xla_not_a_real_option_xyz": 1})


def test_format_hlo_stats_renders_synthetic_rows():
    from simpleinfer_tpu.profiling import _HLO_STAT_KEYS, format_hlo_stats

    def row(name, cat, us, n=1, **kw):
        r = {k: None for k in _HLO_STAT_KEYS}
        r.update(hlo_op_name=name, category=cat, total_self_time=us,
                 occurrences=n, total_self_time_percent=50.0,
                 model_flop_rate=1000.0, measured_memory_bw=500.0,
                 bound_by="Compute", **kw)
        return r

    rows = [row("fusion.1", "convolution fusion", 200.0, 10),
            row("copy.3", "data formatting", 100.0, 10)]
    text = format_hlo_stats(rows, top=5, iters=10)
    assert "convolution fusion" in text and "copy.3" in text
    # 300 us over 10 iters = 0.030 ms/iter
    assert "0.030 ms/iter" in text
    # empty capture should not crash
    assert "0.000 ms/iter" in format_hlo_stats([], iters=1)


def test_device_profile_cpu_trace_roundtrip(tmp_path):
    """trace -> xplane -> hlo_stats parse on the CPU backend. The CPU
    plane has no per-HLO device stats (rows may be empty) — the test
    asserts the capture/parse pipeline itself works."""
    import pytest

    from simpleinfer_tpu.profiling import device_profile

    def f(x):
        return (x @ x).sum()

    x = jnp.ones((64, 64), jnp.float32)
    try:
        rows = device_profile(f, x, iters=2, logdir=str(tmp_path / "tr"))
    except (RuntimeError, FileNotFoundError) as e:
        pytest.skip(f"profiler unavailable on this backend: {e}")
    assert isinstance(rows, list)
    for r in rows:
        assert set(r) == set(
            __import__("simpleinfer_tpu.profiling",
                       fromlist=["_HLO_STAT_KEYS"])._HLO_STAT_KEYS)


def test_attribute_slices_segments_cover_program():
    """Prefix-slicing attribution (round-4): segments partition the
    plan in order, every op lands in exactly one segment, flops match
    the roofline estimator's totals, and each prefix survives XLA DCE
    (a dead-code-eliminated op would show as a zero-flop segment
    mismatch)."""
    import jax.numpy as jnp

    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.profiling import attribute_slices
    from simpleinfer_tpu.zoo import build_resnet18

    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=4, width=8)
    eng = Engine().load_model(None, graph=graph)
    x = np.random.default_rng(0).standard_normal(
        (1, 32, 32, 3)).astype(np.float32)
    xs = eng.program.pack_input(in_name, jnp.asarray(x))
    rows = attribute_slices(eng.program, eng._device_weights,
                            {in_name: xs}, n_slices=4, iters=3,
                            verbose=False)
    assert len(rows) >= 2
    all_ops = [impl.name for impl, _, _ in eng.program.plan]
    seen = [op for _, ops, _, _ in rows for op in ops]
    assert seen == all_ops                    # ordered exact partition
    assert all(t >= 0 for _, _, t, _ in rows)
    from simpleinfer_tpu.executor import _estimate_flops

    want_flops = sum(_estimate_flops(
        impl, eng.program.op_output_shapes.get(impl.name, []))
        for impl, _, _ in eng.program.plan)
    assert sum(f for _, _, _, f in rows) == want_flops

    # explicit cuts (round-5 per-op attribution): one segment per op
    # over the first 3 plan entries, then the remainder; still an
    # ordered exact partition
    rows = attribute_slices(eng.program, eng._device_weights,
                            {in_name: xs}, cuts=[1, 2, 3], iters=3,
                            verbose=False)
    assert [len(ops) for _, ops, _, _ in rows[:3]] == [1, 1, 1]
    seen = [op for _, ops, _, _ in rows for op in ops]
    assert seen == all_ops
    assert sum(f for _, _, _, f in rows) == want_flops
