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
