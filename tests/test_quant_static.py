"""Static activation int8 quantization (quant='int8') tests.

The reference is FP32-only, so there is no behavior to mirror; the
oracle strategy follows the repo's own discipline (SURVEY.md §4.4a):
the quantized path is compared against the fp32 path with a tolerance
derived from the quantization step, plus direct unit checks that the
s8×s8→s32 path is actually taken (not the weight-only fallback).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from simpleinfer_tpu import Engine, EngineConfig, EngineStateError
from simpleinfer_tpu.ir.graph import Attribute, Operator, Parameter
from simpleinfer_tpu.ops import lower_operator
from simpleinfer_tpu.quant import quantize_act, quantize_per_channel
from simpleinfer_tpu.zoo import build_resnet18

RNG = np.random.default_rng(11)


# ------------------------------------------------------------- primitives
def test_quantize_act_roundtrip_error_bounded():
    x = RNG.standard_normal((4, 33, 17)).astype(np.float32) * 3.0
    scale = np.float32(np.abs(x).max() / 127.0)
    q = np.asarray(quantize_act(jnp.asarray(x), jnp.float32(scale)))
    assert q.dtype == np.int8
    deq = q.astype(np.float32) * scale
    assert np.abs(deq - x).max() <= scale / 2 + 1e-7


def test_quantize_act_saturates_outliers():
    x = jnp.asarray([0.0, 1.0, 1000.0, -1000.0], jnp.float32)
    q = np.asarray(quantize_act(x, jnp.float32(1.0 / 127.0)))
    assert q[2] == 127 and q[3] == -127


# ------------------------------------------------------- conv int8 path
def _conv_impl(ic=8, oc=16, k=3, act=None):
    wt = RNG.standard_normal((oc, ic, k, k)).astype(np.float32)
    b = RNG.standard_normal(oc).astype(np.float32)
    params = dict(padding_mode="zeros", padding=[k // 2, k // 2],
                  kernel_size=[k, k], stride=[1, 1], dilation=[1, 1],
                  groups=1, in_channels=ic, out_channels=oc, bias=True)
    if act:
        params["si_fused_act"] = act
    op = Operator(type="nn.Conv2d", name="c0")
    for kk, v in params.items():
        op.params[kk] = Parameter.from_value(v)
    op.attrs["weight"] = Attribute.from_array(wt)
    op.attrs["bias"] = Attribute.from_array(b)
    return lower_operator(op, EngineConfig(
        quant="int8", int8_min_channels=1,
        int8_pointwise=True)), wt, b


@pytest.mark.parametrize("act", [None, "silu"])
def test_conv_int8_static_close_to_fp32(act):
    impl, wt, b = _conv_impl(act=act)
    x = RNG.standard_normal((2, 12, 12, 8)).astype(np.float32)
    weights = dict(impl.weights)
    weights["weight"] = quantize_per_channel(wt.transpose(2, 3, 1, 0), 3)
    fp_out = np.asarray(impl.apply(weights, jnp.asarray(x)))

    weights["act_scale"] = jnp.float32(np.abs(x).max() / 127.0)
    q_out = np.asarray(impl.apply(weights, jnp.asarray(x)))
    scale = np.abs(fp_out).max()
    # activation quant adds ~1/254 relative noise per element, amplified
    # by the K-dim accumulation; 5% of dynamic range is a loose but
    # regression-catching bound
    assert np.abs(q_out - fp_out).max() < 0.05 * scale


def test_conv_int8_static_is_exact_on_grid_inputs():
    """Feed activations that are exact multiples of the scale: the int8
    path must then agree with fp32 to accumulation rounding only —
    proving the quantized path actually runs (a dequant fallback would
    also pass the loose test above; this one pins the arithmetic)."""
    impl, wt, b = _conv_impl(ic=4, oc=4, k=1)
    # integers in [-127, 127] times an arbitrary scale
    scale = np.float32(0.037)
    xi = RNG.integers(-127, 128, (1, 6, 6, 4)).astype(np.float32)
    x = xi * scale
    weights = dict(impl.weights)
    # weight values also exact int8 multiples -> conv is exact integer math
    wq = RNG.integers(-127, 128, (1, 1, 4, 4)).astype(np.float32)
    wscale = np.float32(0.01)
    from simpleinfer_tpu.quant import QuantizedTensor

    weights["weight"] = QuantizedTensor(
        data=jnp.asarray(wq.astype(np.int8)),
        scale=jnp.full((4,), wscale), axis=3)
    weights["bias"] = jnp.asarray(b[:4] * 0.0)
    weights["act_scale"] = jnp.asarray(scale)
    got = np.asarray(impl.apply(weights, jnp.asarray(x)))
    want = np.einsum("nhwi,io->nhwo", xi, wq[0, 0]) * (scale * wscale)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------ engine e2e
def _calib_batches(in_name, n=2, batch=1, size=32):
    return [{in_name: RNG.standard_normal((batch, size, size, 3))
             .astype(np.float32)} for _ in range(n)]


def test_engine_int8_static_end_to_end():
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=8, width=16)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    fp = Engine().load_model(None, graph=graph).run({in_name: x})[out_name]

    graph2, _, _ = build_resnet18(batch=1, image_size=32, num_classes=8,
                                  width=16)
    eng = Engine(EngineConfig(quant="int8", int8_min_channels=1,
                              int8_pointwise=True)).load_model(
        None, graph=graph2)
    # before calibration: runs the weight-only fallback
    pre = eng.run({in_name: x})[out_name]
    scale = max(1.0, float(np.abs(fp).max()))
    assert np.abs(pre - fp).max() < 0.05 * scale

    scales = eng.calibrate(_calib_batches(in_name) + [{in_name: x}])
    assert scales and all(s > 0 for s in scales.values())
    # act_scale installed for convs and the linear head
    conv_ops = [i.name for i in eng.program.impls if i.act_quant]
    assert set(scales) == set(conv_ops)
    q = eng.run({in_name: x})[out_name]
    # full int8: looser than weight-only but ranking preserved
    assert np.abs(q - fp).max() < 0.15 * scale
    assert np.argmax(q) == np.argmax(fp)


def test_calibration_save_load_roundtrip(tmp_path):
    """Offline calibration artifact: scales saved by one engine and
    loaded by a fresh engine reproduce the calibrated outputs exactly."""
    def fresh():
        g, _, _ = build_resnet18(batch=1, image_size=32, num_classes=8,
                                 width=16)
        return Engine(EngineConfig(quant="int8", int8_min_channels=1,
                                   int8_pointwise=True)).load_model(
            None, graph=g)

    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=8, width=16)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)

    eng = fresh()
    scales = eng.calibrate(_calib_batches(in_name) + [{in_name: x}])
    path = str(tmp_path / "calib.npz")
    eng.save_calibration(path)
    want = eng.run({in_name: x})[out_name]

    eng2 = fresh()
    loaded = eng2.load_calibration(path)
    assert loaded.keys() == scales.keys()
    assert all(abs(loaded[k] - scales[k]) < 1e-7 for k in scales)
    got = eng2.run({in_name: x})[out_name]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_calibration_artifact_guards(tmp_path):
    graph, in_name, _ = build_resnet18(batch=1, image_size=32,
                                       num_classes=8, width=16)
    eng = Engine(EngineConfig(quant="int8")).load_model(None, graph=graph)
    with pytest.raises(EngineStateError, match="no activation scales"):
        eng.save_calibration(str(tmp_path / "x.npz"))
    # fp32 engine refuses to load calibration
    g2, _, _ = build_resnet18(batch=1, image_size=32, num_classes=8,
                              width=16)
    fp_eng = Engine().load_model(None, graph=g2)
    np.savez(str(tmp_path / "c.npz"), **{"conv1": np.float32(0.1)})
    with pytest.raises(EngineStateError, match="quant='int8'"):
        fp_eng.load_calibration(str(tmp_path / "c.npz"))
    # unknown op names rejected
    np.savez(str(tmp_path / "bad.npz"), **{"nope": np.float32(0.1)})
    with pytest.raises(EngineStateError, match="not in this model"):
        eng.load_calibration(str(tmp_path / "bad.npz"))


def test_calibrate_cli_roundtrip(tmp_path):
    """calibrate CLI -> artifact -> Engine.load_calibration."""
    from simpleinfer_tpu.tools import main

    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=8, width=16)
    param = str(tmp_path / "m.pnnx.param")
    binf = str(tmp_path / "m.pnnx.bin")
    graph.save(param, binf)
    for i in range(2):
        np.savez(str(tmp_path / f"s{i}.npz"),
                 **{in_name: RNG.standard_normal((1, 32, 32, 3))
                    .astype(np.float32)})
    out = str(tmp_path / "calib.npz")
    rc = main(["calibrate", param, binf,
               str(tmp_path / "s0.npz"), str(tmp_path / "s1.npz"),
               "-o", out, "--dtype", "float32"])
    assert rc == 0
    eng = Engine(EngineConfig(quant="int8")).load_model(param, binf)
    scales = eng.load_calibration(out)
    assert scales and all(s > 0 for s in scales.values())
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    assert eng.run({in_name: x})[out_name].shape == (1, 8)


def test_calibrate_requires_int8_mode():
    graph, in_name, _ = build_resnet18(batch=1, image_size=32,
                                       num_classes=4, width=8)
    eng = Engine(EngineConfig(quant="int8w")).load_model(None, graph=graph)
    with pytest.raises(EngineStateError):
        eng.calibrate(_calib_batches(in_name, n=1))


def test_calibrate_rejects_empty_and_partial_batches():
    graph, in_name, _ = build_resnet18(batch=1, image_size=32,
                                       num_classes=4, width=8)
    eng = Engine(EngineConfig(quant="int8")).load_model(None, graph=graph)
    with pytest.raises(EngineStateError):
        eng.calibrate([])
    with pytest.raises(EngineStateError):
        eng.calibrate([{}])


def test_percentile_observer_clips_outliers():
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=4, width=8)
    graph2, _, _ = build_resnet18(batch=1, image_size=32, num_classes=4,
                                  width=8)
    batch = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    spiked = batch.copy()
    spiked[0, 0, 0, 0] = 1e4  # single outlier
    absmax = Engine(EngineConfig(quant="int8")).load_model(
        None, graph=graph).calibrate([{in_name: spiked}])
    pct = Engine(EngineConfig(
        quant="int8", act_clip_percentile=99.9)).load_model(
        None, graph=graph2).calibrate([{in_name: spiked}])
    # the outlier-dominated op must get a smaller (finer) scale under
    # the percentile observer than under absmax
    shared = set(absmax) & set(pct)
    assert shared
    assert any(pct[n] < absmax[n] * 0.5 for n in shared)


# ------------------------------------------------------------- linear path
def test_linear_int8_static_close_to_fp32():
    in_f, out_f = 32, 16
    wt = RNG.standard_normal((out_f, in_f)).astype(np.float32)
    b = RNG.standard_normal(out_f).astype(np.float32)
    op = Operator(type="nn.Linear", name="l0")
    for kk, v in dict(in_features=in_f, out_features=out_f,
                      bias=True).items():
        op.params[kk] = Parameter.from_value(v)
    op.attrs["weight"] = Attribute.from_array(wt)
    op.attrs["bias"] = Attribute.from_array(b)
    impl = lower_operator(op, EngineConfig(quant="int8"))
    x = RNG.standard_normal((4, in_f)).astype(np.float32)
    weights = dict(impl.weights)
    weights["weight"] = quantize_per_channel(wt.T, 1)
    fp_out = np.asarray(impl.apply(weights, jnp.asarray(x)))
    weights["act_scale"] = jnp.float32(np.abs(x).max() / 127.0)
    q_out = np.asarray(impl.apply(weights, jnp.asarray(x)))
    assert np.abs(q_out - fp_out).max() < 0.05 * np.abs(fp_out).max()


def test_linear_int8_static_pallas_matches_xla(monkeypatch):
    """use_pallas static-int8 linears route MXU-sized operands through
    the native s8xs8 Pallas GEMM (measured faster than XLA-s8 on chip,
    docs/PERF.md); interpreted here, the result must match the XLA s32
    einsum path to f32 rounding."""
    import sys

    from jax.experimental.pallas import tpu as pltpu

    import simpleinfer_tpu.kernels.matmul  # noqa: F401 (registers module)
    KM = sys.modules["simpleinfer_tpu.kernels.matmul"]

    in_f = out_f = m = 256  # the dispatch gate needs min(M,K,N) >= 256
    wt = RNG.standard_normal((out_f, in_f)).astype(np.float32)
    b = RNG.standard_normal(out_f).astype(np.float32)
    op = Operator(type="nn.Linear", name="l0")
    for kk, v in dict(in_features=in_f, out_features=out_f,
                      bias=True).items():
        op.params[kk] = Parameter.from_value(v)
    op.attrs["weight"] = Attribute.from_array(wt)
    op.attrs["bias"] = Attribute.from_array(b)
    x = RNG.standard_normal((m, in_f)).astype(np.float32)

    base = lower_operator(op, EngineConfig(quant="int8"))
    weights = dict(base.weights)
    weights["weight"] = quantize_per_channel(wt.T, 1)
    weights["act_scale"] = jnp.float32(np.abs(x).max() / 127.0)
    want = np.asarray(base.apply(weights, jnp.asarray(x)))

    impl = lower_operator(op, EngineConfig(quant="int8", use_pallas=True))
    monkeypatch.setattr(KM, "pallas_supported", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(impl.apply(weights, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # below the gate the XLA path must be taken even with use_pallas
    small = RNG.standard_normal((4, in_f)).astype(np.float32)
    weights["act_scale"] = jnp.float32(np.abs(small).max() / 127.0)
    a = np.asarray(base.apply(weights, jnp.asarray(small)))
    b2 = np.asarray(impl.apply(weights, jnp.asarray(small)))
    np.testing.assert_array_equal(a, b2)


def test_yolov5_int8_static_covers_cat_split_path():
    """yolov5 C3/SPPF blocks hit the cat->conv1x1 weight-split path;
    in int8 mode its partial convs must sum exactly in s32 and match
    the fp32 engine within quant noise."""
    from simpleinfer_tpu.zoo import build_yolov5

    graph, in_name, out_name = build_yolov5("n", batch=1, image_size=64)
    x = (RNG.standard_normal((1, 64, 64, 3)) * 0.5).astype(np.float32)
    fp = Engine().load_model(None, graph=graph).run({in_name: x})[out_name]

    graph2, _, _ = build_yolov5("n", batch=1, image_size=64)
    eng = Engine(EngineConfig(quant="int8", int8_min_channels=1,
                              int8_pointwise=True)).load_model(
        None, graph=graph2)
    scales = eng.calibrate([{in_name: x}])
    # the cat-input convs must be calibrated too
    cat_convs = [i.name for i in eng.program.impls
                 if i.type == "nn.Conv2d" and len(
                     [1 for p in (eng.program.plan or [])
                      if p[0] is i and len(p[1]) > 1])]
    assert cat_convs, "expected cat->conv1x1 fusions in yolov5"
    assert set(cat_convs) <= set(scales)
    q = eng.run({in_name: x})[out_name]
    scale = float(np.abs(fp).max())
    assert np.abs(q - fp).max() < 0.05 * scale


def test_int8_gate_skips_unprofitable_shapes():
    """Default gate (v5e-measured): narrow or 1x1 convs ignore
    act_scale and keep the weight-dequant path — identical outputs
    with and without the scale installed."""
    wt = RNG.standard_normal((16, 8, 1, 1)).astype(np.float32)
    op = Operator(type="nn.Conv2d", name="c0")
    for kk, v in dict(padding_mode="zeros", padding=[0, 0],
                      kernel_size=[1, 1], stride=[1, 1], dilation=[1, 1],
                      groups=1, in_channels=8, out_channels=16,
                      bias=False).items():
        op.params[kk] = Parameter.from_value(v)
    op.attrs["weight"] = Attribute.from_array(wt)
    impl = lower_operator(op, EngineConfig(quant="int8"))  # default gate
    x = RNG.standard_normal((1, 6, 6, 8)).astype(np.float32)
    weights = dict(impl.weights)
    weights["weight"] = quantize_per_channel(wt.transpose(2, 3, 1, 0), 3)
    base = np.asarray(impl.apply(weights, jnp.asarray(x)))
    weights["act_scale"] = jnp.float32(np.abs(x).max() / 127.0)
    gated = np.asarray(impl.apply(weights, jnp.asarray(x)))
    np.testing.assert_array_equal(base, gated)


# ------------------------------------------------------------ int8 chains
def _chain_graph(c=8):
    """input -> conv3x3(c) -> conv3x3(c) -> conv3x3(c) -> out: the two
    interior edges are int8-chain candidates."""
    from simpleinfer_tpu.zoo.builders import GraphBuilder

    b = GraphBuilder(seed=5)
    x = b.input([1, c, 12, 12], name="0")
    x = b.conv(x, c, 3, 1, 1)
    x = b.conv(x, c, 3, 1, 1)
    x = b.conv(x, c, 3, 1, 1)
    b.output(x)
    return b.build(), x


def test_mark_int8_chains_pass():
    from simpleinfer_tpu.ir.passes import (
        FUSED_Q_OUT, mark_int8_chains, run_inference_fusions,
    )

    g, _ = _chain_graph(c=8)
    n = mark_int8_chains(g, min_channels=8)
    convs = [op for op in g.ops if op.type == "nn.Conv2d"]
    # conv1 -> conv2 and conv2 -> conv3 marked; conv3 feeds the output
    assert n == 2
    assert FUSED_Q_OUT in convs[0].params
    assert convs[0].params[FUSED_Q_OUT].s == convs[1].name
    assert FUSED_Q_OUT in convs[1].params
    assert FUSED_Q_OUT not in convs[2].params

    # narrow channels: nothing marked under the default gate
    g2, _ = _chain_graph(c=8)
    assert mark_int8_chains(g2, min_channels=128) == 0


def test_int8_chain_end_to_end_close_to_fp32():
    g, out_name = _chain_graph(c=8)
    x = RNG.standard_normal((1, 12, 12, 8)).astype(np.float32)
    fp = Engine().load_model(None, graph=g).run({"0": x})[out_name]

    g2, _ = _chain_graph(c=8)
    cfg = EngineConfig(quant="int8", int8_min_channels=8)
    eng = Engine(cfg).load_model(None, graph=g2)
    # chain marked at load (run_inference_fusions receives cfg)
    producers = [i for i in eng.program.impls if i.q_out_consumer]
    assert len(producers) == 2
    eng.calibrate([{"0": x}])
    # out_scale installed for both producers
    for i in producers:
        assert "out_scale" in eng.program.weights[i.name]
    q = eng.run({"0": x})[out_name]
    scale = float(np.abs(fp).max())
    assert np.abs(q - fp).max() < 0.1 * scale


def test_int8_chain_intermediate_is_int8():
    """Run the plan step-by-step: the interior operand must be a
    QuantizedActivation carrier (1-byte data)."""
    import jax.numpy as jnp

    from simpleinfer_tpu.quant.tensor import QuantizedActivation

    g, out_name = _chain_graph(c=8)
    cfg = EngineConfig(quant="int8", int8_min_channels=8)
    eng = Engine(cfg).load_model(None, graph=g)
    x = RNG.standard_normal((1, 12, 12, 8)).astype(np.float32)
    eng.calibrate([{"0": x}])
    env = {"0": jnp.asarray(x)}
    kinds = {}
    for impl, in_names, out_names in eng.program.plan:
        out = impl.apply(eng._device_weights[impl.name],
                         *[env[n] for n in in_names])
        env[out_names[0]] = out
        kinds[impl.name] = type(out).__name__
    producers = [i.name for i in eng.program.impls if i.q_out_consumer]
    for name in producers:
        assert kinds[name] == "QuantizedActivation"
    # the final conv emits a plain array
    last = eng.program.impls[-1].name
    assert kinds[last] != "QuantizedActivation"
    assert env[out_name].dtype != np.int8


def test_int8_static_under_data_parallel_mesh():
    """Static int8 + DP mesh: GSPMD partitions the s8 convs over the
    batch axis; scales replicate. (SURVEY.md §4.4c multi-device CI.)"""
    import jax

    from simpleinfer_tpu import MeshConfig

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    graph, in_name, out_name = build_resnet18(batch=8, image_size=32,
                                              num_classes=4, width=8)
    ref_graph, _, _ = build_resnet18(batch=8, image_size=32,
                                     num_classes=4, width=8)
    x = RNG.standard_normal((8, 32, 32, 3)).astype(np.float32)
    want = Engine().load_model(None, graph=ref_graph).run(
        {in_name: x})[out_name]
    cfg = EngineConfig(quant="int8", int8_min_channels=1,
                       int8_pointwise=True,
                       mesh=MeshConfig(data=8, model=1))
    eng = Engine(cfg).load_model(None, graph=graph)
    eng.calibrate([{in_name: x}])
    got = eng.run({in_name: x})[out_name]
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(got - want).max() < 0.1 * scale
    assert np.argmax(got, -1).tolist() == np.argmax(want, -1).tolist()


def test_int8_static_under_tensor_parallel_mesh():
    """Static int8 + TP: int8 payloads shard on output channels, scales
    follow, GSPMD partitions the s8 convs."""
    import jax

    from simpleinfer_tpu import MeshConfig

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    graph, in_name, out_name = build_resnet18(batch=2, image_size=32,
                                              num_classes=8, width=16)
    ref_graph, _, _ = build_resnet18(batch=2, image_size=32,
                                     num_classes=8, width=16)
    x = RNG.standard_normal((2, 32, 32, 3)).astype(np.float32)
    want = Engine().load_model(None, graph=ref_graph).run(
        {in_name: x})[out_name]
    cfg = EngineConfig(quant="int8", int8_min_channels=1,
                       int8_pointwise=True,
                       mesh=MeshConfig(data=2, model=4))
    eng = Engine(cfg).load_model(None, graph=graph)
    eng.calibrate([{in_name: x}])
    got = eng.run({in_name: x})[out_name]
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(got - want).max() < 0.1 * scale


def test_calibration_path_without_extension_roundtrips(tmp_path):
    """save(path) -> load(path) must accept the SAME string (np.savez
    would otherwise silently append .npz on save only)."""
    graph, in_name, _ = build_resnet18(batch=1, image_size=32,
                                       num_classes=8, width=16)
    eng = Engine(EngineConfig(quant="int8", int8_min_channels=1,
                              int8_pointwise=True)).load_model(
        None, graph=graph)
    eng.calibrate(_calib_batches(in_name, n=1))
    p = str(tmp_path / "scales_no_ext")
    eng.save_calibration(p)
    assert eng.load_calibration(p)


def test_int8_chain_survives_relu6_between_convs():
    """MobileNetV2's relu6 fuses into the conv epilogue, so the
    conv->relu6->conv edge stays an int8 chain (regression: relu6 was
    absent from FUSABLE_ACTIVATIONS and broke every v2 block)."""
    from simpleinfer_tpu.ir.passes import (
        FUSED_Q_OUT, run_inference_fusions,
    )
    from simpleinfer_tpu.zoo.builders import GraphBuilder

    b = GraphBuilder(seed=5)
    x = b.input([1, 8, 12, 12], name="0")
    x = b.conv(x, 8, 3, 1, 1)
    x = b._act("nn.ReLU6", x)
    x = b.conv(x, 8, 3, 1, 1)
    x = b._act("nn.LeakyReLU", x)
    x = b.conv(x, 8, 3, 1, 1)
    b.output(x)
    g = b.build()
    from simpleinfer_tpu import EngineConfig

    cfg = EngineConfig(compute_dtype="bfloat16", quant="int8",
                       int8_min_channels=8)
    run_inference_fusions(g, cfg)
    convs = [op for op in g.ops if op.type == "nn.Conv2d"]
    assert FUSED_Q_OUT in convs[0].params  # chained THROUGH relu6
    assert FUSED_Q_OUT in convs[1].params  # and through leaky_relu


# ---------------------------------------------- per-channel act scales
def _chan_skew(c):
    return (10.0 ** ((np.arange(c) % 5) - 2)).astype(np.float32)


def _skewed_conv_graph(seed=7):
    """Two plain convs where the first conv's weight is INVERSELY skewed
    to the input's channel skew: every input channel contributes
    comparably to the output, but a single per-tensor activation scale
    quantizes the small-magnitude (large-weight) channels to zero — the
    outlier-channel failure mode per-channel calibration exists for
    (SmoothQuant, Xiao et al. 2022)."""
    from simpleinfer_tpu.zoo.builders import GraphBuilder

    b = GraphBuilder(seed=seed)
    x = b.input([1, 8, 16, 16], name="in0")
    h = b.conv(x, 16, 3, 1, 1)
    h = b.relu(h)
    h = b.conv(h, 16, 3, 1, 1)
    b.output(h)
    g = b.build()
    conv1 = next(op for op in g.ops if op.type == "nn.Conv2d")
    w = conv1.attrs["weight"].array()  # OIHW
    w = w / _chan_skew(w.shape[1]).reshape(1, -1, 1, 1)
    conv1.attrs["weight"] = type(conv1.attrs["weight"]).from_array(
        w.astype(np.float32))
    return g


def _skewed_input(shape=(1, 16, 16, 8), seed=3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape).astype(np.float32)
    return x * _chan_skew(shape[-1])


def _int8_engine(graph, per_channel):
    return Engine(EngineConfig(
        quant="int8", int8_min_channels=1, int8_pointwise=True,
        act_per_channel=per_channel)).load_model(None, graph=graph)


def test_per_channel_act_scales_fold_and_beat_per_tensor():
    """Per-channel activation calibration (act_per_channel=True) folds
    the channel scales into the quantized weight (install-time; the
    epilogue stays a per-out-channel dequant) and strictly reduces
    quantization error on channel-skewed activations."""
    x = _skewed_input()
    fp = Engine().load_model(
        None, graph=_skewed_conv_graph()).run({"in0": x})
    out_name = list(fp)[0]
    fp = fp[out_name]

    pt = _int8_engine(_skewed_conv_graph(), per_channel=False)
    pc = _int8_engine(_skewed_conv_graph(), per_channel=True)
    batches = [{"in0": _skewed_input(seed=s)} for s in (3, 4)]
    s_pt = pt.calibrate(batches)
    s_pc = pc.calibrate(batches)

    # eligible convs calibrated per-channel (vector scales)
    vec = {k: v for k, v in s_pc.items() if np.ndim(v) == 1}
    assert vec, f"no vector scales installed: {s_pc}"
    assert all(np.ndim(v) == 0 for v in s_pt.values())

    err_pt = np.abs(np.asarray(pt.run({"in0": x})[out_name]) - fp).max()
    err_pc = np.abs(np.asarray(pc.run({"in0": x})[out_name]) - fp).max()
    scale = float(np.abs(fp).max())
    assert err_pc < err_pt, (err_pc, err_pt)
    assert err_pc < 0.05 * scale


def test_per_channel_artifact_roundtrip_and_no_double_fold(tmp_path):
    """Vector scales survive save/load; re-installing over a folded
    engine restores the pristine weight first (no double-fold)."""
    batches = [{"in0": _skewed_input(seed=s)} for s in (3, 4)]
    x = _skewed_input()

    eng = _int8_engine(_skewed_conv_graph(), per_channel=True)
    eng.calibrate(batches)
    out_name = eng.output_names[0]
    want = np.asarray(eng.run({"in0": x})[out_name])
    path = str(tmp_path / "pc.npz")
    eng.save_calibration(path)

    # reinstall on the SAME engine: pristine weights restored, then
    # refolded -> outputs identical (double-fold would skew them)
    eng.load_calibration(path)
    np.testing.assert_array_equal(
        np.asarray(eng.run({"in0": x})[out_name]), want)

    # fresh engine, loaded artifact -> identical outputs
    eng2 = _int8_engine(_skewed_conv_graph(), per_channel=True)
    loaded = eng2.load_calibration(path)
    assert any(np.ndim(v) == 1 for v in loaded.values())
    np.testing.assert_array_equal(
        np.asarray(eng2.run({"in0": x})[out_name]), want)


def test_per_channel_disables_chain_requant():
    """mark_int8_chains producers must NOT requantize to a vector scale
    (sibling consumers may be per-tensor); per-channel consumers drop
    the out_scale entry and quantize their own input — correctness over
    the measured-neutral chain win (docs/PERF.md)."""
    from simpleinfer_tpu.zoo.builders import GraphBuilder

    b = GraphBuilder(seed=5)
    x = b.input([1, 128, 12, 12], name="0")
    x = b.conv(x, 128, 3, 1, 1)
    x = b.conv(x, 128, 3, 1, 1)
    x = b.conv(x, 128, 3, 1, 1)
    b.output(x)
    eng = Engine(EngineConfig(compute_dtype="bfloat16", quant="int8",
                              act_per_channel=True)).load_model(
        None, graph=b.build())
    rng = np.random.default_rng(0)
    feed = {"0": rng.standard_normal((1, 12, 12, 128))
            .astype(np.float32)}
    scales = eng.calibrate([feed])
    assert any(np.ndim(v) == 1 for v in scales.values())
    assert all("out_scale" not in w
               for w in eng.program.weights.values()
               if isinstance(w, dict))
    out = eng.run(feed)[eng.output_names[0]]
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_per_channel_linear_rank2():
    """nn.Linear per-channel activation scales on a rank-2 input (the
    transformer MLP shape class): folds along weight axis 0."""
    from simpleinfer_tpu.zoo.builders import GraphBuilder

    def build():
        b = GraphBuilder(seed=9)
        x = b.input([4, 64], name="in0")
        h = b.linear(x, 32)
        b.output(h)
        g = b.build()
        lin = next(op for op in g.ops if op.type == "nn.Linear")
        w = lin.attrs["weight"].array()  # [out, in]
        w = w / _chan_skew(w.shape[1]).reshape(1, -1)  # inverse skew
        lin.attrs["weight"] = type(lin.attrs["weight"]).from_array(
            w.astype(np.float32))
        return g

    rng = np.random.default_rng(1)
    skew = _chan_skew(64)
    x = rng.standard_normal((4, 64)).astype(np.float32) * skew

    fp_eng = Engine().load_model(None, graph=build())
    out_name = fp_eng.output_names[0]
    fp = np.asarray(fp_eng.run({"in0": x})[out_name])

    pt = _int8_engine(build(), per_channel=False)
    pc = _int8_engine(build(), per_channel=True)
    s_pt = pt.calibrate([{"in0": x}])
    s_pc = pc.calibrate([{"in0": x}])
    assert all(np.ndim(v) == 0 for v in s_pt.values())
    assert any(np.ndim(v) == 1 and v.size == 64 for v in s_pc.values())

    err_pt = np.abs(np.asarray(pt.run({"in0": x})[out_name]) - fp).max()
    err_pc = np.abs(np.asarray(pc.run({"in0": x})[out_name]) - fp).max()
    assert err_pc < err_pt, (err_pc, err_pt)
    assert err_pc < 0.05 * float(np.abs(fp).max())


def test_per_channel_artifact_loads_into_default_engine(tmp_path):
    """A per-channel calibration artifact must install into an int8
    engine built WITHOUT act_per_channel (production serve flow: the
    artifact, not the engine flag, carries the decision)."""
    batches = [{"in0": _skewed_input(seed=s)} for s in (3, 4)]
    x = _skewed_input()

    pc = _int8_engine(_skewed_conv_graph(), per_channel=True)
    pc.calibrate(batches)
    out_name = pc.output_names[0]
    want = np.asarray(pc.run({"in0": x})[out_name])
    path = str(tmp_path / "pc.npz")
    pc.save_calibration(path)

    plain = _int8_engine(_skewed_conv_graph(), per_channel=False)
    loaded = plain.load_calibration(path)
    assert any(np.ndim(v) == 1 for v in loaded.values())
    np.testing.assert_array_equal(
        np.asarray(plain.run({"in0": x})[out_name]), want)


def test_per_channel_restore_drops_stale_scales(tmp_path):
    """Loading an artifact that omits a previously-folded op must also
    remove its act_scale: a stale per-channel vector over the RESTORED
    (unfolded) weight would quantize by s but dequantize by w_scale
    alone — silently mis-scaled output (review finding, 2026-08-19)."""
    batches = [{"in0": _skewed_input(seed=s)} for s in (3, 4)]
    x = _skewed_input()

    eng = _int8_engine(_skewed_conv_graph(), per_channel=True)
    scales = eng.calibrate(batches)
    folded = [k for k, v in scales.items() if np.ndim(v) == 1]
    assert folded
    out_name = eng.output_names[0]

    # artifact missing one folded op
    keep = {k: v for k, v in scales.items() if k != folded[0]}
    path = str(tmp_path / "partial.npz")
    with open(path, "wb") as f:
        np.savez(f, **keep)
    eng.load_calibration(path)
    assert "act_scale" not in eng.program.weights[folded[0]]
    # the op now runs the weight-only fallback on its PRISTINE weight:
    # output must match a fresh engine calibrated with the same subset
    eng2 = _int8_engine(_skewed_conv_graph(), per_channel=True)
    eng2.load_calibration(path)
    np.testing.assert_array_equal(
        np.asarray(eng.run({"in0": x})[out_name]),
        np.asarray(eng2.run({"in0": x})[out_name]))
