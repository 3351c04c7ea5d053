"""Tests for functional-form pnnx ops (ops/functional.py) vs torch.

Same oracle discipline as test_ops_extra.py: torch (CPU, NCHW) is the
independent reference; NHWC<->NCHW transposes at the boundary pin the
logical-dim remapping.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from simpleinfer_tpu.config import EngineConfig
from simpleinfer_tpu.ops import lower_operator

from test_ops_extra import make_op, nhwc, run

CFG = EngineConfig()
RNG = np.random.default_rng(72)

_INT_MAX = 2**63 - 1


# ---------------------------------------------------------------- pooling
@pytest.mark.parametrize("ceil_mode", [False, True])
def test_f_max_pool2d(ceil_mode):
    x = RNG.standard_normal((2, 3, 9, 9)).astype(np.float32)
    impl = lower_operator(make_op("F.max_pool2d", params=dict(
        kernel_size=[3, 3], stride=[2, 2], padding=[1, 1],
        dilation=[1, 1], ceil_mode=ceil_mode)), CFG)
    got = run(impl, nhwc(x))
    want = F.max_pool2d(torch.from_numpy(x), 3, 2, 1,
                        ceil_mode=ceil_mode).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-6)


def test_f_max_pool2d_scalar_params_default_stride():
    # pnnx emits scalar ints for square kernels; stride defaults to kernel
    x = RNG.standard_normal((1, 2, 8, 8)).astype(np.float32)
    impl = lower_operator(
        make_op("F.max_pool2d", params=dict(kernel_size=2)), CFG)
    got = run(impl, nhwc(x))
    want = F.max_pool2d(torch.from_numpy(x), 2).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-6)


@pytest.mark.parametrize("cip", [True, False])
def test_f_avg_pool2d(cip):
    x = RNG.standard_normal((2, 3, 10, 10)).astype(np.float32)
    impl = lower_operator(make_op("F.avg_pool2d", params=dict(
        kernel_size=[3, 3], stride=[2, 2], padding=[1, 1],
        count_include_pad=cip)), CFG)
    got = run(impl, nhwc(x))
    want = F.avg_pool2d(torch.from_numpy(x), 3, 2, 1,
                        count_include_pad=cip).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5)


@pytest.mark.parametrize("out", [1, [2, 2]])
def test_f_adaptive_avg_pool2d(out):
    x = RNG.standard_normal((2, 4, 8, 8)).astype(np.float32)
    impl = lower_operator(make_op("F.adaptive_avg_pool2d",
                                  params=dict(output_size=out)), CFG)
    got = run(impl, nhwc(x))
    want = F.adaptive_avg_pool2d(torch.from_numpy(x), out).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5)


# ------------------------------------------------------------ interpolate
@pytest.mark.parametrize("typ", ["F.interpolate", "F.upsample"])
def test_f_interpolate_nearest_scale(typ):
    x = RNG.standard_normal((1, 3, 5, 7)).astype(np.float32)
    impl = lower_operator(make_op(typ, params=dict(
        scale_factor=[2.0, 2.0], mode="nearest")), CFG)
    got = run(impl, nhwc(x))
    want = F.interpolate(torch.from_numpy(x), scale_factor=2,
                         mode="nearest").numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-6)


@pytest.mark.parametrize("align", [False, True])
def test_f_interpolate_bilinear_size(align):
    x = RNG.standard_normal((1, 2, 6, 6)).astype(np.float32)
    impl = lower_operator(make_op("F.interpolate", params=dict(
        size=[9, 11], mode="bilinear", align_corners=align)), CFG)
    got = run(impl, nhwc(x))
    want = F.interpolate(torch.from_numpy(x), size=(9, 11), mode="bilinear",
                         align_corners=align).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5)


def test_f_upsample_nearest_legacy():
    x = RNG.standard_normal((1, 2, 4, 4)).astype(np.float32)
    impl = lower_operator(make_op("F.upsample_nearest",
                                  params=dict(scale_factor=2.0)), CFG)
    got = run(impl, nhwc(x))
    want = F.interpolate(torch.from_numpy(x), scale_factor=2,
                         mode="nearest").numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-6)


def test_f_interpolate_requires_target():
    with pytest.raises(ValueError):
        lower_operator(make_op("F.interpolate",
                               params=dict(mode="nearest")), CFG)


# ------------------------------------------------------------ activations
@pytest.mark.parametrize("typ,fn", [
    ("F.leaky_relu", lambda t: F.leaky_relu(t, 0.15)),
    ("F.elu", lambda t: F.elu(t, 0.7)),
    ("F.gelu", F.gelu),
    ("F.tanh", torch.tanh),
])
def test_f_activations(typ, fn):
    x = RNG.standard_normal((2, 3, 4, 4)).astype(np.float32)
    params = {}
    if typ == "F.leaky_relu":
        params["negative_slope"] = 0.15
    if typ == "F.elu":
        params["alpha"] = 0.7
    impl = lower_operator(make_op(typ, params=params), CFG)
    got = run(impl, nhwc(x))
    want = fn(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5)


def test_f_gelu_tanh_approx():
    x = RNG.standard_normal((3, 5)).astype(np.float32)
    impl = lower_operator(make_op("F.gelu",
                                  params=dict(approximate="tanh")), CFG)
    got = run(impl, x)
    want = F.gelu(torch.from_numpy(x), approximate="tanh").numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


# ----------------------------------------------------------------- slice
def test_slice_channel_dim():
    x = RNG.standard_normal((1, 8, 4, 4)).astype(np.float32)
    impl = lower_operator(make_op("Tensor.slice", params=dict(
        dim=1, start=2, end=6, step=1)), CFG)
    got = run(impl, nhwc(x))
    np.testing.assert_allclose(got, nhwc(x[:, 2:6]), atol=0)


def test_slice_open_end_and_step():
    # x[:, :, ::2] with pnnx's INT_MAX open-end sentinel
    x = RNG.standard_normal((1, 3, 8, 8)).astype(np.float32)
    impl = lower_operator(make_op("Tensor.slice", params=dict(
        dim=2, start=0, end=_INT_MAX, step=2)), CFG)
    got = run(impl, nhwc(x))
    np.testing.assert_allclose(got, nhwc(x[:, :, ::2]), atol=0)


def test_slice_negative_bounds():
    x = RNG.standard_normal((2, 4, 6, 6)).astype(np.float32)
    impl = lower_operator(make_op("Tensor.slice", params=dict(
        dim=3, start=-4, end=-1, step=1)), CFG)
    got = run(impl, nhwc(x))
    np.testing.assert_allclose(got, nhwc(x[:, :, :, -4:-1]), atol=0)


def test_slice_folded_multidim():
    # newer pnnx folds chained slices: x[:, 1:3, ::2, 1:]
    x = RNG.standard_normal((1, 4, 6, 6)).astype(np.float32)
    impl = lower_operator(make_op("Tensor.slice", params=dict(
        dims=[1, 2, 3], starts=[1, 0, 1], ends=[3, _INT_MAX, _INT_MAX],
        steps=[1, 2, 1])), CFG)
    got = run(impl, nhwc(x))
    np.testing.assert_allclose(got, nhwc(x[:, 1:3, ::2, 1:]), atol=0)


def test_slice_focus_pattern_matches_torch():
    # YOLOv5 Focus: cat of the four pixel-parity slices — the historic
    # space-to-depth stem (x[..., ::2, ::2] etc.)
    x = RNG.standard_normal((1, 3, 8, 8)).astype(np.float32)
    t = torch.from_numpy(x)
    want = torch.cat([t[..., ::2, ::2], t[..., 1::2, ::2],
                      t[..., ::2, 1::2], t[..., 1::2, 1::2]], 1).numpy()
    parts = []
    for hs, ws in ((0, 0), (1, 0), (0, 1), (1, 1)):
        impl = lower_operator(make_op("Tensor.slice", params=dict(
            dims=[2, 3], starts=[hs, ws], ends=[_INT_MAX, _INT_MAX],
            steps=[2, 2])), CFG)
        parts.append(run(impl, nhwc(x)))
    got = np.concatenate(parts, axis=3)  # channel cat in NHWC
    np.testing.assert_allclose(got, nhwc(want), atol=0)


def test_slice_rejects_nonpositive_step():
    impl = lower_operator(make_op("Tensor.slice", params=dict(
        dim=1, start=0, end=4, step=-1)), CFG)
    with pytest.raises(ValueError):
        run(impl, RNG.standard_normal((1, 4, 4, 4)).astype(np.float32))


# ---------------------------------------------------------------- expand
def test_expand_broadcasts_channel():
    x = RNG.standard_normal((2, 1, 3, 3)).astype(np.float32)
    impl = lower_operator(make_op("Tensor.expand", params=dict(
        shape=[-1, 5, -1, -1])), CFG)
    got = run(impl, nhwc(x))
    want = torch.from_numpy(x).expand(-1, 5, -1, -1).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=0)


def test_expand_rank2():
    x = RNG.standard_normal((1, 7)).astype(np.float32)
    impl = lower_operator(make_op("Tensor.expand",
                                  params=dict(shape=[4, -1])), CFG)
    got = run(impl, x)
    np.testing.assert_allclose(got, np.broadcast_to(x, (4, 7)), atol=0)


# ---------------------------------------------------------------- no-ops
@pytest.mark.parametrize("typ", [
    "nn.Identity", "nn.Dropout", "nn.Dropout2d", "F.dropout",
    "F.dropout2d", "Tensor.contiguous", "torch.clone",
])
def test_inference_noops(typ):
    x = RNG.standard_normal((2, 3, 4, 4)).astype(np.float32)
    impl = lower_operator(make_op(typ, params=dict(p=0.5)
                                  if "ropout" in typ else None), CFG)
    got = run(impl, nhwc(x))
    np.testing.assert_allclose(got, nhwc(x), atol=0)
