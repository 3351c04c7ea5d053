"""Per-op tests vs numpy loop oracles.

Same strategy and tolerances as the reference's Catch2 layer tests
(SURVEY.md §4.1; conv tolerance 2e-4 from test_conv_2d.cpp:127). Ops are
exercised through the lowering registry with synthetic pnnx Operators —
the analog of constructing a Layer directly and calling Forward.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from simpleinfer_tpu.config import EngineConfig
from simpleinfer_tpu.ir.graph import Attribute, Operator, Parameter
from simpleinfer_tpu.ops import lower_operator

from oracles import (
    batch_norm_oracle,
    conv2d_nhwc_oracle,
    linear_oracle,
    max_pool_2d_oracle,
    upsample_nearest_oracle,
)

CFG = EngineConfig()
RNG = np.random.default_rng(42)


def make_op(type_, name="t0", params=None, attrs=None):
    op = Operator(type=type_, name=name)
    for k, v in (params or {}).items():
        op.params[k] = Parameter.from_value(v)
    for k, v in (attrs or {}).items():
        op.attrs[k] = Attribute.from_array(np.asarray(v))
    return op


def run(impl, *inputs):
    weights = {k: jnp.asarray(v) for k, v in impl.weights.items()}
    out = impl.apply(weights, *[jnp.asarray(x) for x in inputs])
    return np.asarray(out)


# ----------------------------------------------------------------- conv2d
def _conv_case(n, h, w, ic, oc, k, stride, pad, dilation=(1, 1), groups=1,
               bias=True, tol=2e-4):
    x = RNG.standard_normal((n, h, w, ic), dtype=np.float32)
    wt = RNG.standard_normal((oc, ic // groups, k[0], k[1]),
                             dtype=np.float32)
    b = RNG.standard_normal(oc, dtype=np.float32) if bias else None
    op = make_op("nn.Conv2d", params=dict(
        padding_mode="zeros", padding=list(pad), kernel_size=list(k),
        stride=list(stride), dilation=list(dilation), groups=groups,
        in_channels=ic, out_channels=oc, bias=bias),
        attrs={"weight": wt, **({"bias": b} if bias else {})})
    impl = lower_operator(op, CFG)
    got = run(impl, x)
    want = conv2d_nhwc_oracle(x, wt, b, stride, pad, dilation, groups)
    np.testing.assert_allclose(got, want, atol=tol, rtol=1e-4)


def test_conv2d_3x3_s1_p1():
    _conv_case(2, 8, 8, 3, 8, (3, 3), (1, 1), (1, 1))


def test_conv2d_1x1_yolo_head_shape():
    # the YOLO-head-shaped 1x1 conv case (test_conv_2d.cpp:418-558)
    _conv_case(1, 4, 4, 32, 33, (1, 1), (1, 1), (0, 0), tol=5e-4)


def test_conv2d_grouped():
    _conv_case(2, 6, 6, 8, 12, (3, 3), (1, 1), (1, 1), groups=4)


def test_conv2d_6x6_s2_g2_batch8():
    # mirrors the 6x6 s2 g2 batch-8 case (test_conv_2d.cpp:276-416)
    _conv_case(8, 13, 13, 4, 6, (6, 6), (2, 2), (2, 2), groups=2)


def test_conv2d_stem_s2d_yolo():
    """6x6 s2 p2 ic=3 — triggers the space-to-depth stem rewrite."""
    _conv_case(2, 64, 64, 3, 16, (6, 6), (2, 2), (2, 2))


def test_conv2d_stem_s2d_resnet():
    """7x7 s2 p3 ic=3 — odd kernel, zero-padded to 8 in the rewrite."""
    _conv_case(1, 32, 32, 3, 8, (7, 7), (2, 2), (3, 3))


def test_conv2d_stem_s2d_odd_input_falls_back():
    """odd H+2p cannot be space-to-depth'd; the lax path must fire."""
    _conv_case(1, 13, 13, 3, 8, (6, 6), (2, 2), (2, 2))


def test_conv2d_stem_s2d_no_bias_stride2():
    _conv_case(1, 16, 16, 4, 8, (4, 4), (2, 2), (1, 1), bias=False)


def test_conv2d_stem_overpadded_falls_back():
    """pad >= kernel: surplus zero columns; the packed path must bail."""
    _conv_case(1, 16, 16, 3, 8, (2, 2), (2, 2), (3, 3))


def test_conv2d_dilated():
    _conv_case(1, 10, 10, 3, 5, (3, 3), (1, 1), (2, 2), dilation=(2, 2))


def test_conv2d_no_bias():
    _conv_case(1, 5, 5, 3, 4, (3, 3), (2, 2), (0, 0), bias=False)


def test_conv2d_asymmetric_kernel():
    _conv_case(1, 9, 7, 2, 3, (3, 1), (1, 1), (1, 0))


def test_conv2d_replicate_padding():
    x = RNG.standard_normal((1, 6, 6, 3), dtype=np.float32)
    wt = RNG.standard_normal((4, 3, 3, 3), dtype=np.float32)
    b = np.zeros(4, np.float32)
    op = make_op("nn.Conv2d", params=dict(
        padding_mode="replicate", padding=[1, 1], kernel_size=[3, 3],
        stride=[1, 1], dilation=[1, 1], groups=1, in_channels=3,
        out_channels=4, bias=True), attrs={"weight": wt, "bias": b})
    got = run(lower_operator(op, CFG), x)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    want = conv2d_nhwc_oracle(xp, wt, b, (1, 1), (0, 0))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ----------------------------------------------------------------- linear
def test_linear():
    x = RNG.standard_normal((4, 16), dtype=np.float32)
    w = RNG.standard_normal((8, 16), dtype=np.float32)
    b = RNG.standard_normal(8, dtype=np.float32)
    op = make_op("nn.Linear", params=dict(in_features=16, out_features=8,
                                          bias=True),
                 attrs={"weight": w, "bias": b})
    got = run(lower_operator(op, CFG), x)
    np.testing.assert_allclose(got, linear_oracle(x, w, b), atol=1e-4)


def test_linear_batched_leading_dims():
    x = RNG.standard_normal((2, 3, 16), dtype=np.float32)
    w = RNG.standard_normal((8, 16), dtype=np.float32)
    op = make_op("nn.Linear", params=dict(in_features=16, out_features=8,
                                          bias=False), attrs={"weight": w})
    got = run(lower_operator(op, CFG), x)
    np.testing.assert_allclose(got, linear_oracle(x, w), atol=1e-4)


# ------------------------------------------------------------- batch norm
def test_batch_norm_2d():
    c = 6
    x = RNG.standard_normal((2, 4, 4, c), dtype=np.float32)
    mean = RNG.standard_normal(c, dtype=np.float32)
    var = RNG.random(c, dtype=np.float32) + 0.1
    gamma = RNG.standard_normal(c, dtype=np.float32)
    beta = RNG.standard_normal(c, dtype=np.float32)
    op = make_op("nn.BatchNorm2d",
                 params=dict(eps=1e-5, num_features=c, affine=True),
                 attrs=dict(running_mean=mean, running_var=var, weight=gamma,
                            bias=beta))
    got = run(lower_operator(op, CFG), x)
    want = batch_norm_oracle(x, mean, var, gamma, beta, 1e-5)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------- pooling
@pytest.mark.parametrize("case", [
    dict(shape=(1, 8, 8, 3), kernel=(2, 2), stride=(2, 2), padding=(0, 0)),
    dict(shape=(2, 9, 9, 4), kernel=(3, 3), stride=(2, 2), padding=(1, 1)),
    dict(shape=(1, 7, 5, 2), kernel=(3, 2), stride=(1, 2), padding=(1, 0)),
])
def test_max_pool_2d(case):
    x = RNG.standard_normal(case["shape"], dtype=np.float32)
    op = make_op("nn.MaxPool2d", params=dict(
        ceil_mode=False, return_indices=False, padding=list(case["padding"]),
        kernel_size=list(case["kernel"]), stride=list(case["stride"]),
        dilation=[1, 1]))
    got = run(lower_operator(op, CFG), x)
    want = max_pool_2d_oracle(x, case["kernel"], case["stride"],
                              case["padding"])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_max_pool_2d_ceil_mode():
    # 8x8, k3 s2 p0: floor -> 3, ceil -> 4 (torch semantics)
    x = RNG.standard_normal((1, 8, 8, 2), dtype=np.float32)
    op = make_op("nn.MaxPool2d", params=dict(
        ceil_mode=True, return_indices=False, padding=[0, 0],
        kernel_size=[3, 3], stride=[2, 2], dilation=[1, 1]))
    got = run(lower_operator(op, CFG), x)
    assert got.shape == (1, 4, 4, 2)
    # last window starts at row/col 6, covers only rows/cols 6..7
    np.testing.assert_allclose(got[0, 3, 3, :], x[0, 6:8, 6:8, :].max((0, 1)))


def test_adaptive_avg_pool_global():
    x = RNG.standard_normal((2, 6, 6, 5), dtype=np.float32)
    op = make_op("nn.AdaptiveAvgPool2d", params=dict(output_size=[1, 1]))
    got = run(lower_operator(op, CFG), x)
    np.testing.assert_allclose(got, x.mean(axis=(1, 2), keepdims=True),
                               atol=1e-5)


def test_adaptive_avg_pool_divisible():
    x = RNG.standard_normal((1, 8, 8, 3), dtype=np.float32)
    op = make_op("nn.AdaptiveAvgPool2d", params=dict(output_size=[2, 2]))
    got = run(lower_operator(op, CFG), x)
    want = x.reshape(1, 2, 4, 2, 4, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, atol=1e-5)


# ------------------------------------------------------------ activations
def test_activations():
    x = RNG.standard_normal((2, 3, 4, 5), dtype=np.float32) * 4
    cases = {
        "nn.ReLU": np.maximum(x, 0),
        "nn.Sigmoid": 1 / (1 + np.exp(-x)),
        "nn.SiLU": x / (1 + np.exp(-x)),
        "nn.Hardsigmoid": np.clip(x / 6 + 0.5, 0, 1),
        "nn.Hardswish": x * np.clip(x / 6 + 0.5, 0, 1),
    }
    for type_, want in cases.items():
        got = run(lower_operator(make_op(type_), CFG), x)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5,
                                   err_msg=type_)


# ---------------------------------------------------------- binary/unary
def test_binary_add_broadcast():
    a = RNG.standard_normal((2, 4, 4, 8), dtype=np.float32)
    b = RNG.standard_normal((2, 1, 1, 8), dtype=np.float32)
    op = make_op("BinaryOp", params={"0": 0})
    got = run(lower_operator(op, CFG), a, b)
    np.testing.assert_allclose(got, a + b, atol=1e-6)


def test_binary_mul():
    a = RNG.standard_normal((2, 4, 4, 8), dtype=np.float32)
    b = RNG.standard_normal((2, 4, 4, 8), dtype=np.float32)
    op = make_op("BinaryOp", params={"0": 2})
    got = run(lower_operator(op, CFG), a, b)
    np.testing.assert_allclose(got, a * b, atol=1e-6)


def test_binary_scalar_variants():
    x = np.abs(RNG.standard_normal((3, 4), dtype=np.float32)) + 0.5
    # (code, scalar, expected)
    cases = [
        (0, 2.0, x + 2.0),
        (1, 2.0, x - 2.0),
        (3, 2.0, x / 2.0),
        (7, 1.0, 1.0 - x),   # rsub: scalar - x
        (8, 1.0, 1.0 / x),   # rdiv: scalar / x
        (6, 2.0, x ** 2.0),
    ]
    for code, s, want in cases:
        op = make_op("BinaryOp", params={"0": code, "1": 1, "2": s})
        got = run(lower_operator(op, CFG), x)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5,
                                   err_msg=f"code {code}")


def test_unary_table():
    x = np.abs(RNG.standard_normal((3, 4), dtype=np.float32)) + 0.5
    cases = {0: np.abs(x), 1: -x, 4: x ** 2, 5: np.sqrt(x),
             6: 1 / np.sqrt(x), 7: np.exp(x), 8: np.log(x), 16: np.tanh(x)}
    for code, want in cases.items():
        op = make_op("UnaryOp", params={"0": code})
        got = run(lower_operator(op, CFG), x)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5,
                                   err_msg=f"code {code}")


# ------------------------------------------------------------- shape ops
def test_cat_channel_dim_remap():
    # NCHW dim=1 (channels) -> NHWC axis 3 (cat.cpp:84-91)
    a = RNG.standard_normal((1, 4, 4, 3), dtype=np.float32)
    b = RNG.standard_normal((1, 4, 4, 5), dtype=np.float32)
    op = make_op("torch.cat", params=dict(dim=1))
    got = run(lower_operator(op, CFG), a, b)
    np.testing.assert_array_equal(got, np.concatenate([a, b], axis=3))


def test_cat_spatial_dim_remap():
    a = RNG.standard_normal((1, 4, 4, 3), dtype=np.float32)
    b = RNG.standard_normal((1, 2, 4, 3), dtype=np.float32)
    op = make_op("torch.cat", params=dict(dim=2))  # NCHW H -> NHWC axis 1
    got = run(lower_operator(op, CFG), a, b)
    np.testing.assert_array_equal(got, np.concatenate([a, b], axis=1))


def test_cat_rank3_no_remap():
    a = RNG.standard_normal((1, 5, 7), dtype=np.float32)
    b = RNG.standard_normal((1, 3, 7), dtype=np.float32)
    op = make_op("torch.cat", params=dict(dim=1))
    got = run(lower_operator(op, CFG), a, b)
    np.testing.assert_array_equal(got, np.concatenate([a, b], axis=1))


def test_flatten_matches_pytorch_order():
    # NHWC input flattened in NCHW order (flatten.cpp:71-79)
    x = RNG.standard_normal((2, 3, 4, 5), dtype=np.float32)  # N,H,W,C
    op = make_op("torch.flatten", params=dict(start_dim=1, end_dim=-1))
    got = run(lower_operator(op, CFG), x)
    want = np.transpose(x, (0, 3, 1, 2)).reshape(2, -1)
    np.testing.assert_array_equal(got, want)


def test_upsample_nearest_2x():
    x = RNG.standard_normal((1, 4, 4, 3), dtype=np.float32)
    op = make_op("nn.Upsample", params=dict(mode="nearest",
                                            scale_factor=[2.0, 2.0]))
    got = run(lower_operator(op, CFG), x)
    np.testing.assert_array_equal(got, upsample_nearest_oracle(x, (2.0, 2.0)))


def test_upsample_nearest_fractional():
    x = RNG.standard_normal((1, 5, 5, 2), dtype=np.float32)
    op = make_op("nn.Upsample", params=dict(mode="nearest",
                                            scale_factor=[1.5, 1.5]))
    got = run(lower_operator(op, CFG), x)
    np.testing.assert_array_equal(got, upsample_nearest_oracle(x, (1.5, 1.5)))


# ------------------------------------------------------------ yolo detect
def test_yolo_detect():
    na, ni = 3, 85  # anchors per level, 5+80 classes
    strides = np.array([8.0, 16.0, 32.0], dtype=np.float32)
    hw = [(8, 8), (4, 4), (2, 2)]
    chans = [16, 24, 32]
    attrs = {"pnnx_5": strides}
    feats = []
    grids, anchors, convs = [], [], []
    for i, ((h, w), c) in enumerate(zip(hw, chans)):
        wt = RNG.standard_normal((na * ni, c, 1, 1), dtype=np.float32) * 0.1
        b = RNG.standard_normal(na * ni, dtype=np.float32) * 0.1
        attrs[f"m.{i}.weight"] = wt
        attrs[f"m.{i}.bias"] = b
        convs.append((wt, b))
        grid = RNG.standard_normal((1, na, h, w, 2)).astype(np.float32)
        anchor = np.abs(RNG.standard_normal((1, na, h, w, 2))).astype(
            np.float32)
        attrs[f"pnnx_{[6, 3, 1][i]}"] = grid
        attrs[f"pnnx_{[4, 2, 0][i]}"] = anchor
        grids.append(grid)
        anchors.append(anchor)
        feats.append(RNG.standard_normal((2, h, w, c), dtype=np.float32))

    op = make_op("models.yolo.Detect", attrs=attrs)
    impl = lower_operator(op, CFG)
    got = run(impl, *feats)

    total = sum(h * w * na for h, w in hw)
    assert got.shape == (2, total, ni)

    # oracle: per level 1x1 conv + sigmoid + decode
    def sig(v):
        return 1 / (1 + np.exp(-v))

    outs = []
    for i, ((h, w), c) in enumerate(zip(hw, chans)):
        wt, b = convs[i]
        x = feats[i]
        y = np.einsum("nhwc,oc->nhwo", x, wt[:, :, 0, 0]) + b
        y = sig(y).reshape(2, h * w * na, ni)
        grid = np.transpose(grids[i], (0, 2, 3, 1, 4)).reshape(1, -1, 2)
        anchor = np.transpose(anchors[i], (0, 2, 3, 1, 4)).reshape(1, -1, 2)
        xy = (y[..., 0:2] * 2 + grid) * strides[i]
        wh = (y[..., 2:4] * 2) ** 2 * anchor
        outs.append(np.concatenate([xy, wh, y[..., 4:]], axis=-1))
    want = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_unsupported_op_error():
    from simpleinfer_tpu.ops import UnsupportedOpError
    with pytest.raises(UnsupportedOpError):
        lower_operator(make_op("nn.GLU"), CFG)
