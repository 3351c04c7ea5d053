"""Tests for the extended op set (ops/extra.py) vs torch oracles.

Torch is the oracle here (CPU, NCHW): inputs are transposed NHWC<->NCHW
at the boundary exactly as the engine does, so these tests also pin the
logical-dim remapping rules.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from simpleinfer_tpu.config import EngineConfig
from simpleinfer_tpu.ir.graph import Attribute, Operator, Parameter
from simpleinfer_tpu.ops import lower_operator

CFG = EngineConfig()
RNG = np.random.default_rng(71)


def make_op(type_, name="t0", params=None, attrs=None, n_out=1):
    op = Operator(type=type_, name=name)
    for k, v in (params or {}).items():
        op.params[k] = Parameter.from_value(v)
    for k, v in (attrs or {}).items():
        op.attrs[k] = Attribute.from_array(np.asarray(v))
    for i in range(n_out):
        from simpleinfer_tpu.ir.graph import Operand

        op.outputs.append(Operand(name=f"o{i}"))
    return op


def run(impl, *inputs):
    weights = {k: jnp.asarray(v) for k, v in impl.weights.items()}
    out = impl.apply(weights, *[jnp.asarray(x) for x in inputs])
    if impl.n_outputs == 1:
        return np.asarray(out)
    return [np.asarray(o) for o in out]


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


# ---------------------------------------------------------------- pooling
@pytest.mark.parametrize("cip", [True, False])
@pytest.mark.parametrize("ceil_mode", [False, True])
def test_avg_pool2d(ceil_mode, cip):
    x = RNG.standard_normal((2, 3, 9, 9)).astype(np.float32)
    impl = lower_operator(make_op("nn.AvgPool2d", params=dict(
        kernel_size=[3, 3], stride=[2, 2], padding=[1, 1],
        ceil_mode=ceil_mode, count_include_pad=cip)), CFG)
    got = run(impl, nhwc(x))
    want = F.avg_pool2d(torch.from_numpy(x), 3, 2, 1, ceil_mode=ceil_mode,
                        count_include_pad=cip).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5)


# ----------------------------------------------------------- chunk/split
def test_chunk_on_channel_dim():
    x = RNG.standard_normal((1, 6, 4, 4)).astype(np.float32)
    impl = lower_operator(make_op("torch.chunk", params=dict(
        chunks=2, dim=1), n_out=2), CFG)
    got = run(impl, nhwc(x))
    want = torch.chunk(torch.from_numpy(x), 2, dim=1)
    assert len(got) == 2
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, nhwc(w.numpy()), atol=1e-6)


def test_split_sections():
    x = RNG.standard_normal((1, 7, 4, 4)).astype(np.float32)
    impl = lower_operator(make_op("torch.split", params=dict(
        split_size_or_sections=[3, 4], dim=1), n_out=2), CFG)
    got = run(impl, nhwc(x))
    want = torch.split(torch.from_numpy(x), [3, 4], dim=1)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, nhwc(w.numpy()), atol=1e-6)


# ------------------------------------------------------ permute/reshape
def test_permute_matches_torch():
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32)
    impl = lower_operator(make_op("torch.permute", params=dict(
        dims=[0, 2, 1, 3])), CFG)
    got = run(impl, nhwc(x))
    want = torch.permute(torch.from_numpy(x), (0, 2, 1, 3)).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-6)


def test_transpose_matches_torch():
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32)
    impl = lower_operator(make_op("torch.transpose", params=dict(
        dim0=1, dim1=2)), CFG)
    got = run(impl, nhwc(x))
    want = torch.transpose(torch.from_numpy(x), 1, 2).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-6)


def test_reshape_matches_torch():
    x = RNG.standard_normal((2, 6, 4, 4)).astype(np.float32)
    impl = lower_operator(make_op("torch.reshape", params=dict(
        shape=[2, 3, 2, 16])), CFG)
    got = run(impl, nhwc(x))
    want = torch.reshape(torch.from_numpy(x), (2, 3, 2, 16)).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-6)


def test_view_to_rank2():
    x = RNG.standard_normal((2, 6, 4, 4)).astype(np.float32)
    impl = lower_operator(make_op("Tensor.view", params=dict(
        shape=[2, 96])), CFG)
    got = run(impl, nhwc(x))
    want = torch.from_numpy(x).reshape(2, 96).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_unsqueeze_squeeze():
    x = RNG.standard_normal((2, 3)).astype(np.float32)
    impl = lower_operator(make_op("torch.unsqueeze", params=dict(dim=1)),
                          CFG)
    got = run(impl, x)
    assert got.shape == (2, 1, 3)
    impl2 = lower_operator(make_op("torch.squeeze", params=dict(dim=1)),
                           CFG)
    got2 = run(impl2, got)
    assert got2.shape == (2, 3)


# ------------------------------------------------------------ activations
@pytest.mark.parametrize("typ,fn", [
    ("nn.LeakyReLU", lambda t: F.leaky_relu(t, 0.1)),
    ("nn.ELU", lambda t: F.elu(t, 1.5)),
    ("nn.GELU", F.gelu),
    ("nn.Tanh", torch.tanh),
])
def test_extra_activations(typ, fn):
    x = RNG.standard_normal((2, 3, 4, 4)).astype(np.float32)
    params = {}
    if typ == "nn.LeakyReLU":
        params["negative_slope"] = 0.1
    if typ == "nn.ELU":
        params["alpha"] = 1.5
    impl = lower_operator(make_op(typ, params=params), CFG)
    got = run(impl, nhwc(x))
    want = fn(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5)


def test_prelu():
    x = RNG.standard_normal((2, 4, 3, 3)).astype(np.float32)
    slope = RNG.uniform(0.0, 0.5, 4).astype(np.float32)
    impl = lower_operator(make_op("nn.PReLU", params=dict(
        num_parameters=4), attrs={"weight": slope}), CFG)
    got = run(impl, nhwc(x))
    want = F.prelu(torch.from_numpy(x), torch.from_numpy(slope)).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-6)


# ---------------------------------------------------------- convtranspose
@pytest.mark.parametrize("stride,pad,opad", [
    ((2, 2), (1, 1), (1, 1)), ((2, 2), (0, 0), (0, 0)),
    ((1, 1), (1, 1), (0, 0)), ((3, 2), (2, 1), (1, 0)),
])
def test_conv_transpose_2d(stride, pad, opad):
    ic, oc, k = 4, 6, 3
    x = RNG.standard_normal((2, ic, 7, 8)).astype(np.float32)
    w = RNG.standard_normal((ic, oc, k, k)).astype(np.float32)
    b = RNG.standard_normal(oc).astype(np.float32)
    impl = lower_operator(make_op("nn.ConvTranspose2d", params=dict(
        in_channels=ic, out_channels=oc, kernel_size=[k, k],
        stride=list(stride), padding=list(pad), output_padding=list(opad),
        dilation=[1, 1], groups=1, bias=True),
        attrs={"weight": w, "bias": b}), CFG)
    got = run(impl, nhwc(x))
    want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              torch.from_numpy(b), stride=stride,
                              padding=pad, output_padding=opad).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=2e-4, rtol=1e-4)


# ------------------------------------------------------------ constants
def test_pnnx_attribute_constant():
    """Constant op feeding a BinaryOp add, end-to-end through the
    engine (pnnx.Attribute appears in real exports for shared consts)."""
    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.ir.graph import Attribute, Parameter
    from simpleinfer_tpu.zoo.builders import GraphBuilder

    b = GraphBuilder(seed=9)
    x = b.input([1, 3, 4, 4], name="0")
    const = RNG.standard_normal((1, 3, 4, 4)).astype(np.float32)
    outs = b._op("pnnx.Attribute", "const0", [], params={},
                 attrs={"data": const})
    b.shape[outs[0]] = [1, 3, 4, 4]
    s = b._op("BinaryOp", "add0", [x, outs[0]],
              params={"0": Parameter.from_value(0).value})[0]
    b.shape[s] = [1, 3, 4, 4]
    b.output(s)
    eng = Engine().load_model(None, graph=b.build())
    xin = RNG.standard_normal((1, 4, 4, 3)).astype(np.float32)
    got = eng.run({"0": xin})[s]
    want = xin + np.transpose(const, (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ------------------------------------------------------------- upsample
@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("oh,ow", [(8, 8), (7, 9), (12, 6)])
def test_upsample_bilinear_matches_torch(align, oh, ow):
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32)
    impl = lower_operator(make_op("nn.Upsample", params=dict(
        mode="bilinear", size=[oh, ow], align_corners=align)), CFG)
    got = run(impl, nhwc(x))
    want = F.interpolate(torch.from_numpy(x), size=(oh, ow),
                         mode="bilinear", align_corners=align).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5)


# ------------------------------------------------------------------ mean
def test_mean_spatial_keepdim():
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32)
    impl = lower_operator(make_op("torch.mean", params=dict(
        dim=[2, 3], keepdim=True)), CFG)
    got = run(impl, nhwc(x))
    want = torch.from_numpy(x).mean(dim=(2, 3), keepdim=True).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5)


def test_mean_no_keepdim():
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32)
    impl = lower_operator(make_op("torch.mean", params=dict(
        dim=[2, 3], keepdim=False)), CFG)
    got = run(impl, nhwc(x))
    want = torch.from_numpy(x).mean(dim=(2, 3)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


# ----------------------------------------------------------------- norms
@pytest.mark.parametrize("affine", [True, False])
def test_layer_norm_rank4(affine):
    # normalized_shape over the trailing LOGICAL (NCHW) dims: [H, W]
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32)
    gamma = RNG.standard_normal((4, 5)).astype(np.float32)
    beta = RNG.standard_normal((4, 5)).astype(np.float32)
    attrs = {"weight": gamma, "bias": beta} if affine else {}
    impl = lower_operator(make_op("nn.LayerNorm", params=dict(
        normalized_shape=[4, 5], eps=1e-5, elementwise_affine=affine),
        attrs=attrs), CFG)
    got = run(impl, nhwc(x))
    ln = torch.nn.LayerNorm([4, 5], elementwise_affine=affine)
    if affine:
        ln.weight.data = torch.from_numpy(gamma)
        ln.bias.data = torch.from_numpy(beta)
    want = ln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=2e-5)


def test_layer_norm_rank3_transformer_style():
    x = RNG.standard_normal((2, 7, 16)).astype(np.float32)
    gamma = RNG.standard_normal(16).astype(np.float32)
    beta = RNG.standard_normal(16).astype(np.float32)
    impl = lower_operator(make_op("nn.LayerNorm", params=dict(
        normalized_shape=[16], eps=1e-5, elementwise_affine=True),
        attrs={"weight": gamma, "bias": beta}), CFG)
    got = run(impl, x)
    ln = torch.nn.LayerNorm(16)
    ln.weight.data = torch.from_numpy(gamma)
    ln.bias.data = torch.from_numpy(beta)
    want = ln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_layer_norm_shape_mismatch_raises():
    impl = lower_operator(make_op("nn.LayerNorm", params=dict(
        normalized_shape=[8], eps=1e-5, elementwise_affine=False)), CFG)
    with pytest.raises(ValueError, match="normalized_shape"):
        run(impl, RNG.standard_normal((2, 7, 16)).astype(np.float32))


@pytest.mark.parametrize("affine", [True, False])
@pytest.mark.parametrize("groups", [1, 2, 6])
def test_group_norm(groups, affine):
    x = RNG.standard_normal((2, 6, 5, 4)).astype(np.float32)
    gamma = RNG.standard_normal(6).astype(np.float32)
    beta = RNG.standard_normal(6).astype(np.float32)
    attrs = {"weight": gamma, "bias": beta} if affine else {}
    impl = lower_operator(make_op("nn.GroupNorm", params=dict(
        num_groups=groups, num_channels=6, eps=1e-5, affine=affine),
        attrs=attrs), CFG)
    got = run(impl, nhwc(x))
    want = F.group_norm(
        torch.from_numpy(x), groups,
        torch.from_numpy(gamma) if affine else None,
        torch.from_numpy(beta) if affine else None, 1e-5).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=2e-5)


@pytest.mark.parametrize("affine", [True, False])
def test_instance_norm_2d(affine):
    x = RNG.standard_normal((2, 5, 6, 7)).astype(np.float32)
    gamma = RNG.standard_normal(5).astype(np.float32)
    beta = RNG.standard_normal(5).astype(np.float32)
    attrs = {"weight": gamma, "bias": beta} if affine else {}
    impl = lower_operator(make_op("nn.InstanceNorm2d", params=dict(
        num_features=5, eps=1e-5, affine=affine), attrs=attrs), CFG)
    got = run(impl, nhwc(x))
    want = F.instance_norm(
        torch.from_numpy(x),
        weight=torch.from_numpy(gamma) if affine else None,
        bias=torch.from_numpy(beta) if affine else None,
        eps=1e-5).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=2e-5)


@pytest.mark.parametrize("affine", [True, False])
def test_instance_norm_2d_running_stats(affine):
    """track_running_stats=True at eval = BN semantics with the running
    statistics (folded to scale+shift in the lowering)."""
    x = RNG.standard_normal((2, 5, 6, 7)).astype(np.float32)
    gamma = RNG.standard_normal(5).astype(np.float32)
    beta = RNG.standard_normal(5).astype(np.float32)
    rmean = RNG.standard_normal(5).astype(np.float32) * 0.3
    rvar = RNG.uniform(0.5, 1.5, 5).astype(np.float32)
    attrs = {"running_mean": rmean, "running_var": rvar}
    if affine:
        attrs.update({"weight": gamma, "bias": beta})
    impl = lower_operator(make_op("nn.InstanceNorm2d", params=dict(
        num_features=5, eps=1e-5, affine=affine), attrs=attrs), CFG)
    got = run(impl, nhwc(x))
    m = torch.nn.InstanceNorm2d(5, eps=1e-5, affine=affine,
                                track_running_stats=True).eval()
    with torch.no_grad():
        m.running_mean.copy_(torch.from_numpy(rmean))
        m.running_var.copy_(torch.from_numpy(rvar))
        if affine:
            m.weight.copy_(torch.from_numpy(gamma))
            m.bias.copy_(torch.from_numpy(beta))
        want = m(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=2e-5)


# ------------------------------------------------- relu6/mish/softmax/pad
def test_relu6_and_mish():
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32) * 4
    got6 = run(lower_operator(make_op("nn.ReLU6"), CFG), nhwc(x))
    np.testing.assert_allclose(got6, nhwc(F.relu6(
        torch.from_numpy(x)).numpy()), atol=1e-6)
    gotm = run(lower_operator(make_op("nn.Mish"), CFG), nhwc(x))
    np.testing.assert_allclose(gotm, nhwc(F.mish(
        torch.from_numpy(x)).numpy()), atol=1e-5)


@pytest.mark.parametrize("dim", [1, -1, 3])
def test_softmax_rank4_logical_dim(dim):
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32)
    impl = lower_operator(make_op("nn.Softmax", params=dict(dim=dim)), CFG)
    got = run(impl, nhwc(x))
    want = F.softmax(torch.from_numpy(x), dim=dim).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5)


def test_softmax_rank2():
    x = RNG.standard_normal((4, 9)).astype(np.float32)
    impl = lower_operator(make_op("nn.Softmax", params=dict(dim=-1)), CFG)
    np.testing.assert_allclose(run(impl, x), F.softmax(
        torch.from_numpy(x), -1).numpy(), atol=1e-6)


def test_clamp():
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32) * 3
    impl = lower_operator(make_op("torch.clamp",
                                  params=dict(min=-1.0, max=2.0)), CFG)
    np.testing.assert_allclose(run(impl, nhwc(x)), nhwc(
        torch.clamp(torch.from_numpy(x), -1, 2).numpy()), atol=1e-6)
    # one-sided
    impl = lower_operator(make_op("torch.clamp", params=dict(min=0.0)),
                          CFG)
    np.testing.assert_allclose(run(impl, nhwc(x)), nhwc(
        torch.clamp(torch.from_numpy(x), min=0).numpy()), atol=1e-6)


def test_zero_pad_2d():
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32)
    impl = lower_operator(make_op("nn.ZeroPad2d",
                                  params=dict(padding=[1, 2, 3, 4])), CFG)
    got = run(impl, nhwc(x))
    want = torch.nn.ZeroPad2d((1, 2, 3, 4))(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-6)


@pytest.mark.parametrize("mode", ["constant", "replicate", "reflect"])
def test_f_pad_modes(mode):
    x = RNG.standard_normal((2, 3, 6, 7)).astype(np.float32)
    params = dict(pad=[1, 2, 2, 1], mode=mode)
    if mode == "constant":
        params["value"] = 0.5
    impl = lower_operator(make_op("F.pad", params=params), CFG)
    got = run(impl, nhwc(x))
    kwargs = {"value": 0.5} if mode == "constant" else {}
    want = F.pad(torch.from_numpy(x), (1, 2, 2, 1), mode=mode,
                 **kwargs).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-6)


# ------------------------------------------------------ reductions/stack
@pytest.mark.parametrize("dims,keepdim", [
    ([2], False),   # single spatial dim: survivor order must be logical
    ([1], False),   # channel
    ([2, 3], False), ([1], True), ([2], True), ([1, 2, 3], False),
])
def test_sum_and_mean_dim_orders(dims, keepdim):
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32)
    for typ, tfn in (("torch.sum", torch.sum), ("torch.mean", torch.mean)):
        impl = lower_operator(make_op(typ, params=dict(
            dim=dims, keepdim=keepdim)), CFG)
        got = run(impl, nhwc(x))
        want = tfn(torch.from_numpy(x), dim=dims, keepdim=keepdim).numpy()
        if want.ndim == 4:
            want = nhwc(want)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_amax_matches_torch():
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32)
    impl = lower_operator(make_op("torch.amax", params=dict(
        dim=[2], keepdim=False)), CFG)
    got = run(impl, nhwc(x))
    want = torch.amax(torch.from_numpy(x), dim=2).numpy()
    np.testing.assert_allclose(got, want, atol=0)


def test_stack_4d_inputs_gives_logical_5d():
    a = RNG.standard_normal((1, 2, 3, 3)).astype(np.float32)
    b = RNG.standard_normal((1, 2, 3, 3)).astype(np.float32)
    impl = lower_operator(make_op("torch.stack", params=dict(dim=1)), CFG)
    got = run(impl, nhwc(a), nhwc(b))
    want = torch.stack([torch.from_numpy(a), torch.from_numpy(b)],
                       dim=1).numpy()
    np.testing.assert_allclose(got, want, atol=0)  # 5-D stays logical


def test_stack_3d_inputs_gives_physical_nhwc():
    a = RNG.standard_normal((2, 3, 4)).astype(np.float32)
    b = RNG.standard_normal((2, 3, 4)).astype(np.float32)
    impl = lower_operator(make_op("torch.stack", params=dict(dim=0)), CFG)
    got = run(impl, a, b)
    want = torch.stack([torch.from_numpy(a), torch.from_numpy(b)]).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=0)


# ------------------------------------------------- review-fix regressions
def test_avg_pool2d_ceil_overhang_divisor():
    """ceil_mode adds a window hanging past the (padded) input; torch
    clips the count_include_pad divisor to the padded extent."""
    x = RNG.standard_normal((2, 3, 8, 8)).astype(np.float32)
    for cip in (True, False):
        impl = lower_operator(make_op("nn.AvgPool2d", params=dict(
            kernel_size=[3, 3], stride=[2, 2], padding=[0, 0],
            ceil_mode=True, count_include_pad=cip)), CFG)
        got = run(impl, nhwc(x))
        want = F.avg_pool2d(torch.from_numpy(x), 3, 2, 0, ceil_mode=True,
                            count_include_pad=cip).numpy()
        np.testing.assert_allclose(got, nhwc(want), atol=1e-5, err_msg=str(cip))


def test_avg_pool2d_ceil_overhang_with_padding():
    x = RNG.standard_normal((1, 2, 7, 7)).astype(np.float32)
    impl = lower_operator(make_op("nn.AvgPool2d", params=dict(
        kernel_size=[3, 3], stride=[3, 3], padding=[1, 1],
        ceil_mode=True, count_include_pad=True)), CFG)
    got = run(impl, nhwc(x))
    want = F.avg_pool2d(torch.from_numpy(x), 3, 3, 1, ceil_mode=True,
                        count_include_pad=True).numpy()
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5)


def test_clamp_none_min_param():
    """pnnx writes unset optionals as `min=None` (PARAM_NULL) — must not
    crash at load; clamps only the given bound."""
    from simpleinfer_tpu.ir.graph import Parameter

    op = make_op("torch.clamp", params=dict(max=0.5))
    op.params["min"] = Parameter.from_value(None)
    impl = lower_operator(op, CFG)
    x = RNG.standard_normal((3, 4)).astype(np.float32)
    np.testing.assert_allclose(run(impl, x), np.minimum(x, 0.5), atol=0)


def test_clamp_int_params():
    impl = lower_operator(make_op("torch.clamp",
                                  params=dict(min=0, max=6)), CFG)
    x = (RNG.standard_normal((3, 4)) * 10).astype(np.float32)
    np.testing.assert_allclose(run(impl, x), np.clip(x, 0, 6), atol=0)


def test_chunk_early_exhaustion_matches_torch():
    """torch.chunk(5-wide, 4) returns 3 chunks of (2,2,1)."""
    x = RNG.standard_normal((1, 5, 4, 4)).astype(np.float32)
    want = torch.chunk(torch.from_numpy(x), 4, dim=1)
    assert len(want) == 3
    op = make_op("torch.chunk", params=dict(chunks=4, dim=1), n_out=3)
    impl = lower_operator(op, CFG)
    got = run(impl, nhwc(x))
    assert len(got) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, nhwc(w.numpy()), atol=0)


def test_chunk_declared_output_mismatch_raises():
    op = make_op("torch.chunk", params=dict(chunks=4, dim=1), n_out=4)
    impl = lower_operator(op, CFG)
    x = RNG.standard_normal((1, 5, 4, 4)).astype(np.float32)
    with pytest.raises(ValueError):
        run(impl, nhwc(x))
