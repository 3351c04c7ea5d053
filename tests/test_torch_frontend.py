"""torch.fx frontend tests: export an eager nn.Module, run it on the
Engine, compare against the live torch module itself — a stronger
oracle than the re-implementation in torch_ref.py.

The reference has no in-process exporter (it consumes files produced by
the external pnnx CLI tool); this frontend is the capability upgrade
that removes that tool dependency.
"""
import numpy as np
import pytest

import torch
import torch.nn as nn
import torch.nn.functional as F

from simpleinfer_tpu import Engine, EngineConfig
from simpleinfer_tpu.frontends import export_torch
from simpleinfer_tpu.frontends.torch_export import TorchExportError

RNG = np.random.default_rng(77)


def _check(module, shape_nchw, tol=2e-4, cfg=None):
    torch.manual_seed(3)
    module = module.eval()
    x = RNG.standard_normal(shape_nchw).astype(np.float32)
    with torch.no_grad():
        want = module(torch.from_numpy(x)).numpy()
    graph, in_name, out_name = export_torch(module, x)
    eng = Engine(cfg).load_model(None, graph=graph)
    feed = np.transpose(x, (0, 2, 3, 1)) if x.ndim == 4 else x
    got = eng.run({in_name: feed})[out_name]
    if got.ndim == 4:
        got = np.transpose(got, (0, 3, 1, 2))
    assert got.shape == want.shape
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, atol=tol * scale, rtol=1e-3)
    return eng


def test_conv_bn_act_pool_linear():
    m = nn.Sequential(
        nn.Conv2d(3, 16, 3, stride=2, padding=1),
        nn.BatchNorm2d(16),
        nn.ReLU(),
        nn.MaxPool2d(2),
        nn.Conv2d(16, 32, 3, padding=1, bias=False),
        nn.Hardswish(),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(32, 10),
    )
    # randomize BN stats so folding is actually exercised
    with torch.no_grad():
        m[1].running_mean.normal_(0, 0.3)
        m[1].running_var.uniform_(0.5, 1.5)
    _check(m, (2, 3, 32, 32))


class _Residual(nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(8, 8, 3, padding=1)
        self.c2 = nn.Conv2d(8, 8, 3, padding=1)

    def forward(self, x):
        y = F.silu(self.c1(x))
        return x + self.c2(y) * 0.5


def test_residual_add_and_scalar_mul():
    _check(_Residual(), (1, 8, 16, 16))


class _Branchy(nn.Module):
    def __init__(self):
        super().__init__()
        self.a = nn.Conv2d(4, 6, 1)
        self.b = nn.Conv2d(4, 6, 3, padding=1)
        self.head = nn.Conv2d(12, 5, 1)
        self.up = nn.Upsample(scale_factor=2.0, mode="nearest")

    def forward(self, x):
        y = torch.cat([torch.sigmoid(self.a(x)), self.b(x)], dim=1)
        return self.up(self.head(y))


def test_cat_upsample_sigmoid():
    _check(_Branchy(), (2, 4, 12, 12))


class _Grouped(nn.Module):
    def __init__(self):
        super().__init__()
        self.dw = nn.Conv2d(8, 8, 3, padding=1, groups=8)
        self.pw = nn.Conv2d(8, 12, 1)

    def forward(self, x):
        return self.pw(F.hardsigmoid(self.dw(x)))


def test_depthwise_separable():
    _check(_Grouped(), (1, 8, 10, 10))


def test_flatten_method_and_linear():
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(4 * 6 * 6, 3)

        def forward(self, x):
            return self.fc(x.flatten(1))

    _check(M(), (2, 4, 6, 6))


def test_export_int8_static_path():
    m = nn.Sequential(
        nn.Conv2d(3, 16, 3, padding=1), nn.SiLU(),
        nn.Conv2d(16, 16, 3, padding=1), nn.SiLU(),
        nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(16, 4),
    )
    torch.manual_seed(1)
    x = RNG.standard_normal((1, 3, 16, 16)).astype(np.float32)
    graph, in_name, out_name = export_torch(m.eval(), x)
    eng = Engine(EngineConfig(quant="int8", int8_min_channels=1)).load_model(
        None, graph=graph)
    feed = np.transpose(x, (0, 2, 3, 1))
    eng.calibrate([{in_name: feed}])
    got = eng.run({in_name: feed})[out_name]
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    assert np.argmax(got) == np.argmax(want)


def test_file_roundtrip(tmp_path):
    """Exported graphs serialize through the pnnx writer and reload."""
    m = nn.Sequential(nn.Conv2d(3, 4, 3, padding=1), nn.ReLU())
    x = RNG.standard_normal((1, 3, 8, 8)).astype(np.float32)
    graph, in_name, out_name = export_torch(m.eval(), x)
    param, binf = str(tmp_path / "m.pnnx.param"), str(tmp_path / "m.pnnx.bin")
    graph.save(param, binf)
    eng = Engine().load_model(param, binf)
    feed = np.transpose(x, (0, 2, 3, 1))
    got = eng.run({in_name: feed})[out_name]
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_unsupported_module_raises():
    class Odd(nn.Module):
        def __init__(self):
            super().__init__()
            self.gru = nn.GRU(4, 4)

        def forward(self, x):
            return self.gru(x)[0]

    x = RNG.standard_normal((2, 1, 4)).astype(np.float32)
    with pytest.raises(TorchExportError):
        export_torch(Odd(), x)


def test_builtin_torch_relu_function():
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 4, 1)

        def forward(self, x):
            return torch.relu(self.c(x))

    _check(M(), (1, 3, 8, 8))


def test_conv_transpose_and_interpolate():
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.up = nn.ConvTranspose2d(6, 4, 2, stride=2)
            self.c = nn.Conv2d(4, 4, 3, padding=1)

        def forward(self, x):
            y = torch.relu(self.up(x))
            y = F.interpolate(y, scale_factor=2.0, mode="nearest")
            return self.c(y)

    _check(M(), (1, 6, 7, 7))


def test_interpolate_bilinear():
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 4, 1)

        def forward(self, x):
            return F.interpolate(self.c(x), scale_factor=2.0,
                                 mode="bilinear", align_corners=False)

    _check(M(), (1, 3, 6, 6), tol=2e-3)


class _C2f(nn.Module):
    """YOLOv8-style C2f: chunk + getitem + per-branch conv + cat."""

    def __init__(self):
        super().__init__()
        self.cv1 = nn.Conv2d(8, 8, 1)
        self.m = nn.Conv2d(4, 4, 3, padding=1)
        self.cv2 = nn.Conv2d(12, 6, 1)

    def forward(self, x):
        a, b = self.cv1(x).chunk(2, 1)
        c = self.m(b)
        return self.cv2(torch.cat([a, b, c], 1))


def test_chunk_getitem_c2f_block():
    _check(_C2f(), (2, 8, 12, 12))


def test_rank_reducing_indexing_raises_not_aliases():
    """x[0] (rank-reducing int index) must raise, not silently export
    the full tensor. Basic slicing (x[:, :2]) exports as Tensor.slice
    — covered in test_slice_getitem_exports below."""
    class M1(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 4, 1)

        def forward(self, x):
            return self.c(x)[0]

    class M3(nn.Module):
        def forward(self, x):
            return x[:, 0]  # int inside a tuple index

    x = RNG.standard_normal((2, 3, 4, 4)).astype(np.float32)
    with pytest.raises(TorchExportError):
        export_torch(M1(), x)
    with pytest.raises(TorchExportError):
        export_torch(M3(), x)


def test_slice_getitem_exports():
    class M(nn.Module):
        def forward(self, x):
            return x[:, 1:3, ::2]

    _check(M(), (2, 4, 6, 6))


def test_focus_stem_exports():
    """YOLOv5 Focus: four strided slices + channel cat + conv."""
    class Focus(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(12, 8, 1)

        def forward(self, x):
            return self.c(torch.cat(
                [x[..., ::2, ::2], x[..., 1::2, ::2],
                 x[..., ::2, 1::2], x[..., 1::2, 1::2]], 1))

    _check(Focus(), (1, 3, 8, 8))


def test_full_slice_aliases():
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 4, 1)

        def forward(self, x):
            return self.c(x[:])

    _check(M(), (1, 3, 4, 4))


def test_functional_pools_export():
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 8, 3, padding=1)

        def forward(self, x):
            x = F.max_pool2d(self.c(x), 2)
            x = F.avg_pool2d(x, 2, 1, 1)
            x = F.adaptive_avg_pool2d(x, 1)
            return torch.flatten(x, 1)

    _check(M(), (2, 3, 16, 16))


def test_functional_leaky_elu_dropout_export():
    class M(nn.Module):
        def forward(self, x):
            x = F.leaky_relu(x, 0.2)
            x = F.dropout(x, p=0.5, training=False)
            return F.elu(x, alpha=0.6)

    _check(M(), (1, 3, 4, 4))


def test_multi_input_export():
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 4, 1)

        def forward(self, a, b):
            return self.c(a) + self.c(b) * 0.5

    torch.manual_seed(4)
    m = M().eval()
    a = RNG.standard_normal((1, 3, 6, 6)).astype(np.float32)
    b = RNG.standard_normal((1, 3, 6, 6)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    graph, in_names, out_name = export_torch(m, (a, b))
    assert in_names == ["a", "b"]
    eng = Engine().load_model(None, graph=graph)
    got = eng.run({"a": np.transpose(a, (0, 2, 3, 1)),
                   "b": np.transpose(b, (0, 2, 3, 1))})[out_name]
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               atol=2e-4, rtol=1e-3)


def test_missing_example_inputs_raise():
    class M(nn.Module):
        def forward(self, a, b):
            return a + b

    x = RNG.standard_normal((1, 3, 4, 4)).astype(np.float32)
    with pytest.raises((TorchExportError, TypeError)):
        export_torch(M(), x)


def test_expand_clone_export():
    class M(nn.Module):
        def forward(self, x):
            return x.clone().expand(-1, 4, -1, -1)

    _check(M(), (2, 1, 3, 3))


def test_add_with_alpha_raises():
    class M(nn.Module):
        def forward(self, x):
            return torch.add(x, x, alpha=2.0)

    with pytest.raises(TorchExportError):
        export_torch(M(), RNG.standard_normal((1, 3, 4, 4))
                     .astype(np.float32))


def test_gelu_tanh_approximation_exported():
    m = nn.Sequential(nn.Conv2d(3, 4, 1), nn.GELU(approximate="tanh"))
    _check(m, (1, 3, 8, 8))


def test_interpolate_positional_size():
    class M(nn.Module):
        def forward(self, x):
            return F.interpolate(x, (8, 8))

    _check(M(), (1, 3, 4, 4))


def test_mean_without_dim_raises():
    class M(nn.Module):
        def forward(self, x):
            return torch.mean(x)

    with pytest.raises(TorchExportError):
        export_torch(M(), RNG.standard_normal((1, 3, 4, 4))
                     .astype(np.float32))


def test_norm_family_export():
    """LayerNorm/GroupNorm/InstanceNorm2d export + lowering vs live
    torch modules (superset ops — absent from the reference registry)."""
    m = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1),
        nn.GroupNorm(2, 8),
        nn.ReLU(),
        nn.Conv2d(8, 8, 3, padding=1),
        nn.InstanceNorm2d(8, affine=True),
        nn.Hardswish(),
        nn.LayerNorm([8, 8]),   # over trailing logical H,W dims
    )
    with torch.no_grad():
        m[4].weight.normal_(1.0, 0.2)
        m[4].bias.normal_(0, 0.2)
        m[6].weight.normal_(1.0, 0.2)
        m[6].bias.normal_(0, 0.2)
    _check(m, (2, 3, 8, 8), tol=5e-4)


def test_layer_norm_channels_last_vector():
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(12, 16)
            self.ln = nn.LayerNorm(16)

        def forward(self, x):
            return self.ln(self.fc(x))

    _check(M(), (4, 12), tol=5e-4)


def test_instance_norm_running_stats_export():
    """InstanceNorm2d(track_running_stats=True) must export the running
    stats — eval-mode normalizes with them, not per-instance stats."""
    m = nn.Sequential(
        nn.Conv2d(3, 6, 3, padding=1),
        nn.InstanceNorm2d(6, affine=True, track_running_stats=True),
    )
    with torch.no_grad():
        m[1].running_mean.normal_(0, 0.3)
        m[1].running_var.uniform_(0.5, 1.5)
    _check(m, (2, 3, 8, 8), tol=5e-4)


def test_relu6_softmax_pad_clamp_export():
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 8, 3, padding=1)
            self.pad = nn.ZeroPad2d((1, 1, 2, 2))
            self.act = nn.ReLU6()

        def forward(self, x):
            y = self.act(self.conv(self.pad(x)))
            y = F.pad(y, (0, 1, 1, 0), mode="replicate")
            y = torch.clamp(y, max=3.0)
            y = F.mish(y)
            y = y.flatten(1)
            return F.softmax(y, dim=-1)

    _check(M(), (2, 3, 8, 8), tol=5e-4)


def test_split_sections_and_int_export():
    class M1(nn.Module):
        def forward(self, x):
            a, b, c = torch.split(x, [1, 2, 3], dim=1)
            return a * 2 + torch.cat([b, c], 1)[:, :1]

    class M2(nn.Module):
        def forward(self, x):
            parts = x.split(2, dim=1)  # 6 -> 3 parts of 2
            return parts[0] + parts[1] * parts[2]

    _check(M1(), (2, 6, 4, 4))
    _check(M2(), (2, 6, 4, 4))


def test_sum_stack_amax_export():
    class M(nn.Module):
        def forward(self, x):
            s = torch.sum(x, dim=2, keepdim=True)
            m = torch.amax(x, dim=[2], keepdim=True)
            return torch.stack([s, m], 0).sum(dim=0, keepdim=False)

    _check(M(), (2, 3, 5, 5))


def test_chunk_uneven_exports_actual_count():
    class M(nn.Module):
        def forward(self, x):
            a, b, c = torch.chunk(x, 4, dim=1)  # 5 -> 3 chunks
            return torch.cat([a, b, c, a[:, :1]], 1)

    _check(M(), (1, 5, 4, 4))


def test_interpolate_positional_mode():
    class M(nn.Module):
        def forward(self, x):
            return F.interpolate(x, None, 2.0, "bilinear", False)

    _check(M(), (1, 3, 5, 5), tol=2e-3)


def test_dropout2d_module_aliases():
    m = nn.Sequential(nn.Conv2d(3, 4, 1), nn.Dropout2d(0.5),
                      nn.AlphaDropout(0.3), nn.ReLU())
    _check(m, (1, 3, 6, 6))


# ------------------------------------------------------ transformer export
class _MiniViT(nn.Module):
    """timm-style ViT block stack: patch conv, cls token + pos embed
    parameters (get_attr -> pnnx.Attribute), pre-LN MHA via tuple
    outputs, transpose/select method calls."""

    def __init__(self, e=32, heads=4, depth=2, patches=16, classes=9):
        super().__init__()
        self.patch = nn.Conv2d(3, e, 8, 8)
        self.cls_token = nn.Parameter(torch.randn(1, 1, e) * 0.02)
        self.pos = nn.Parameter(torch.randn(1, patches + 1, e) * 0.02)
        self.ln1 = nn.ModuleList([nn.LayerNorm(e) for _ in range(depth)])
        self.attn = nn.ModuleList(
            [nn.MultiheadAttention(e, heads, batch_first=True)
             for _ in range(depth)])
        self.ln2 = nn.ModuleList([nn.LayerNorm(e) for _ in range(depth)])
        self.fc1 = nn.ModuleList([nn.Linear(e, 4 * e) for _ in range(depth)])
        self.fc2 = nn.ModuleList([nn.Linear(4 * e, e) for _ in range(depth)])
        self.ln_f = nn.LayerNorm(e)
        self.head = nn.Linear(e, classes)
        self.depth = depth

    def forward(self, x):
        n = x.shape[0]
        x = self.patch(x)
        x = torch.flatten(x, 2).transpose(1, 2)
        cls = self.cls_token.expand(n, 1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos
        for i in range(self.depth):
            y, _ = self.attn[i](self.ln1[i](x), self.ln1[i](x),
                                self.ln1[i](x), need_weights=False)
            x = x + y
            y = self.fc2[i](F.gelu(self.fc1[i](self.ln2[i](x))))
            x = x + y
        return self.head(self.ln_f(x).select(1, 0))


def test_export_mini_vit():
    torch.manual_seed(11)
    m = _MiniViT()
    # .expand(n, 1, -1) uses a traced size -> symbolic_trace keeps it
    # static because n comes from example shape; feed matching batch
    _check(m, (2, 3, 32, 32), tol=5e-4)


class _SDPA(nn.Module):
    def __init__(self):
        super().__init__()
        self.q = nn.Linear(16, 16)
        self.k = nn.Linear(16, 16)
        self.v = nn.Linear(16, 16)

    def forward(self, x):  # x [N, L, E]
        n, l, e = 2, 5, 16
        q = self.q(x).reshape(n, l, 4, 4).permute(0, 2, 1, 3)
        k = self.k(x).reshape(n, l, 4, 4).permute(0, 2, 1, 3)
        v = self.v(x).reshape(n, l, 4, 4).permute(0, 2, 1, 3)
        o = F.scaled_dot_product_attention(q, k, v, is_causal=True)
        return o.permute(0, 2, 1, 3).reshape(n, l, e)


def test_export_sdpa_causal():
    torch.manual_seed(12)
    _check(_SDPA(), (2, 5, 16), tol=5e-4)


class _MatmulNet(nn.Module):
    def forward(self, x):  # [N, L, E]
        g = torch.matmul(x, x.transpose(1, 2))  # gram [N, L, L]
        return torch.bmm(g, x)


def test_export_matmul_bmm():
    _check(_MatmulNet(), (2, 6, 8), tol=5e-4)


class _EmbeddingNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn.Embedding(12, 6)
        self.fc = nn.Linear(6, 3)

    def forward(self, idx):
        return self.fc(self.emb(idx))


def test_export_embedding():
    torch.manual_seed(13)
    m = _EmbeddingNet().eval()
    idx = RNG.integers(0, 12, size=(2, 7)).astype(np.int64)
    with torch.no_grad():
        want = m(torch.from_numpy(idx)).numpy()
    graph, in_name, out_name = export_torch(m, idx)
    got = Engine().load_model(None, graph=graph).run(
        {in_name: idx.astype(np.float32)})[out_name]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


class _CrossAttn(nn.Module):
    def __init__(self):
        super().__init__()
        self.attn = nn.MultiheadAttention(8, 2, batch_first=True)

    def forward(self, q, kv):
        out, _ = self.attn(q, kv, kv, need_weights=False)
        return out


def test_export_cross_attention_multi_input():
    torch.manual_seed(14)
    m = _CrossAttn().eval()
    q = RNG.standard_normal((1, 4, 8)).astype(np.float32)
    kv = RNG.standard_normal((1, 6, 8)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(q), torch.from_numpy(kv)).numpy()
    graph, in_names, out_name = export_torch(m, (q, kv))
    got = Engine().load_model(None, graph=graph).run(
        {in_names[0]: q, in_names[1]: kv})[out_name]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("norm_first", [True, False])
def test_export_transformer_encoder(norm_first):
    """nn.TransformerEncoder decomposes into MHA/Linear/LayerNorm ops
    with the right pre-/post-LN residual wiring."""
    torch.manual_seed(17)
    m = nn.Sequential(
        nn.Linear(8, 16),
        nn.TransformerEncoder(
            nn.TransformerEncoderLayer(
                16, 4, dim_feedforward=32, batch_first=True,
                norm_first=norm_first, dropout=0.0),
            num_layers=2, norm=nn.LayerNorm(16)),
        nn.Linear(16, 3),
    )
    _check(m, (2, 5, 8), tol=5e-4)


def test_export_rms_norm():
    torch.manual_seed(18)
    m = nn.Sequential(nn.Linear(6, 12), nn.RMSNorm(12), nn.Linear(12, 4))
    _check(m, (2, 7, 6), tol=5e-4)
