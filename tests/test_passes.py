"""Tests for load-time graph fusions (ir/passes.py)."""
import numpy as np

from simpleinfer_tpu import Engine, EngineConfig
from simpleinfer_tpu.ir.passes import (
    FUSED_ACT_PARAM,
    fuse_conv_activation,
    fuse_conv_bn,
    run_inference_fusions,
)
from simpleinfer_tpu.zoo.builders import GraphBuilder
from torch_ref import run_graph_torch

RNG = np.random.default_rng(23)


def _conv_bn_act_graph(act="relu"):
    b = GraphBuilder(seed=1)
    x = b.input([1, 3, 16, 16], name="0")
    x = b.conv(x, 8, 3, 1, 1, bias=False)
    x = b.bn(x)
    x = getattr(b, act)(x)
    b.output(x)
    return b.build(), x


def test_fuse_conv_bn_counts_and_math():
    graph, out_name = _conv_bn_act_graph()
    x = RNG.standard_normal((1, 3, 16, 16)).astype(np.float32)
    want = run_graph_torch(graph, {"0": x})[out_name]

    n_bn = fuse_conv_bn(graph)
    assert n_bn == 1
    types = [op.type for op in graph.ops]
    assert "nn.BatchNorm2d" not in types
    # conv gained a bias
    conv = next(op for op in graph.ops if op.type == "nn.Conv2d")
    assert conv.params["bias"].b and "bias" in conv.attrs

    n_act = fuse_conv_activation(graph)
    assert n_act == 1
    assert conv.params[FUSED_ACT_PARAM].s == "relu"
    assert not any(op.type == "nn.ReLU" for op in graph.ops)

    # fused graph computes the same function
    eng = Engine(EngineConfig(fuse=False)).load_model(None, graph=graph)
    got = eng.run({"0": np.transpose(x, (0, 2, 3, 1))})[out_name]
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                               atol=1e-4, rtol=1e-4)


def test_no_fuse_when_intermediate_has_two_consumers():
    b = GraphBuilder(seed=2)
    x = b.input([1, 3, 8, 8], name="0")
    c = b.conv(x, 4, 3, 1, 1)
    r = b.relu(c)
    s = b.sigmoid(c)  # second consumer of the conv output
    b.output(b.add(r, s))
    g = b.build()
    stats = run_inference_fusions(g)
    assert stats["conv_act"] == 0


def test_no_fuse_into_graph_output():
    b = GraphBuilder(seed=3)
    x = b.input([1, 3, 8, 8], name="0")
    c = b.conv(x, 4, 3, 1, 1)
    b.output(c, b.relu(c))  # conv output IS a graph output
    g = b.build()
    stats = run_inference_fusions(g)
    assert stats["conv_act"] == 0


def test_fusion_on_off_same_results():
    from simpleinfer_tpu.zoo import build_resnet18

    g1, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                           num_classes=5, width=8)
    g2, _, _ = build_resnet18(batch=1, image_size=32, num_classes=5, width=8)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    fused = Engine(EngineConfig(fuse=True)).load_model(None, graph=g1)
    plain = Engine(EngineConfig(fuse=False)).load_model(None, graph=g2)
    a = fused.run({in_name: x})[out_name]
    c = plain.run({in_name: x})[out_name]
    scale = max(1.0, np.abs(c).max())
    np.testing.assert_allclose(a, c, atol=1e-4 * scale, rtol=1e-4)
    # and the fused program really has fewer ops
    assert len(fused.program.impls) < len(plain.program.impls)


def test_fused_int8_accuracy_vs_unfused_fp32():
    """BN fold + int8w: error still bounded like plain int8w (the
    'quantize after folding' requirement in ir/passes.py)."""
    from simpleinfer_tpu.zoo import build_resnet18

    g1, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                           num_classes=5, width=16)
    g2, _, _ = build_resnet18(batch=1, image_size=32, num_classes=5,
                              width=16)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    fp = Engine(EngineConfig()).load_model(None, graph=g1).run(
        {in_name: x})[out_name]
    q = Engine(EngineConfig(quant="int8w")).load_model(
        None, graph=g2).run({in_name: x})[out_name]
    assert np.abs(q - fp).max() < 0.05 * max(1.0, np.abs(fp).max())


def test_fuse_extended_activations():
    """relu6 (mobilenet-v2), mish, tanh, and parameterized leaky/elu/
    gelu fuse into the conv epilogue with identical outputs."""
    import numpy as np
    import torch
    import torch.nn as nn

    from simpleinfer_tpu import Engine
    from simpleinfer_tpu.frontends import export_torch
    from simpleinfer_tpu.ir.passes import FUSED_ACT_PARAM, fuse_conv_activation

    for act, tol in ((nn.ReLU6(), 1e-5), (nn.LeakyReLU(0.2), 1e-5),
                     (nn.ELU(0.7), 1e-5), (nn.GELU(), 2e-5),
                     (nn.GELU(approximate="tanh"), 2e-5),
                     (nn.Mish(), 2e-5), (nn.Tanh(), 1e-5)):
        m = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), act).eval()
        x = np.random.default_rng(1).standard_normal(
            (1, 3, 8, 8)).astype(np.float32)
        g, in_name, out_name = export_torch(m, x)
        n = fuse_conv_activation(g)
        assert n == 1, type(act).__name__
        conv = next(op for op in g.ops if op.type == "nn.Conv2d")
        assert FUSED_ACT_PARAM in conv.params
        eng = Engine().load_model(None, graph=g)
        got = eng.run({in_name: x.transpose(0, 2, 3, 1)})[out_name]
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=tol, rtol=1e-4,
                                   err_msg=type(act).__name__)


# ---- fused C3 blocks (round-5 cross-conv VMEM fusion) ----------------------

def _c3_graph(c=128, hid=64, n=2, img=16, shortcut=True, batch=1,
              seed=3):
    """input -> pre-conv(3->c) -> C3(c, hid*2, n) -> graph output."""
    b = GraphBuilder(seed)
    x = b.input([batch, 3, img, img], name="0")
    x = b.silu(b.conv(x, c, 1))
    y1 = b.silu(b.conv(x, hid, 1))
    for _ in range(n):
        t = b.silu(b.conv(y1, hid, 1))
        t = b.silu(b.conv(t, hid, 3))
        y1 = b.add(t, y1) if shortcut else t
    y2 = b.silu(b.conv(x, hid, 1))
    out = b.silu(b.conv(b.cat([y1, y2], 1), 2 * hid, 1))
    b.output(out)
    return b.build(), "0", out


def test_fuse_c3_blocks_structure_and_parity():
    """The C3 pattern collapses to ONE si.FusedC3 op; outputs match the
    unfused engine bit-for-bit-ish (same fp32 convs, different op
    grouping) for both shortcut forms."""
    for shortcut in (True, False):
        graph, in_name, out_name = _c3_graph(shortcut=shortcut)
        e1 = Engine(EngineConfig(c3_fusion=False)).load_model(
            None, graph=graph)
        graph2, _, _ = _c3_graph(shortcut=shortcut)
        e2 = Engine(EngineConfig(c3_fusion=True)).load_model(
            None, graph=graph2)
        types = [i.type for i in e2.program.impls]
        assert types.count("si.FusedC3") == 1, types
        assert "torch.cat" not in types
        fused = next(i for i in e2.program.impls
                     if i.type == "si.FusedC3")
        assert fused.weights["btl_a_w"].shape == (2, 64, 64)
        x = np.random.default_rng(0).standard_normal(
            (1, 16, 16, 3)).astype(np.float32)
        a = e1.run({in_name: x})[out_name]
        b_ = e2.run({in_name: x})[out_name]
        np.testing.assert_allclose(a, b_, atol=2e-4, rtol=2e-4)


def test_fuse_c3_blocks_respects_gates():
    """Narrow blocks (hid < 64 — yolov5n/s first C3) and blocks whose
    intermediates escape stay unfused."""
    from simpleinfer_tpu.ir.expression import expand_expression
    from simpleinfer_tpu.ir.passes import (fuse_c3_blocks,
                                           fuse_conv_activation)

    graph, _, _ = _c3_graph(c=64, hid=32)
    expand_expression(graph)
    fuse_conv_activation(graph)
    assert fuse_c3_blocks(graph) == 0

    # external consumer of an internal operand blocks the fusion
    b = GraphBuilder(7)
    x = b.input([1, 3, 8, 8], name="0")
    x = b.silu(b.conv(x, 128, 1))
    y1 = b.silu(b.conv(x, 64, 1))
    t = b.silu(b.conv(y1, 64, 1))
    t = b.silu(b.conv(t, 64, 3))
    y1b = b.add(t, y1)
    y2 = b.silu(b.conv(x, 64, 1))
    out = b.silu(b.conv(b.cat([y1b, y2], 1), 128, 1))
    b.output(out)
    b.output(y2)            # y2 escapes the block
    graph = b.build()
    expand_expression(graph)
    fuse_conv_activation(graph)
    assert fuse_c3_blocks(graph) == 0


def test_fused_c3_yolov5l_whole_model_parity():
    """All 8 yolov5l C3 blocks fuse; whole-model outputs match the
    unfused engine (fp32 CPU)."""
    from simpleinfer_tpu.zoo import build_yolov5

    graph, in_name, out_name = build_yolov5("l", batch=1,
                                            image_size=64, seed=0)
    e1 = Engine(EngineConfig(c3_fusion=False)).load_model(None,
                                                          graph=graph)
    graph2, _, _ = build_yolov5("l", batch=1, image_size=64, seed=0)
    e2 = Engine(EngineConfig(c3_fusion=True)).load_model(None,
                                                         graph=graph2)
    assert [i.type for i in e2.program.impls].count("si.FusedC3") == 8
    x = (np.random.default_rng(0).standard_normal((1, 64, 64, 3))
         .astype(np.float32) / 4)
    a = e1.run({in_name: x})[out_name]
    b_ = e2.run({in_name: x})[out_name]
    np.testing.assert_allclose(a, b_, atol=2e-3, rtol=2e-3)
