"""IR layer tests: storezip round-trip, param grammar, graph load, expansion.

Mirrors the reference's parser behavior (test analog of
/root/reference/test/test_pnnx/test_pnnx_ir.cpp plus grammar edge cases
from ir.cpp:479-548).
"""
import numpy as np
import pytest

from simpleinfer_tpu.ir import (
    Attribute,
    Graph,
    Parameter,
    StoreZipReader,
    StoreZipWriter,
    expand_expression,
)


# ---------------------------------------------------------------- storezip
def test_storezip_roundtrip(tmp_path):
    path = str(tmp_path / "weights.bin")
    blobs = {
        "conv1.weight": np.random.randn(64, 3, 3, 3).astype(np.float32).tobytes(),
        "conv1.bias": np.random.randn(64).astype(np.float32).tobytes(),
        "empty.thing": b"",
    }
    with StoreZipWriter(path) as w:
        for name, data in blobs.items():
            w.write_file(name, data)

    with StoreZipReader(path) as r:
        assert set(r.namelist()) == set(blobs)
        for name, data in blobs.items():
            assert r.get_file_size(name) == len(data)
            assert r.read_file(name) == data
        assert r.get_file_size("missing") == 0


def test_storezip_is_real_zip(tmp_path):
    """Our writer must produce archives readable by the standard library."""
    import zipfile

    path = str(tmp_path / "w.bin")
    with StoreZipWriter(path) as w:
        w.write_file("a.weight", b"\x01\x02\x03\x04")
    with zipfile.ZipFile(path) as z:
        assert z.read("a.weight") == b"\x01\x02\x03\x04"
        assert z.getinfo("a.weight").compress_type == zipfile.ZIP_STORED


def test_storezip_reads_stdlib_zip(tmp_path):
    import zipfile

    path = str(tmp_path / "w2.bin")
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as z:
        z.writestr("x.weight", b"hello world")
    with StoreZipReader(path) as r:
        assert r.read_file("x.weight") == b"hello world"


# ------------------------------------------------------------ param grammar
@pytest.mark.parametrize("text,ptype,value", [
    ("None", 0, None),
    ("()", 0, None),
    ("[]", 0, None),
    ("True", 1, True),
    ("False", 1, False),
    ("3", 2, 3),
    ("-12", 2, -12),
    ("0.25", 3, 0.25),
    ("1e-05", 3, 1e-05),
    ("-3.5", 3, -3.5),
    ("zeros", 4, "zeros"),
    ("-abc", 4, "-abc"),
    ("(1,2,3)", 5, [1, 2, 3]),
    ("[4,5]", 5, [4, 5]),
    ("(2.0,2.0)", 6, [2.0, 2.0]),
    ("(a,b)", 7, ["a", "b"]),
])
def test_parameter_parse(text, ptype, value):
    p = Parameter.parse_from_string(text)
    assert p.type == ptype
    assert p.value == value


@pytest.mark.parametrize("text", [
    "None", "True", "False", "3", "-12", "0.25", "zeros",
    "(1,2,3)", "(2.0,2.0)", "(a,b)",
])
def test_parameter_encode_roundtrip(text):
    p = Parameter.parse_from_string(text)
    p2 = Parameter.parse_from_string(p.encode())
    assert p2.type == p.type and p2.value == p.value


# -------------------------------------------------------------- graph load
def _write_tiny_model(tmp_path):
    """A conv->relu model in pnnx text format with a real weight zip."""
    param = str(tmp_path / "m.pnnx.param")
    binp = str(tmp_path / "m.pnnx.bin")
    w = np.arange(2 * 3 * 1 * 1, dtype=np.float32).reshape(2, 3, 1, 1)
    b = np.array([0.5, -0.5], dtype=np.float32)
    with StoreZipWriter(binp) as z:
        z.write_file("conv0.weight", w.tobytes())
        z.write_file("conv0.bias", b.tobytes())
    lines = [
        "7767517",
        "4 4",
        "pnnx.Input input0 0 1 0 #0=(1,3,4,4)f32",
        ("nn.Conv2d conv0 1 1 0 1 bias=True dilation=(1,1) groups=1 "
         "in_channels=3 kernel_size=(1,1) out_channels=2 padding=(0,0) "
         "padding_mode=zeros stride=(1,1) @weight=(2,3,1,1)f32 "
         "@bias=(2)f32 #0=(1,3,4,4)f32 #1=(1,2,4,4)f32"),
        "nn.ReLU relu0 1 1 1 2 #1=(1,2,4,4)f32 #2=(1,2,4,4)f32",
        "pnnx.Output output0 1 0 2 #2=(1,2,4,4)f32",
    ]
    with open(param, "w") as f:
        f.write("\n".join(lines) + "\n")
    return param, binp, w, b


def test_graph_load(tmp_path):
    param, binp, w, b = _write_tiny_model(tmp_path)
    g = Graph.load(param, binp)
    assert len(g.ops) == 4
    conv = g.ops[1]
    assert conv.type == "nn.Conv2d"
    assert conv.params["in_channels"].i == 3
    assert conv.params["bias"].b is True
    assert conv.params["kernel_size"].ai == [1, 1]
    assert conv.params["padding_mode"].s == "zeros"
    np.testing.assert_array_equal(conv.attrs["weight"].array(), w)
    np.testing.assert_array_equal(conv.attrs["bias"].array(), b)
    # operand graph structure
    opd1 = g.get_operand("1")
    assert opd1.producer is conv
    assert opd1.consumers == [g.ops[2]]
    assert opd1.shape == [1, 2, 4, 4]
    assert opd1.type == 1  # f32
    # io discovery
    assert [op.name for op in g.input_ops()] == ["input0"]
    assert [op.name for op in g.output_ops()] == ["output0"]


def test_graph_shape_wildcard(tmp_path):
    param = str(tmp_path / "w.pnnx.param")
    with open(param, "w") as f:
        f.write("7767517\n1 1\npnnx.Input in0 0 1 0 #0=(?,3,224,224)f32\n")
    g = Graph.load(param)
    assert g.get_operand("0").shape == [-1, 3, 224, 224]


def test_graph_save_roundtrip(tmp_path):
    param, binp, w, b = _write_tiny_model(tmp_path)
    g = Graph.load(param, binp)
    param2 = str(tmp_path / "rt.pnnx.param")
    binp2 = str(tmp_path / "rt.pnnx.bin")
    g.save(param2, binp2)
    g2 = Graph.load(param2, binp2)
    assert len(g2.ops) == len(g.ops)
    conv = g2.ops[1]
    assert conv.params["kernel_size"].ai == [1, 1]
    np.testing.assert_array_equal(conv.attrs["weight"].array(), w)
    assert g2.get_operand("1").shape == [1, 2, 4, 4]


# ------------------------------------------------------- expression expand
def _expr_graph(expr, n_inputs=2, shape=(1, 2, 4, 4)):
    g = Graph()
    in_opds = []
    for i in range(n_inputs):
        op_in = g.new_operator("pnnx.Input", f"in{i}")
        r = g.new_operand(str(i))
        r.producer = op_in
        r.shape = list(shape)
        r.type = 1
        op_in.outputs.append(r)
        in_opds.append(r)
    op_expr = g.new_operator("pnnx.Expression", "expr0")
    op_expr.params["expr"] = Parameter.from_value(expr)
    out = g.new_operand("out")
    out.producer = op_expr
    out.shape = list(shape)
    out.type = 1
    for r in in_opds:
        r.consumers.append(op_expr)
        op_expr.inputs.append(r)
    op_expr.outputs.append(out)
    op_out = g.new_operator("pnnx.Output", "output0")
    out.consumers.append(op_out)
    op_out.inputs.append(out)
    return g


def test_expand_add():
    g = _expr_graph("add(@0,@1)")
    expand_expression(g)
    types = [op.type for op in g.ops]
    assert "pnnx.Expression" not in types
    binops = [op for op in g.ops if op.type == "BinaryOp"]
    assert len(binops) == 1
    assert binops[0].params["0"].i == 0
    assert len(binops[0].inputs) == 2
    # output rewired to the Output op
    out_op = g.output_ops()[0]
    assert out_op.inputs[0].producer is binops[0]


def test_expand_nested_with_scalar():
    g = _expr_graph("add(@0,mul(@1,2.000000e+00))")
    expand_expression(g)
    binops = [op for op in g.ops if op.type == "BinaryOp"]
    assert len(binops) == 2
    mul = next(op for op in binops if op.params["0"].i == 2)
    assert mul.params["1"].i == 1
    assert mul.params["2"].f == 2.0
    assert len(mul.inputs) == 1
    add = next(op for op in binops if op.params["0"].i == 0)
    assert len(add.inputs) == 2


def test_expand_pow2_becomes_square():
    g = _expr_graph("pow(@0,2.0)", n_inputs=1)
    expand_expression(g)
    unary = [op for op in g.ops if op.type == "UnaryOp"]
    assert len(unary) == 1 and unary[0].params["0"].i == 4  # square


def test_expand_scalar_first_sub():
    g = _expr_graph("sub(1.0,@0)", n_inputs=1)
    expand_expression(g)
    binops = [op for op in g.ops if op.type == "BinaryOp"]
    assert len(binops) == 1
    assert binops[0].params["0"].i == 7  # rsub
    assert binops[0].params["2"].f == 1.0


def test_expand_unary():
    g = _expr_graph("sqrt(exp(@0))", n_inputs=1)
    expand_expression(g)
    unary = [op for op in g.ops if op.type == "UnaryOp"]
    assert [op.params["0"].i for op in unary] == [7, 5]  # exp inner, sqrt outer


def test_expand_unsupported_left_alone():
    g = _expr_graph("add(@0,size(@1,0))")
    expand_expression(g)
    assert any(op.type == "pnnx.Expression" for op in g.ops)


def test_attribute_from_array():
    a = Attribute.from_array(np.ones((3, 2), dtype=np.float32))
    assert a.type == 1 and a.shape == [3, 2]
    assert a.nbytes == 24
