"""Malformed-input robustness: parser, zip, lowering, engine errors.

The reference's failure story is Status codes + early returns
(include/types.h CHECK macros); here every malformed input must raise a
clear Python exception, never crash or silently mis-parse.
"""
import numpy as np
import pytest

from simpleinfer_tpu import Engine, build_program
from simpleinfer_tpu.executor import GraphError
from simpleinfer_tpu.ir.graph import Graph
from simpleinfer_tpu.ir.storezip import StoreZipReader, StoreZipWriter
from simpleinfer_tpu.ops import UnsupportedOpError


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        Graph.parse("123\n1 1\npnnx.Input in0 0 1 a\n")


def test_empty_param():
    with pytest.raises(ValueError):
        Graph.parse("")


def test_truncated_operator_line():
    # declares 2 ops but provides 1
    with pytest.raises(Exception):
        Graph.parse("7767517\n2 2\npnnx.Input in0 0 1 a\n")


def test_unknown_op_type_raises_at_lowering(tmp_path):
    text = ("7767517\n3 2\n"
            "pnnx.Input in0 0 1 a #a=(1,3,4,4)f32\n"
            "nn.Totally_Made_Up op0 1 1 a b\n"
            "pnnx.Output out0 1 0 b\n")
    g = Graph.parse(text)
    with pytest.raises(UnsupportedOpError, match="Totally_Made_Up"):
        build_program(g)


def test_attribute_size_mismatch(tmp_path):
    param = str(tmp_path / "m.pnnx.param")
    binf = str(tmp_path / "m.pnnx.bin")
    with StoreZipWriter(binf) as w:
        w.write_file("op0.weight", b"\x00" * 8)  # 2 floats, claims 4
    with open(param, "w") as f:
        f.write("7767517\n1 1\n"
                "nn.X op0 0 1 b @weight=(4)f32\n")
    with pytest.raises(ValueError, match="expected"):
        Graph.load(param, binf)


def test_missing_weight_in_zip_is_tolerated(tmp_path):
    """Like the reference (load_attribute skips absent files), a missing
    zip entry leaves the attribute data-less; lowering then fails with a
    clear error rather than the parser crashing."""
    param = str(tmp_path / "m.pnnx.param")
    binf = str(tmp_path / "m.pnnx.bin")
    with StoreZipWriter(binf) as w:
        w.write_file("unrelated", b"x")
    with open(param, "w") as f:
        f.write("7767517\n1 1\n"
                "nn.X op0 0 1 b @weight=(4)f32\n")
    g = Graph.load(param, binf)
    assert g.ops[0].attrs["weight"].data is None


def test_cycle_detection():
    g = Graph()
    op1 = g.new_operator("nn.ReLU", "r1")
    op2 = g.new_operator("nn.ReLU", "r2")
    a, b = g.new_operand("a"), g.new_operand("b")
    # r1: b -> a ; r2: a -> b  (cycle)
    op1.inputs, op1.outputs = [b], [a]
    a.producer, b.consumers = op1, [op1]
    op2.inputs, op2.outputs = [a], [b]
    b.producer, a.consumers = op2, [op2]
    with pytest.raises(GraphError, match="cycle"):
        build_program(g)


def test_graph_without_inputs():
    with pytest.raises(GraphError, match="no inputs"):
        build_program(Graph.parse("7767517\n0 0\n"))


def test_zip_with_compressed_entry_rejected(tmp_path):
    import zipfile

    path = str(tmp_path / "c.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("w", b"payload" * 100)
    with pytest.raises(ValueError, match="store"):
        StoreZipReader(path)


def test_engine_consumes_before_produced():
    """Operand consumed but never produced and not a graph input."""
    text = ("7767517\n2 2\n"
            "pnnx.Input in0 0 1 a #a=(1,4)f32\n"
            "nn.ReLU r0 1 1 ghost b\n")
    g = Graph.parse(text)
    with pytest.raises(Exception):
        eng = Engine().load_model(None, graph=g)
        eng.run({"a": np.zeros((1, 4), np.float32)})
