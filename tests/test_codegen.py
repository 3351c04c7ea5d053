"""Graph->python codegen roundtrip test (the Graph::python analog)."""
import runpy

import numpy as np

from simpleinfer_tpu import Engine
from simpleinfer_tpu.ir.codegen import export_python
from simpleinfer_tpu.zoo import build_resnet18

RNG = np.random.default_rng(83)


def test_codegen_roundtrip_executes_identically(tmp_path):
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=5, width=8)
    py = str(tmp_path / "model_gen.py")
    npz = str(tmp_path / "weights.npz")
    export_python(graph, py, npz)

    ns = runpy.run_path(py)
    rebuilt = ns["build_graph"]()
    assert len(rebuilt.ops) == len(graph.ops)

    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    a = Engine().load_model(None, graph=graph).run({in_name: x})[out_name]
    b = Engine().load_model(None, graph=rebuilt).run({in_name: x})[out_name]
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
