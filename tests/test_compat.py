"""Compat-layer test: the reference's python e2e script, verbatim shape.

Mirrors /root/reference/test/test_python/test_model.py against a
zoo-built yolov5n (the reference's fixture yolov5n_small is the same
architecture at 320x320).
"""
import numpy as np

import simpleinfer as infer
from simpleinfer_tpu.zoo import build_yolov5


def test_reference_python_script_flow(tmp_path):
    infer.InitializeContext()

    graph, _, _ = build_yolov5("n", batch=4, image_size=64)
    param = str(tmp_path / "yolov5n_small.pnnx.param")
    binf = str(tmp_path / "yolov5n_small.pnnx.bin")
    graph.save(param, binf)

    engine = infer.Engine()
    rc = engine.LoadModel(param, binf)
    assert rc == infer.Status.Success

    input_names = engine.InputNames()
    output_names = engine.OutputNames()
    assert input_names == ["0"]
    assert len(output_names) == 1

    input_shape = [4, 64, 64, 3]  # NHWC, like the reference script
    input_np = np.ones(input_shape, dtype=np.float32) * 42.0
    input_tensor = infer.Tensor(infer.DataType.Float32, input_shape)
    assert input_tensor.SetTensorDim4(input_np) == infer.Status.Success

    assert engine.Input(input_names[0], input_tensor) == infer.Status.Success
    assert engine.Forward() == infer.Status.Success

    output_tensor = infer.Tensor()
    assert engine.Extract(output_names[0], output_tensor) == \
        infer.Status.Success
    out = output_tensor.GetTensorDim4()
    assert out.dtype == np.float32
    assert out.shape == (1, 4, (64 + 16 + 4) * 3, 85)
    assert np.isfinite(out).all()


def test_compat_error_paths(tmp_path):
    engine = infer.Engine()
    assert engine.LoadModel("/nope.param", "/nope.bin") != \
        infer.Status.Success
    assert engine.InputNames() == []
    assert engine.Forward() == infer.Status.Fail

    t = infer.Tensor(infer.DataType.Float32, [1, 2, 2, 3])
    assert t.SetTensorDim4(np.zeros((2, 2))) == infer.Status.ErrorShape
    assert t.SetTensorDim4(np.zeros((9, 2, 2, 3))) == infer.Status.ErrorShape
    assert t.SetTensorDim4(np.zeros((1, 2, 2, 3))) == infer.Status.Success
    assert engine.Release() == infer.Status.Success
