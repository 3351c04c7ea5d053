"""CLI tool tests (dump / detect / classify / roofline)."""
import numpy as np
import pytest

from simpleinfer_tpu.tools import main
from simpleinfer_tpu.zoo import build_resnet18, build_yolov5
from simpleinfer_tpu.zoo.imageio import imwrite

RNG = np.random.default_rng(91)


@pytest.fixture(scope="module")
def yolo_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("m")
    graph, _, _ = build_yolov5("n", batch=1, image_size=64)
    param, binf = str(d / "y.pnnx.param"), str(d / "y.pnnx.bin")
    graph.save(param, binf)
    return param, binf


def test_dump(yolo_model, capsys):
    assert main(["dump", *yolo_model]) == 0
    out = capsys.readouterr().out
    assert "nn.Conv2d" in out and "models.yolo.Detect" in out
    assert "param" in out and "attr" in out


def test_detect_cli(yolo_model, tmp_path, capsys):
    img = RNG.integers(0, 255, (80, 60, 3)).astype(np.uint8)
    p = str(tmp_path / "in.png")
    imwrite(p, img)
    rc = main(["detect", *yolo_model, p, "--size", "64",
               "--dtype", "float32", "--out", str(tmp_path)])
    assert rc == 0
    assert "detections" in capsys.readouterr().out


def test_classify_cli(tmp_path, capsys):
    graph, _, _ = build_resnet18(batch=1, image_size=64, num_classes=10,
                                 width=8)
    param, binf = str(tmp_path / "r.pnnx.param"), str(tmp_path / "r.pnnx.bin")
    graph.save(param, binf)
    img = RNG.integers(0, 255, (90, 90, 3)).astype(np.uint8)
    p = str(tmp_path / "in.png")
    imwrite(p, img)
    rc = main(["classify", param, binf, p, "--size", "64",
               "--dtype", "float32", "--topk", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("class ") == 3


def test_roofline_cli(yolo_model, capsys):
    assert main(["roofline", *yolo_model, "--batch", "4"]) == 0
    out = capsys.readouterr().out
    assert "speed-of-light" in out


def test_detect_cli_int8_static(yolo_model, tmp_path, capsys):
    """--quant int8 calibrates on the input batch, then detects."""
    img = RNG.integers(0, 255, (80, 60, 3)).astype(np.uint8)
    p = str(tmp_path / "in.png")
    imwrite(p, img)
    rc = main(["detect", *yolo_model, p, "--size", "64",
               "--dtype", "float32", "--quant", "int8"])
    assert rc == 0
    assert "detections" in capsys.readouterr().out


def test_classify_cli_int8_static(tmp_path, capsys):
    graph, _, _ = build_resnet18(batch=1, image_size=64, num_classes=10,
                                 width=8)
    param, binf = str(tmp_path / "r.pnnx.param"), str(tmp_path / "r.pnnx.bin")
    graph.save(param, binf)
    img = RNG.integers(0, 255, (90, 90, 3)).astype(np.uint8)
    p = str(tmp_path / "in.png")
    imwrite(p, img)
    rc = main(["classify", param, binf, p, "--size", "64",
               "--dtype", "float32", "--quant", "int8", "--topk", "3"])
    assert rc == 0
    assert capsys.readouterr().out.count("class ") == 3


def test_profile_cli(yolo_model, capsys, tmp_path):
    try:
        rc = main(["profile", *yolo_model, "--iters", "2", "--top", "5",
                   "--logdir", str(tmp_path / "tr")])
    except (RuntimeError, FileNotFoundError) as e:
        pytest.skip(f"profiler unavailable: {e}")
    assert rc == 0
    out = capsys.readouterr().out
    assert "ms/iter" in out and "category" in out
