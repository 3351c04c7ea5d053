"""End-to-end Engine tests: zoo models vs the independent torch oracle.

The analog of the reference's integration binaries (test-engine,
test-yolo2, test-classify — SURVEY.md §4.2), upgraded from "doesn't
crash / eyeball the printout" to actual numeric parity against a second
implementation (tests/torch_ref.py, torch CPU NCHW).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpleinfer_tpu import Engine, EngineConfig, EngineStateError, MeshConfig
from simpleinfer_tpu.zoo import (
    build_convnext,
    build_mobilenet_like,
    build_mobilenet_v3_like,
    build_resnet18,
    build_resnet50,
    build_vit,
    build_yolov5,
)
from torch_ref import run_graph_torch

RNG = np.random.default_rng(7)


def _parity(build_fn, feed_shape_nchw, tol=2e-3, cfg=None, **kwargs):
    graph, in_name, out_name = build_fn(**kwargs)
    x_nchw = RNG.standard_normal(feed_shape_nchw).astype(np.float32)
    want = run_graph_torch(graph, {in_name: x_nchw})  # before expansion
    eng = Engine(cfg).load_model(None, graph=graph)
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    got = eng.run({in_name: x_nhwc})
    assert eng.output_names == [out_name]
    g, w = got[out_name], want[out_name]
    if g.ndim == 4:
        w = np.transpose(w, (0, 2, 3, 1))
    assert g.shape == w.shape
    scale = max(1.0, float(np.abs(w).max()))
    np.testing.assert_allclose(g, w, atol=tol * scale, rtol=1e-3)
    return eng, got


def test_resnet18_parity():
    _parity(build_resnet18, (2, 3, 64, 64), batch=2, image_size=64,
            num_classes=17, width=16)


def test_mobilenet_parity():
    _parity(build_mobilenet_like, (1, 3, 64, 64), batch=1, image_size=64,
            num_classes=11, width_mult=0.5)


def test_resnet50_parity():
    _parity(build_resnet50, (1, 3, 64, 64), batch=1, image_size=64,
            num_classes=9, width=8)


def test_mobilenet_v3_se_parity():
    """Squeeze-excite blocks: broadcast-mul Expression + hardsigmoid."""
    _parity(build_mobilenet_v3_like, (1, 3, 64, 64), batch=1,
            image_size=64, num_classes=13, width_mult=0.5)


def test_convnext_parity():
    """ConvNeXt atto: depthwise 7x7 + channels-last LayerNorm/Linear/
    GELU blocks (permute round-trips, rank-4 Linear)."""
    _parity(build_convnext, (1, 3, 64, 64), variant="atto", batch=1,
            image_size=64, num_classes=12)


def test_vit_parity():
    """ViT: patch-embed conv -> token reshape/transpose -> cls-token
    cat + pos-embed add -> pre-LN MultiheadAttention/MLP blocks ->
    cls-token select head. End-to-end vs the torch oracle."""
    _parity(build_vit, (2, 3, 32, 32), variant="tiny", batch=2,
            image_size=32, patch_size=8, num_classes=19, depth=2,
            embed_dim=48, num_heads=4)


def test_vit_int8w_bf16_runs_close():
    """Quantized (weight-only int8) + bf16 ViT: the MHA lowering must
    resolve QuantizedTensor projections; outputs stay close to f32."""
    kw = dict(variant="tiny", batch=1, image_size=32, patch_size=8,
              num_classes=11, depth=2, embed_dim=48, num_heads=4)
    graph, in_name, out_name = build_vit(**kw)
    ref_graph, _, _ = build_vit(**kw)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    want = Engine().load_model(None, graph=ref_graph).run({in_name: x})
    cfg = EngineConfig(compute_dtype="bfloat16", quant="int8w")
    got = Engine(cfg).load_model(None, graph=graph).run({in_name: x})
    g, w = got[out_name].astype(np.float64), want[out_name].astype(np.float64)
    cos = float((g * w).sum() / (np.linalg.norm(g) * np.linalg.norm(w)))
    assert g.shape == w.shape and cos > 0.98, cos


def test_bert_parity():
    """BERT-style text encoder: integer token-id input through
    nn.Embedding, post-LN MultiheadAttention stack, [CLS] pooler."""
    from simpleinfer_tpu.zoo import build_bert

    kw = dict(variant="tiny", batch=2, seq_len=16, vocab_size=50,
              num_classes=3, depth=2, hidden=32, num_heads=4)
    graph, in_name, out_name = build_bert(**kw)
    ids = RNG.integers(0, 50, size=(2, 16)).astype(np.float32)
    want = run_graph_torch(graph, {in_name: ids})[out_name]
    got = Engine().load_model(None, graph=graph).run({in_name: ids})[out_name]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_yolov5n_parity():
    eng, got = _parity(build_yolov5, (1, 3, 64, 64), variant="n", batch=1,
                       image_size=64)
    out = got[eng.output_names[0]]
    assert out.shape == (1, (64 + 16 + 4) * 3, 85)


def test_yolov5_file_roundtrip(tmp_path):
    """save -> .pnnx.param/.bin -> load_model, like a real pnnx export."""
    graph, in_name, _ = build_yolov5("n", batch=1, image_size=32)
    x = RNG.standard_normal((1, 3, 32, 32)).astype(np.float32)
    want = run_graph_torch(graph, {in_name: x})

    graph2, _, _ = build_yolov5("n", batch=1, image_size=32)
    param, binf = str(tmp_path / "y.pnnx.param"), str(tmp_path / "y.pnnx.bin")
    graph2.save(param, binf)
    eng = Engine().load_model(param, binf)
    got = eng.run({in_name: np.transpose(x, (0, 2, 3, 1))})
    (wname,) = want.keys()
    (gname,) = got.keys()
    np.testing.assert_allclose(got[gname], want[wname], atol=2e-3, rtol=1e-3)


# ------------------------------------------------------------- API surface
def test_engine_api_errors():
    eng = Engine()
    with pytest.raises(Exception):
        eng.forward()
    graph, in_name, _ = build_resnet18(batch=1, image_size=32,
                                       num_classes=4, width=8)
    eng.load_model(None, graph=graph)
    with pytest.raises(KeyError):
        eng.input("nope", np.zeros((1, 32, 32, 3), np.float32))
    with pytest.raises(Exception):
        eng.forward()  # input not staged
    eng.input(in_name, np.zeros((1, 32, 32, 3), np.float32))
    eng.forward()
    with pytest.raises(KeyError):
        eng.extract("nope")
    out = eng.extract(eng.output_names[0])
    assert out.shape == (1, 4)
    eng.release()
    assert not eng.loaded


def test_engine_reload_is_idempotent():
    g1, in_name, _ = build_resnet18(batch=1, image_size=32, num_classes=4,
                                    width=8)
    g2, _, _ = build_resnet18(batch=1, image_size=32, num_classes=6, width=8)
    eng = Engine().load_model(None, graph=g1)
    eng.load_model(None, graph=g2)
    out = eng.run({in_name: np.zeros((1, 32, 32, 3), np.float32)})
    assert next(iter(out.values())).shape == (1, 6)


def test_nchw_io_layout():
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=4, width=8)
    want = run_graph_torch(graph, {
        in_name: np.ones((1, 3, 32, 32), np.float32)})
    cfg = EngineConfig(io_layout="nchw")
    eng = Engine(cfg).load_model(None, graph=graph)
    got = eng.run({in_name: np.ones((1, 3, 32, 32), np.float32)})
    np.testing.assert_allclose(got[out_name], want[out_name], atol=1e-2,
                               rtol=1e-3)


def test_engine_warmup():
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=4, width=8)
    eng = Engine().load_model(None, graph=graph)
    eng.warmup([1, 2, 4])  # compiles three executables; staging untouched
    with pytest.raises(EngineStateError):
        eng.forward()  # warmup must not leave staged inputs behind
    x = RNG.standard_normal((2, 32, 32, 3)).astype(np.float32)
    out = eng.run({in_name: x})
    assert out[out_name].shape == (2, 4)


def test_multi_input_multi_output_graph():
    """Two graph inputs, two graph outputs (the engine's I/O discovery
    must handle arbitrary arity, engine_impl.cpp:196-211 analog)."""
    from simpleinfer_tpu.zoo.builders import GraphBuilder

    b = GraphBuilder(seed=5)
    a = b.input([1, 3, 8, 8], name="a")
    c = b.input([1, 3, 8, 8], name="c")
    s = b.add(a, c)
    r1 = b.relu(s)
    r2 = b.sigmoid(s)
    b.output(r1, r2)
    eng = Engine().load_model(None, graph=b.build())
    assert sorted(eng.input_names) == ["a", "c"]
    assert len(eng.output_names) == 2
    xa = RNG.standard_normal((1, 8, 8, 3)).astype(np.float32)
    xc = RNG.standard_normal((1, 8, 8, 3)).astype(np.float32)
    out = eng.run({"a": xa, "c": xc})
    np.testing.assert_allclose(out[r1], np.maximum(xa + xc, 0), atol=1e-6)
    np.testing.assert_allclose(out[r2], 1 / (1 + np.exp(-(xa + xc))),
                               atol=1e-5)


def test_uint8_input_scaled_on_device():
    """uint8 inputs ship raw and get scaled by u8_scale on-device."""
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=4, width=8)
    ref, _, _ = build_resnet18(batch=1, image_size=32, num_classes=4,
                               width=8)
    u8 = RNG.integers(0, 255, (1, 32, 32, 3)).astype(np.uint8)
    want = Engine().load_model(None, graph=ref).run(
        {in_name: u8.astype(np.float32) / 255.0})[out_name]
    got = Engine().load_model(None, graph=graph).run({in_name: u8})[out_name]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_donate_inputs_mode():
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=4, width=8)
    ref, _, _ = build_resnet18(batch=1, image_size=32, num_classes=4,
                               width=8)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    want = Engine().load_model(None, graph=ref).run({in_name: x})[out_name]
    eng = Engine(EngineConfig(donate_inputs=True)).load_model(
        None, graph=graph)
    got = eng.run({in_name: x})[out_name]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # staged buffer was consumed: forward() without input() must fail
    with pytest.raises(EngineStateError):
        eng.forward()
    # re-staging works
    got2 = eng.run({in_name: x})[out_name]
    np.testing.assert_allclose(got2, want, atol=1e-4, rtol=1e-4)


def test_batch_is_the_only_rejit_axis():
    graph, in_name, _ = build_resnet18(batch=1, image_size=32,
                                       num_classes=4, width=8)
    eng = Engine().load_model(None, graph=graph)
    for bs in (1, 3):
        out = eng.run({in_name: np.zeros((bs, 32, 32, 3), np.float32)})
        assert next(iter(out.values())).shape == (bs, 4)


def test_bf16_compute_mode():
    """Production dtype: weights cast to bf16 at load, loose parity."""
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=6, width=16)
    ref, _, _ = build_resnet18(batch=1, image_size=32, num_classes=6,
                               width=16)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    fp = Engine().load_model(None, graph=ref).run({in_name: x})[out_name]
    bf = Engine(EngineConfig(compute_dtype="bfloat16")).load_model(
        None, graph=graph).run({in_name: x})[out_name]
    scale = max(1.0, np.abs(fp).max())
    assert np.abs(bf.astype(np.float32) - fp).max() < 0.08 * scale
    assert np.argmax(bf) == np.argmax(fp)


def test_bf16_yolo_grids_stay_fp32():
    """YOLO decode constants must not be quantized to bf16 (box drift)."""
    graph, in_name, out_name = build_yolov5("n", batch=1, image_size=64)
    eng = Engine(EngineConfig(compute_dtype="bfloat16")).load_model(
        None, graph=graph)
    det = next(i for i in eng.program.impls
               if i.type == "models.yolo.Detect")
    placed = eng._device_weights[det.name]
    assert placed["gridc0"].dtype == np.float32
    assert placed["anchorc2"].dtype == np.float32
    assert placed["w0"].dtype == jnp.bfloat16


# ------------------------------------------------------------ quantization
def test_int8_weight_only_close_to_fp32():
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=8, width=16)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    fp = Engine().load_model(None, graph=graph).run({in_name: x})[out_name]

    graph2, _, _ = build_resnet18(batch=1, image_size=32, num_classes=8,
                                  width=16)
    q = Engine(EngineConfig(quant="int8w")).load_model(
        None, graph=graph2).run({in_name: x})[out_name]
    # int8 weight-only: small relative error, identical argmax ranking
    scale = float(np.abs(fp).max())
    assert np.abs(q - fp).max() < 0.05 * scale
    assert np.argmax(q) == np.argmax(fp)


# --------------------------------------------------------------- sharding
def test_data_parallel_mesh_cpu():
    """Batch-sharded DP over the 8-device simulated mesh (SURVEY.md §4.4)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    graph, in_name, out_name = build_resnet18(batch=8, image_size=32,
                                              num_classes=4, width=8)
    ref_graph, _, _ = build_resnet18(batch=8, image_size=32, num_classes=4,
                                     width=8)
    x = RNG.standard_normal((8, 32, 32, 3)).astype(np.float32)
    want = Engine().load_model(None, graph=ref_graph).run({in_name: x})
    cfg = EngineConfig(mesh=MeshConfig(data=8, model=1))
    eng = Engine(cfg).load_model(None, graph=graph)
    got = eng.run({in_name: x})
    np.testing.assert_allclose(got[out_name], want[out_name], atol=1e-4,
                               rtol=1e-4)


def test_tensor_parallel_mesh_cpu():
    """Channel-sharded TP (model axis) matches single-device output."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    graph, in_name, out_name = build_resnet18(batch=2, image_size=32,
                                              num_classes=4, width=8)
    ref_graph, _, _ = build_resnet18(batch=2, image_size=32, num_classes=4,
                                     width=8)
    x = RNG.standard_normal((2, 32, 32, 3)).astype(np.float32)
    want = Engine().load_model(None, graph=ref_graph).run({in_name: x})
    cfg = EngineConfig(mesh=MeshConfig(data=2, model=4))
    eng = Engine(cfg).load_model(None, graph=graph)
    got = eng.run({in_name: x})
    np.testing.assert_allclose(got[out_name], want[out_name], atol=1e-4,
                               rtol=1e-4)


def test_vit_tensor_parallel_mesh_cpu():
    """ViT under a data x model mesh: head-sharded q/k/v projections
    (column-parallel) + row-parallel out_proj must match the
    single-device output — the Megatron attention-sharding pattern
    expressed declaratively via GSPMD."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    kw = dict(variant="tiny", batch=2, image_size=32, patch_size=8,
              num_classes=7, depth=2, embed_dim=32, num_heads=4)
    graph, in_name, out_name = build_vit(**kw)
    ref_graph, _, _ = build_vit(**kw)
    x = RNG.standard_normal((2, 32, 32, 3)).astype(np.float32)
    want = Engine().load_model(None, graph=ref_graph).run({in_name: x})
    cfg = EngineConfig(mesh=MeshConfig(data=2, model=4))
    eng = Engine(cfg).load_model(None, graph=graph)
    got = eng.run({in_name: x})
    np.testing.assert_allclose(got[out_name], want[out_name], atol=1e-4,
                               rtol=1e-4)


def test_spatial_parallel_mesh_cpu():
    """Height-sharded activations (the CNN sequence-parallel analog):
    GSPMD's conv halo exchange must reproduce the single-device output
    exactly — including a batch-1 model that DP alone cannot shard."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=4, width=8)
    ref_graph, _, _ = build_resnet18(batch=1, image_size=32, num_classes=4,
                                     width=8)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    want = Engine().load_model(None, graph=ref_graph).run({in_name: x})
    cfg = EngineConfig(mesh=MeshConfig(data=1, spatial=4, model=2))
    eng = Engine(cfg).load_model(None, graph=graph)
    got = eng.run({in_name: x})
    np.testing.assert_allclose(got[out_name], want[out_name], atol=1e-4,
                               rtol=1e-4)


def test_spatial_parallel_detect_model_cpu():
    """data x spatial mesh on a detect topology (strided convs, pools,
    upsample, concat head) — halo exchanges across every stage."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    from simpleinfer_tpu.zoo import build_yolov5

    graph, in_name, out_name = build_yolov5("n", batch=2, image_size=64)
    ref_graph, _, _ = build_yolov5("n", batch=2, image_size=64)
    x = RNG.standard_normal((2, 64, 64, 3)).astype(np.float32)
    want = Engine().load_model(None, graph=ref_graph).run({in_name: x})
    cfg = EngineConfig(mesh=MeshConfig(data=2, spatial=2, model=2))
    eng = Engine(cfg).load_model(None, graph=graph)
    got = eng.run({in_name: x})
    np.testing.assert_allclose(got[out_name], want[out_name], atol=2e-4,
                               rtol=1e-3)


def test_stem_input_staged_packed():
    """Graph inputs feeding a W-pack-eligible stem stage pre-packed
    (Program.input_transforms), and the jitted fn accepts both the
    packed and the raw NHWC form with identical results."""
    graph, in_name, out_name = build_yolov5("n", batch=1, image_size=64)
    eng = Engine().load_model(None, graph=graph)
    tr = eng.program.input_transforms
    assert in_name in tr
    f, wd, c = tr[in_name]
    assert wd == 64 and c == 3 and f in (8, 4, 2)
    x = RNG.standard_normal((1, 64, 64, 3)).astype(np.float32)
    via_engine = eng.run({in_name: x})[out_name]
    # raw path: feed the unpacked array straight to the program fn
    raw = np.asarray(eng.program.fn(
        eng._device_weights,
        {in_name: jnp.asarray(x, eng.config.compute_jnp_dtype)})[out_name])
    # terminal Detect outputs emit packed; the host view is free
    raw = raw.reshape(via_engine.shape)
    np.testing.assert_allclose(via_engine, raw, atol=2e-4, rtol=1e-4)


def test_auto_input_layout():
    """input_layout='auto' (the default) AOT-compiles the forward with
    XLA-chosen argument layouts, caches one entry per input signature,
    stages later inputs directly in the compiled format, and matches
    the default-layout path exactly."""
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=4, width=8)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    eng = Engine().load_model(None, graph=graph)
    assert eng.config.input_layout == "auto"
    y1 = eng.run({in_name: x})[out_name]
    assert eng._aot_cache and len(eng._aot_cache) == 1
    assert len(eng._input_formats) == 1
    # second run: input() stages straight into the known format and the
    # cached executable is reused (no new entries)
    y2 = eng.run({in_name: x})[out_name]
    assert len(eng._aot_cache) == 1
    np.testing.assert_array_equal(y1, y2)
    # a second batch size adds a second signature entry
    x2 = RNG.standard_normal((2, 32, 32, 3)).astype(np.float32)
    eng.run({in_name: x2})
    assert len(eng._aot_cache) == 2

    ref_graph, ref_in, ref_out = build_resnet18(batch=1, image_size=32,
                                                num_classes=4, width=8)
    ref = Engine(EngineConfig(input_layout="default")).load_model(
        None, graph=ref_graph)
    y_ref = ref.run({ref_in: x})[ref_out]
    assert not ref._aot_cache  # default mode never AOT-compiles
    np.testing.assert_allclose(y1, y_ref, atol=1e-6, rtol=1e-6)


def test_auto_layout_mismatch_recovery():
    """When the AOT executable rejects its inputs because the backend's
    reported input_formats disagree with the real layout requirements
    (seen on the remote TPU backend), forward() parses the required
    major_to_minor from the error, re-stages, and retries — keeping the
    AUTO path alive — and only degrades to default layouts when the
    error is unparseable."""
    graph, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                              num_classes=4, width=8)
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    eng = Engine().load_model(None, graph=graph)
    y_ref = eng.run({in_name: x})[out_name]

    key, (real_compiled, formats) = next(iter(eng._aot_cache.items()))
    # the executable's true requirement; the synthetic rejection below
    # claims the staged array was passed in some OTHER layout so that
    # re-staging per the parsed requirement is the correct repair
    real_mm = tuple(formats[in_name].layout.major_to_minor)
    mm_str = ", ".join(str(d) for d in real_mm)
    err = (
        "Computation was compiled for input layouts that disagree with "
        "the layouts of arguments passed to it. Here are the 1 "
        "mismatches:\n"
        f"Argument inputs['{in_name}'] with shape bfloat16[1,32,32,3]:\n"
        "  Passed layout: Layout(major_to_minor=(0, 2, 3, 1), "
        "tiling=((8, 128), (2, 1)), sub_byte_element_size_in_bits=0)\n"
        f"  Required layout: Layout(major_to_minor=({mm_str}), "
        "tiling=((8, 128), (2, 1)), sub_byte_element_size_in_bits=0)")
    from simpleinfer_tpu.engine import _required_layouts_from_error
    assert _required_layouts_from_error(err) == {in_name: real_mm}
    assert _required_layouts_from_error("some other ValueError") == {}
    calls = []

    def flaky(weights, staged):
        calls.append(1)
        if len(calls) == 1:
            raise ValueError(err)
        return real_compiled(weights, staged)

    eng._aot_cache[key] = (flaky, formats)
    y2 = eng.run({in_name: x})[out_name]
    np.testing.assert_array_equal(y_ref, y2)
    assert len(calls) == 2          # rejected once, retried successfully
    assert eng._aot_cache is not None   # AUTO path stays enabled
    mm = eng._aot_cache[key][1][in_name].layout.major_to_minor
    assert tuple(mm) == real_mm         # cached format matches requirement

    # unparseable rejection -> permanent default-layout fallback
    def broken(weights, staged):
        raise ValueError("some other ValueError")

    eng._aot_cache[key] = (broken, formats)
    y3 = eng.run({in_name: x})[out_name]
    np.testing.assert_array_equal(y_ref, y3)
    assert eng._aot_cache is None


def test_compilation_cache_enabled(tmp_path):
    """Engine construction points JAX's persistent compile cache at the
    configured dir (first caller wins process-wide)."""
    import simpleinfer_tpu.engine as engine_mod

    d = str(tmp_path / "xla_cache")
    if engine_mod._cache_dir_enabled is None:
        Engine(EngineConfig(compilation_cache_dir=d))
        assert engine_mod._cache_dir_enabled == d
        assert jax.config.jax_compilation_cache_dir == d
    # a second, different dir is ignored (process-global)
    Engine(EngineConfig(compilation_cache_dir=str(tmp_path / "other")))
    assert engine_mod._cache_dir_enabled != str(tmp_path / "other")
    # disabling is per-engine and does not clear the global
    Engine(EngineConfig(compilation_cache_dir=None))


def test_yolov8_parity():
    """YOLOv8 family (C2f chunk blocks, anchor-free DFL head) vs the
    torch oracle — a model family beyond the reference's capability."""
    from simpleinfer_tpu.zoo import build_yolov8

    eng, got = _parity(build_yolov8, (1, 3, 64, 64), tol=5e-3,
                       variant="n", batch=1, image_size=64)
    out = got[eng.output_names[0]]
    assert out.shape == (1, 64 + 16 + 4, 84)
    # decoded boxes: xy within image bounds (64px), wh positive
    assert float(out[..., :2].min()) >= -64 and float(
        out[..., :2].max()) <= 128
    assert float(out[..., 2:4].min()) >= 0
    # class probabilities in (0, 1)
    assert 0.0 <= float(out[..., 4:].min()) <= float(
        out[..., 4:].max()) <= 1.0


def test_compiler_options_plumbing_and_fallback():
    """Explicit xla_compiler_options flow to the AOT compile; unknown
    options degrade to a plain compile (warning) instead of failing.
    On the CPU test backend the auto default is no options."""
    graph, in_name, out_name = build_resnet18(
        batch=1, image_size=32, num_classes=5, width=8)
    cfg = EngineConfig(xla_compiler_options={"not_a_real_option": True})
    eng = Engine(cfg).load_model(None, graph=graph)
    assert eng._effective_compiler_options() == {"not_a_real_option": True}
    x = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    out = eng.run({in_name: x})[out_name]   # must survive the rejection
    assert out.shape == (1, 5)

    g2, _, _ = build_resnet18(batch=1, image_size=32, num_classes=5,
                              width=8)
    eng2 = Engine(EngineConfig()).load_model(None, graph=g2)
    # CPU backend: auto default adds nothing
    assert eng2._effective_compiler_options() is None
    eng3 = Engine(EngineConfig(xla_compiler_options={}))
    assert eng3._effective_compiler_options() is None


def test_extract_device_side_honors_nchw_layout():
    """io_layout='nchw' must apply to extract(as_numpy=False) too
    (review finding: device-side consumers silently got NHWC)."""
    from simpleinfer_tpu.zoo import build_resnet18

    g, in_name, out_name = build_resnet18(batch=1, image_size=32,
                                          num_classes=4, width=8)
    eng = Engine(EngineConfig(io_layout="nchw")).load_model(None, graph=g)
    x = np.random.default_rng(0).standard_normal(
        (1, 3, 32, 32)).astype(np.float32)
    eng.input(in_name, x)
    eng.forward()
    host = eng.extract(out_name)                 # rank-2: layout-neutral
    dev = np.asarray(eng.extract(out_name, as_numpy=False))
    np.testing.assert_allclose(host, dev, atol=1e-6)

    # a rank-4 output model: both forms must agree on layout
    from simpleinfer_tpu.zoo import build_unet

    g2, in2, out2 = build_unet(batch=1, image_size=32, num_classes=3,
                               width=8, depth=1)
    eng2 = Engine(EngineConfig(io_layout="nchw")).load_model(None, graph=g2)
    eng2.input(in2, x)
    eng2.forward()
    host4 = eng2.extract(out2)
    dev4 = np.asarray(eng2.extract(out2, as_numpy=False))
    assert host4.shape == dev4.shape == (1, 3, 32, 32)
    np.testing.assert_allclose(host4, dev4, atol=1e-6)


def test_export_model_roundtrip(tmp_path):
    """StableHLO artifact export/load: same outputs as the live engine,
    in a consumer that has no Graph/config (deployment story)."""
    from simpleinfer_tpu import load_exported
    from simpleinfer_tpu.zoo import build_resnet18

    g, in_name, out_name = build_resnet18(batch=2, image_size=32,
                                          num_classes=5, width=8)
    eng = Engine().load_model(None, graph=g)
    x = np.random.default_rng(5).standard_normal(
        (2, 32, 32, 3)).astype(np.float32)
    want = eng.run({in_name: x})[out_name]
    path = str(tmp_path / "m.shlo")
    eng.export_model(path)
    fn = load_exported(path)
    got = fn({in_name: x})[out_name]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_export_model_batch_override_and_nchw(tmp_path):
    from simpleinfer_tpu import load_exported
    from simpleinfer_tpu.zoo import build_unet

    g, in_name, out_name = build_unet(batch=1, image_size=32,
                                      num_classes=3, width=8, depth=1)
    eng = Engine(EngineConfig(io_layout="nchw")).load_model(None, graph=g)
    path = str(tmp_path / "m.shlo")
    eng.export_model(path, batch=2)
    fn = load_exported(path)
    x = np.random.default_rng(6).standard_normal(
        (2, 3, 32, 32)).astype(np.float32)
    got = fn({in_name: x})[out_name]
    assert got.shape == (2, 3, 32, 32)
    # parity vs the live engine at the same batch
    eng2 = Engine(EngineConfig(io_layout="nchw")).load_model(None, graph=g)
    eng2.input(in_name, x)
    eng2.forward()
    np.testing.assert_allclose(got, eng2.extract(out_name), atol=1e-5)


def test_export_model_packed_yolo_head(tmp_path):
    """Artifact outputs are logical shapes even when the engine's
    terminal op emits a packed layout (output_transforms)."""
    from simpleinfer_tpu import load_exported
    from simpleinfer_tpu.zoo import build_yolov5

    g, in_name, out_name = build_yolov5("n", batch=1, image_size=64)
    eng = Engine().load_model(None, graph=g)
    x = np.random.default_rng(7).standard_normal(
        (1, 64, 64, 3)).astype(np.float32) / 4
    want = eng.run({in_name: x})[out_name]
    path = str(tmp_path / "y.shlo")
    eng.export_model(path)
    got = load_exported(path)({in_name: x})[out_name]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_export_model_rejects_mesh_engine(tmp_path):
    from simpleinfer_tpu.zoo import build_resnet18

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    g, _, _ = build_resnet18(batch=8, image_size=32, num_classes=4,
                             width=8)
    eng = Engine(EngineConfig(mesh=MeshConfig(data=8))).load_model(
        None, graph=g)
    with pytest.raises(EngineStateError):
        eng.export_model(str(tmp_path / "x.shlo"))


def test_gpt_parity_and_causality():
    """GPT decoder: causal-mask attention matches the torch oracle, and
    future tokens cannot influence earlier positions' logits."""
    from simpleinfer_tpu.zoo import build_gpt

    kw = dict(variant="nano", batch=2, seq_len=12, vocab_size=40,
              depth=2, width=32, num_heads=4)
    graph, in_name, out_name = build_gpt(**kw)
    ids = RNG.integers(0, 40, size=(2, 12)).astype(np.float32)
    want = run_graph_torch(graph, {in_name: ids})[out_name]
    eng = Engine().load_model(None, graph=graph)
    got = eng.run({in_name: ids})[out_name]
    assert got.shape == (2, 12, 40)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    # causality: perturb the tail, logits at earlier positions unchanged
    ids2 = ids.copy()
    ids2[:, 8:] = (ids2[:, 8:] + 7) % 40
    got2 = eng.run({in_name: ids2})[out_name]
    np.testing.assert_allclose(got[:, :8], got2[:, :8], atol=1e-5,
                               rtol=1e-5)
    assert np.abs(got[:, 8:] - got2[:, 8:]).max() > 1e-3


def test_greedy_generate():
    from simpleinfer_tpu.zoo import build_gpt, greedy_generate

    graph, in_name, out_name = build_gpt(variant="nano", batch=2,
                                         seq_len=16, vocab_size=30,
                                         depth=2, width=32, num_heads=4)
    eng = Engine().load_model(None, graph=graph)
    prompt = RNG.integers(1, 30, size=(2, 4))
    out = greedy_generate(eng, prompt, steps=5)
    assert out.shape == (2, 9)
    np.testing.assert_array_equal(out[:, :4], prompt)
    assert ((out >= 0) & (out < 30)).all()
    # deterministic: same prompt -> same continuation
    out2 = greedy_generate(eng, prompt, steps=5)
    np.testing.assert_array_equal(out, out2)
    # window overflow raises
    with pytest.raises(ValueError):
        greedy_generate(eng, prompt, steps=13)


def test_cached_decoder_matches_full_window():
    """KV-cache decode must reproduce greedy_generate token-for-token:
    O(L) steps vs O(L^2) re-forwards, same compiled-weights engine."""
    from simpleinfer_tpu.zoo import build_gpt, greedy_generate
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    graph, in_name, out_name = build_gpt(variant="nano", batch=2,
                                         seq_len=20, vocab_size=50,
                                         depth=2, width=32, num_heads=4)
    eng = Engine().load_model(None, graph=graph)
    prompt = RNG.integers(1, 50, size=(2, 5))
    want = greedy_generate(eng, prompt, steps=8)
    dec = CachedDecoder(eng)
    got = dec.generate(prompt, steps=8)
    np.testing.assert_array_equal(got, want)


def test_cached_decoder_rejects_non_lm():
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    graph, _, _ = build_resnet18(batch=1, image_size=32, num_classes=4,
                                 width=8)
    eng = Engine().load_model(None, graph=graph)
    with pytest.raises(ValueError):
        CachedDecoder(eng)


def test_engine_warmup_rejects_dynamic_nonbatch_dim():
    """warmup must refuse to fabricate sizes for dynamic (?=-1)
    NON-batch dims instead of silently warming a size-1 bucket
    (round-3 verdict weak-item 6)."""
    graph, in_name, _ = build_resnet18(batch=1, image_size=32,
                                       num_classes=4, width=8)
    op = graph.get_operand(in_name)
    op.shape = [op.shape[0], op.shape[1], -1, op.shape[3]]
    eng = Engine().load_model(None, graph=graph)
    with pytest.raises(EngineStateError, match="dynamic"):
        eng.warmup([1])
