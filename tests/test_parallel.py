"""Mesh/sharding unit tests on the simulated 8-device CPU mesh."""
import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from simpleinfer_tpu.config import MeshConfig
from simpleinfer_tpu.parallel import multihost
from simpleinfer_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_MODEL,
    build_mesh,
    input_sharding,
    replicated,
    weight_shardings,
)

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 simulated devices")


@needs8
def test_build_mesh_shapes():
    from simpleinfer_tpu.parallel.mesh import AXIS_SPATIAL

    mesh = build_mesh(MeshConfig(data=4, model=2))
    assert mesh.shape == {AXIS_DATA: 4, AXIS_SPATIAL: 1, AXIS_MODEL: 2}
    mesh3 = build_mesh(MeshConfig(data=2, spatial=2, model=2))
    assert mesh3.shape == {AXIS_DATA: 2, AXIS_SPATIAL: 2, AXIS_MODEL: 2}
    assert build_mesh(MeshConfig(data=1, model=1)) is None
    assert build_mesh(None) is None
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(data=16, model=16))


@needs8
def test_input_sharding_splits_batch():
    mesh = build_mesh(MeshConfig(data=8, model=1))
    x = np.zeros((16, 4, 4, 3), np.float32)
    arr = jax.device_put(x, input_sharding(mesh, x.ndim))
    # each device holds 2 rows
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(2, 4, 4, 3)}


@needs8
def test_weight_shardings_honor_hints():
    mesh = build_mesh(MeshConfig(data=2, model=4))
    weights = {"weight": np.zeros((3, 3, 8, 16), np.float32),
               "bias": np.zeros((16,), np.float32),
               "other": np.zeros((5,), np.float32)}
    hints = {"weight": (None, None, None, "model"), "bias": ("model",)}
    sh = weight_shardings(mesh, weights, hints)
    assert sh["weight"].spec == P(None, None, None, AXIS_MODEL)
    assert sh["bias"].spec == P(AXIS_MODEL)
    assert sh["other"].spec == P()
    # model axis of size 1: everything replicated
    mesh1 = build_mesh(MeshConfig(data=8, model=1))
    sh1 = weight_shardings(mesh1, weights, hints)
    assert sh1["weight"].spec == P()


@needs8
def test_tensor_parallel_inserts_collectives():
    """Channel-sharded weights must make GSPMD insert cross-device
    reduction collectives into the compiled program (the declarative
    replacement for the comm backend the reference lacks, SURVEY §2.5)."""
    import numpy as np

    from simpleinfer_tpu import Engine, EngineConfig, MeshConfig
    from simpleinfer_tpu.zoo import build_resnet18

    graph, in_name, _ = build_resnet18(batch=2, image_size=32,
                                       num_classes=4, width=16)
    cfg = EngineConfig(mesh=MeshConfig(data=1, model=8))
    eng = Engine(cfg).load_model(None, graph=graph)
    eng.input(in_name, np.zeros((2, 32, 32, 3), np.float32))
    txt = eng._jitted.lower(eng._device_weights,
                            eng._staged).compile().as_text()
    assert "all-reduce" in txt or "reduce-scatter" in txt or \
        "all-gather" in txt


@needs8
def test_multihost_single_process_helpers():
    multihost.initialize()  # no-op without a coordinator
    mesh = multihost.make_mesh(model=2)
    assert mesh.shape[AXIS_MODEL] == 2
    assert multihost.process_count() == 1
    assert multihost.is_primary()
    batch = np.arange(8 * 2, dtype=np.float32).reshape(8, 2)
    arr = multihost.host_local_batch(batch, multihost.make_mesh(model=1))
    np.testing.assert_array_equal(np.asarray(arr), batch)
    with pytest.raises(ValueError):
        multihost.make_mesh(model=3)


# ------------------------------------------------- shard_map collective TP
@needs8
def test_tp_linear_column_local_only():
    """Column-parallel: output sharded on N, NO collectives in HLO."""
    from simpleinfer_tpu.parallel.tp import tp_linear_column

    mesh = build_mesh(MeshConfig(data=1, model=8))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    b = rng.standard_normal((64,)).astype(np.float32)
    wd = jax.device_put(w, NamedSharding(mesh, P(None, AXIS_MODEL)))
    bd = jax.device_put(b, NamedSharding(mesh, P(AXIS_MODEL)))

    fn = jax.jit(lambda xi, wi, bi: tp_linear_column(
        xi, wi, bi, mesh=mesh))
    out = fn(x, wd, bd)
    np.testing.assert_allclose(np.asarray(out), x @ w + b,
                               rtol=1e-5, atol=1e-5)
    # sharded output, communication-free program
    assert out.sharding.spec == P(None, AXIS_MODEL)
    hlo = fn.lower(x, wd, bd).compile().as_text()
    assert "all-reduce" not in hlo and "collective-permute" not in hlo


@needs8
def test_tp_linear_row_explicit_ring():
    """Row-parallel: the hand-scheduled ring shows up as
    collective-permute (NOT GSPMD's all-reduce) and matches numpy and
    the GSPMD-declarative einsum."""
    from simpleinfer_tpu.parallel.tp import tp_linear_row

    mesh = build_mesh(MeshConfig(data=1, model=8))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    w = rng.standard_normal((64, 48)).astype(np.float32)
    b = rng.standard_normal((48,)).astype(np.float32)
    xd = jax.device_put(x, NamedSharding(mesh, P(None, AXIS_MODEL)))
    wd = jax.device_put(w, NamedSharding(mesh, P(AXIS_MODEL, None)))

    fn = jax.jit(lambda xi, wi, bi: tp_linear_row(xi, wi, bi, mesh=mesh))
    out = np.asarray(fn(xd, wd, b))
    np.testing.assert_allclose(out, x @ w + b, rtol=1e-4, atol=1e-4)

    # GSPMD-declarative equivalent (same shardings, XLA places comm)
    gspmd = jax.jit(lambda xi, wi, bi: jnp_einsum_ref(xi, wi, bi))
    np.testing.assert_allclose(out, np.asarray(gspmd(xd, wd, b)),
                               rtol=1e-4, atol=1e-4)

    hlo = fn.lower(xd, wd, b).compile().as_text()
    assert "collective-permute" in hlo, "explicit ring missing"
    assert "all-reduce" not in hlo, "GSPMD reduction leaked in"


def jnp_einsum_ref(xi, wi, bi):
    import jax.numpy as jnp

    return (jnp.einsum("mk,kn->mn", xi, wi,
                       preferred_element_type=jnp.float32)
            + bi).astype(xi.dtype)


@needs8
def test_tp_mlp_megatron_pair():
    """Full megatron pair: one ring round total, numpy-correct."""
    from simpleinfer_tpu.parallel.tp import shard_tp_weights, tp_mlp

    mesh = build_mesh(MeshConfig(data=1, model=8))
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    w1 = rng.standard_normal((32, 128)).astype(np.float32)
    b1 = rng.standard_normal((128,)).astype(np.float32)
    w2 = rng.standard_normal((128, 32)).astype(np.float32)
    b2 = rng.standard_normal((32,)).astype(np.float32)
    w1d, b1d, w2d, b2d = shard_tp_weights(mesh, w1, b1, w2, b2)

    out = tp_mlp(x, w1d, b1d, w2d, b2d, mesh=mesh)
    want = (np.asarray(jax.nn.gelu((x @ w1 + b1).astype(np.float32)))
            @ w2 + b2)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4,
                               atol=1e-4)


@needs8
def test_tp_conv_column_and_row_pair():
    """Conv analog of the megatron pair: column (CO-sharded, no comm)
    -> row (CI-sharded, overlapped ring) matches the unsharded convs;
    the compiled HLO carries the explicit ring, not an all-reduce."""
    from jax import lax

    from simpleinfer_tpu.parallel.tp import (tp_conv_column, tp_conv_pair,
                                             tp_conv_row)

    mesh = build_mesh(MeshConfig(model=8))
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    w1 = (rng.standard_normal((1, 1, 16, 32)) / 4).astype(np.float32)
    b1 = rng.standard_normal(32).astype(np.float32) * 0.1
    w2 = (rng.standard_normal((3, 3, 32, 16)) / 17).astype(np.float32)
    b2 = rng.standard_normal(16).astype(np.float32) * 0.1

    def ref_conv(xx, ww, bb, stride=(1, 1)):
        y = lax.conv_general_dilated(
            xx, ww, window_strides=stride, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y + bb

    import jax.numpy as jnp

    col = tp_conv_column(x, w1, b1, mesh=mesh)
    assert col.sharding.spec == P(None, None, None, "model")
    np.testing.assert_allclose(np.asarray(col), np.asarray(
        ref_conv(x, w1, b1)).astype(np.float32), atol=1e-5, rtol=1e-5)

    h = np.asarray(ref_conv(x, w1, b1), np.float32)
    hs = jax.device_put(h, NamedSharding(mesh, P(None, None, None,
                                                 "model")))
    row = tp_conv_row(hs, w2, b2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(row), np.asarray(
        ref_conv(h, w2, b2)), atol=1e-4, rtol=1e-4)

    fn = jax.jit(lambda xx: tp_conv_pair(xx, w1, b1, w2, b2, mesh=mesh))
    want = ref_conv(np.asarray(jax.nn.silu(ref_conv(x, w1, b1)),
                               np.float32), w2, b2)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    hlo = fn.lower(x).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-reduce" not in hlo


@needs8
def test_sp_conv3x3_halo_matches_same_conv():
    """Explicit halo-exchange height-sharded conv == the plain 'same'
    conv, including the zero rows the edge devices get from ppermute's
    missing partners; HLO carries collective-permute only."""
    from jax import lax

    import jax.numpy as jnp

    from simpleinfer_tpu.parallel.tp import sp_conv3x3_halo
    from simpleinfer_tpu.parallel.mesh import AXIS_SPATIAL

    mesh = build_mesh(MeshConfig(spatial=8))
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 32, 8, 12)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 12, 20)) / 10).astype(np.float32)
    b = rng.standard_normal(20).astype(np.float32) * 0.1

    fn = jax.jit(lambda xx: sp_conv3x3_halo(xx, w, b, mesh=mesh,
                                            axis=AXIS_SPATIAL))
    got = np.asarray(fn(x))
    want = np.asarray(lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    assert got.shape == want.shape
    hlo = fn.lower(x).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-reduce" not in hlo


@needs8
def test_tp_mlp_composes_with_data_parallel():
    """DP x TP on one mesh (data=4, model=2): the megatron pair runs its
    ring inside each data replica while the batch stays sharded — the
    BASELINE config-5 composition, explicit-schedule variant."""
    from simpleinfer_tpu.parallel.tp import tp_mlp

    mesh = build_mesh(MeshConfig(data=4, model=2))
    rng = np.random.default_rng(9)
    x = rng.standard_normal((8, 24)).astype(np.float32)
    w1 = (rng.standard_normal((24, 32)) / 5).astype(np.float32)
    b1 = rng.standard_normal(32).astype(np.float32) * 0.1
    w2 = (rng.standard_normal((32, 24)) / 6).astype(np.float32)
    b2 = rng.standard_normal(24).astype(np.float32) * 0.1

    fn = jax.jit(lambda xx: tp_mlp(xx, w1, b1, w2, b2, mesh=mesh,
                                   batch_axis=AXIS_DATA))
    xs = jax.device_put(x, NamedSharding(mesh, P(AXIS_DATA, None)))
    got = fn(xs)
    # output stays batch-sharded over the data axis
    assert got.sharding.spec[0] == AXIS_DATA
    want = (jax.nn.gelu((x @ w1 + b1).astype(np.float32)) @ w2 + b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    hlo = fn.lower(xs).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-reduce" not in hlo
