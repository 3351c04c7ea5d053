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
