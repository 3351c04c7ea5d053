"""Device-mesh parallelism: the distributed layer the reference never had.

The reference is single-process/single-node (SURVEY.md §2.5); its entire
concurrency story is three thread pools. Here parallelism is expressed the
TPU-native way: a `jax.sharding.Mesh` with `data` and `model` axes,
`NamedSharding` annotations on activations (batch over `data`) and weights
(output channels over `model`), and XLA GSPMD inserting the collectives,
which ride ICI within a slice and DCN across hosts.
"""
from .mesh import (
    build_mesh,
    input_sharding,
    make_multihost_mesh,
    replicated,
    weight_shardings,
)

__all__ = [
    "build_mesh",
    "input_sharding",
    "make_multihost_mesh",
    "replicated",
    "weight_shardings",
]
