"""simpleinfer_tpu — a TPU-native inference framework.

Brand-new implementation with the capabilities of zpye/SimpleInfer
(reference: /root/reference, a CPU/Eigen/SIMD pnnx inference engine),
re-designed for TPU: pnnx graphs lower to one jit-compiled XLA program,
hot kernels run on the MXU (Pallas int8 paths in kernels/), and scaling
is declarative via jax.sharding meshes instead of a comm library.
"""
from .config import EngineConfig, MeshConfig
from .engine import (Engine, EngineStateError, initialize_context,
                     load_exported)
from .executor import Program, build_program
from .ir.graph import Graph
from .tensor import DataType, Status, Tensor

__version__ = "0.1.0"

__all__ = [
    "DataType",
    "Engine",
    "EngineConfig",
    "EngineStateError",
    "load_exported",
    "Graph",
    "MeshConfig",
    "Program",
    "Status",
    "Tensor",
    "build_program",
    "initialize_context",
    "__version__",
]
