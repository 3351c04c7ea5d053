"""`simpleinfer` — drop-in alias for reference-API user scripts.

Re-exports the compatibility surface of simpleinfer_tpu.compat so code
written against the reference's pybind11 module
(/root/reference/python/pybind11_main.cpp) runs unchanged:

    import simpleinfer as infer
"""
from simpleinfer_tpu.compat import (  # noqa: F401
    DataType,
    Engine,
    InitializeContext,
    Status,
    Tensor,
)

__all__ = ["DataType", "Engine", "InitializeContext", "Status", "Tensor"]
