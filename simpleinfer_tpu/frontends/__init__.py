"""Model frontends beyond the on-disk pnnx format."""
from .torch_export import export_torch

__all__ = ["export_torch"]
