"""Model frontends beyond the on-disk pnnx format."""
from .torch_export import export_torch

__all__ = ["export_torch"]
# hf_llama.llama_graph_from_hf / hf_gpt2.gpt2_graph_from_hf import
# lazily (transformers is heavy); see frontends.hf_llama / hf_gpt2
