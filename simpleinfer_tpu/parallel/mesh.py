"""Mesh construction and sharding rules.

Replaces — TPU-natively — the communication backend the reference lacks
(SURVEY.md §2.5 "Communication backend: None"): instead of NCCL/MPI calls,
shardings are *declared* and XLA GSPMD compiles the collectives (psum /
all-gather / reduce-scatter) onto ICI/DCN.

Axes:
- ``data``  — shards the batch dim of activations (DP). The inference
  analog of the reference's batch-4/8 workloads spread over chips.
- ``spatial`` — shards the activation HEIGHT dim (the CNN analog of
  sequence/context parallelism, SURVEY.md §2.5): GSPMD compiles the
  conv/pool windows into halo exchanges (collective-permute of edge
  rows) so no manual ring is needed. For when batch alone cannot fill
  the mesh (batch-1 latency, very large images).
- ``model`` — shards conv/linear output channels (TP), per the
  `shard_hints` each OpImpl declares (ops/registry.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

AXIS_DATA = "data"
AXIS_MODEL = "model"
AXIS_SPATIAL = "spatial"


def build_mesh(cfg: Optional[MeshConfig], devices=None) -> Optional[Mesh]:
    """Create a (data, spatial, model) mesh from the config; None =
    single device."""
    if cfg is None or cfg.num_devices == 1:
        return None
    devices = devices if devices is not None else jax.devices()
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} visible")
    spatial = getattr(cfg, "spatial", 1)
    arr = np.asarray(devices[:n]).reshape(cfg.data, spatial, cfg.model)
    return Mesh(arr, (AXIS_DATA, AXIS_SPATIAL, AXIS_MODEL))


def make_multihost_mesh(data: int, model: int = 1,
                        spatial: int = 1) -> Mesh:
    """Mesh over all globally visible devices (call after
    jax.distributed.initialize() on multi-host). Device order follows
    jax.devices(), which keeps hosts contiguous so the `model`/`spatial`
    axes stay intra-host (ICI) and `data` crosses hosts (DCN) — the
    cheap direction for inference, where DP needs no inter-chip traffic
    at all."""
    devices = np.asarray(jax.devices()).reshape(data, spatial, model)
    return Mesh(devices, (AXIS_DATA, AXIS_SPATIAL, AXIS_MODEL))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def input_sharding(mesh: Mesh, rank: int) -> NamedSharding:
    """Activation sharding: batch over `data`; for rank-4 NHWC, height
    over `spatial` too (a no-op when the axis has size 1)."""
    if rank == 4 and mesh.shape.get(AXIS_SPATIAL, 1) > 1:
        return NamedSharding(mesh, P(AXIS_DATA, AXIS_SPATIAL, None, None))
    return NamedSharding(mesh, P(AXIS_DATA, *([None] * (rank - 1))))


def weight_shardings(mesh: Mesh, weights: dict, shard_hints: dict) -> dict:
    """Per-op weight shardings from OpImpl.shard_hints.

    hints map weight key -> tuple of axis names (None = replicated dim);
    the `model` axis is honored only when the mesh has model > 1.
    Quantized weights shard their int8 payload and scales alike on the
    output-channel axis (scale vector is 1-D over that axis).
    """
    model_size = mesh.shape.get(AXIS_MODEL, 1)
    out = {}
    for key, w in weights.items():
        hint = shard_hints.get(key)
        if hint is None or model_size <= 1:
            out[key] = replicated(mesh)
            continue
        # replicate when the hinted dim doesn't divide the axis (e.g. a
        # 4-class linear head on an 8-way model axis) or the hint rank
        # doesn't match this array
        shape = getattr(getattr(w, "data", w), "shape", None)
        ok = (shape is not None and len(hint) == len(shape)
              and all(a != AXIS_MODEL or shape[i] % model_size == 0
                      for i, a in enumerate(hint)))
        if not ok:
            out[key] = replicated(mesh)
            continue
        spec = P(*[a if a == AXIS_MODEL else None for a in hint])
        out[key] = NamedSharding(mesh, spec)
    return out
