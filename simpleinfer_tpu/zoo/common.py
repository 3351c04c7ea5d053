"""Shared zoo-pipeline helpers.

The demo pipelines (detect/classify/segment) produce NHWC batches
internally. An engine configured with ``io_layout="nchw"`` interprets
rank-4 arrays at its input()/extract() boundary as NCHW (config.py), so
pipelines must adapt at the boundary or detections/masks silently come
out mangled — these helpers are that adaptation.
"""
from __future__ import annotations

import numpy as np


def _is_nchw(engine) -> bool:
    return getattr(engine.config, "io_layout", "nhwc") == "nchw"


def stage_for_engine(engine, batch_nhwc: np.ndarray) -> np.ndarray:
    """NHWC pipeline batch -> the engine's declared input layout."""
    if _is_nchw(engine) and batch_nhwc.ndim == 4:
        return np.ascontiguousarray(batch_nhwc.transpose(0, 3, 1, 2))
    return batch_nhwc


def fetch_nhwc(engine, name: str, as_numpy: bool = True):
    """extract() an output and return it in NHWC regardless of the
    engine's io layout (device-side results stay on device)."""
    out = engine.extract(name, as_numpy=as_numpy)
    if _is_nchw(engine) and out.ndim == 4:
        if as_numpy:
            return out.transpose(0, 2, 3, 1)
        import jax.numpy as jnp

        return jnp.transpose(out, (0, 2, 3, 1))
    return out
