"""Tensor facade + layout helpers — API parity with the reference Tensor.

The reference exposes class Tensor (dtype + shape + buffer, zero-copy
views, /root/reference/include/tensor.h:13-69) and layout conversion
helpers (eigen_helper.h:22-74 ConvertLayout). In a Python-first framework
the payload is simply a numpy/jax array; this thin wrapper exists so code
ported from the reference API has a direct target, and it centralizes the
NHWC<->NCHW conversions the engine applies at its boundaries.

Copy semantics note: reference Tensor copies are shallow, non-owning
aliases (src/tensor.cpp:28-45). Here `Tensor.data` is whatever array you
put in — numpy views alias, jax arrays are immutable — so aliasing bugs
of the reference kind cannot occur.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Any

import numpy as np


class Status(enum.Enum):
    """Parity with the reference Status codes (include/types.h:24-31).

    The Python API raises exceptions instead of returning codes; this
    enum exists for users porting reference code and for structured
    logging."""

    SUCCESS = 0
    ERROR_INVALID_PARAM = 1
    ERROR_EMPTY_GRAPH = 2
    ERROR_EMPTY_PIPELINE = 3
    ERROR_NOT_IMPLEMENTED = 4
    ERROR_INTERNAL = 5


class DataType(enum.Enum):
    """pnnx dtype tags (include/types.h:8-22, ir/dtypes.py)."""

    UNKNOWN = 0
    FLOAT32 = 1
    FLOAT64 = 2
    FLOAT16 = 3
    INT32 = 4
    INT64 = 5
    INT16 = 6
    INT8 = 7
    UINT8 = 8
    BOOL = 9
    COMPLEX64 = 10
    COMPLEX128 = 11
    COMPLEX32 = 12
    BFLOAT16 = 13


def nchw_to_nhwc(x):
    """Transpose a rank-4 array NCHW -> NHWC (no-op otherwise)."""
    return np.transpose(x, (0, 2, 3, 1)) if np.ndim(x) == 4 else x


def nhwc_to_nchw(x):
    """Transpose a rank-4 array NHWC -> NCHW (no-op otherwise)."""
    return np.transpose(x, (0, 3, 1, 2)) if np.ndim(x) == 4 else x


@dataclass
class Tensor:
    """dtype/shape/array triple (reference include/tensor.h:13-69)."""

    data: Any = None  # numpy or jax array

    @staticmethod
    def from_numpy(arr) -> "Tensor":
        return Tensor(data=np.asarray(arr))

    @property
    def shape(self) -> tuple:
        return tuple(np.shape(self.data)) if self.data is not None else ()

    @property
    def dtype(self):
        return getattr(self.data, "dtype", None)

    @property
    def empty(self) -> bool:
        return self.data is None

    def numpy(self) -> np.ndarray:
        if self.data is None:
            raise ValueError("empty tensor")
        return np.asarray(self.data)

    def nhwc(self) -> np.ndarray:
        return nchw_to_nhwc(self.numpy())

    def nchw(self) -> np.ndarray:
        return nhwc_to_nchw(self.numpy())
