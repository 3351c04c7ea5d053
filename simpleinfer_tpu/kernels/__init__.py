"""Pallas TPU kernel library.

The TPU-native replacement for the reference's highway SIMD kernel
library (/root/reference/src/layer/simd/ — 4-lane f32 GEMM micro-kernels,
Winograd F(2,3) transforms, bias epilogue; SURVEY.md §2.4): tiled MXU
matmuls with the dequant/bias/activation epilogue fused into the kernel,
instead of register-blocked 128-bit vector code.

A deliberate design decision (mirroring ops/conv.py): no Winograd here.
F(2,3) trades a 2.25x multiply reduction for extra bandwidth in the
transforms; the MXU is FLOP-rich and HBM-bound, so implicit-GEMM conv and
plain tiled GEMM win. The reference's `GemmPack4F32Ref` testing discipline
is kept: every kernel has a jnp reference implementation and tests compare
against it (tests/test_kernels.py).
"""
from .matmul import (matmul, matmul_int8w, matmul_s8s8,
                     pallas_supported)

__all__ = ["matmul", "matmul_int8w", "matmul_s8s8",
           "pallas_supported"]
