"""Engine configuration.

The reference hardcodes its runtime knobs (Eigen pool = 16 threads at
/root/reference/src/engine_impl.cpp:133, CGraph pool = 2 at :421-423,
"TODO: add runtime options" at :534). Here they are a real config object:
dtype policy, weight-only quantization, device mesh, and I/O layout.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


@dataclass(frozen=True)
class MeshConfig:
    """Logical device mesh: data x spatial x model parallel axes.

    The reference has no distributed story (SURVEY.md §2.5); this is the
    TPU-native replacement: axis sizes multiply to the device count,
    `data` shards the batch dim of activations, `model` shards conv/linear
    output channels (TP), and `spatial` shards the activation HEIGHT dim —
    the CNN analog of sequence parallelism (GSPMD inserts the conv/pool
    halo exchanges). Use `spatial` when batch alone cannot fill the mesh
    (e.g. batch-1 latency on a multi-chip slice, or very large images).
    Collectives ride ICI within a slice.
    """

    data: int = 1
    model: int = 1
    spatial: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model * self.spatial


@dataclass(frozen=True)
class EngineConfig:
    # "float32" (bit-parity with the CPU reference) or "bfloat16" (MXU native)
    compute_dtype: str = "float32"
    # None (keep weights at compute dtype), "int8w" (weight-only int8,
    # per-output-channel scales), "int8" (static full int8: weights
    # per-channel + activations per-tensor; requires Engine.calibrate()
    # with sample batches, until which convs run the weight-only path),
    # or "int4w" (weight-only group-wise int4 of 2-D weights — the LLM
    # decode serving dtype: half the weight HBM per decode step via the
    # nibble-packed Pallas matmul, kernels/matmul.matmul_int4w; 4-D
    # conv weights fall back to int8; single-device only in this
    # version). s8 x s8 -> s32 convs hit the v5e MXU int8 path.
    quant: Optional[str] = None
    # int4w quantization group size along the weight's K dim (one scale
    # row per group; the kernel's K-blocks are multiples of it). 128 =
    # the literature-standard W4 g128 accuracy/size point
    int4_group: int = 128
    # activation calibration observer: None = abs-max, or a percentile
    # in (0, 100) — e.g. 99.99 clips outliers (quantize_act saturates
    # them), trading saturation error for finer resolution everywhere else
    act_clip_percentile: Optional[float] = None
    # per-CHANNEL activation scales (quant="int8"): ops that can fold
    # (OpImpl.act_fold — plain convs/linears on the guaranteed s8 path)
    # calibrate one scale per input channel, folded into the quantized
    # weight at install so the MXU epilogue stays a single per-out-
    # channel dequant. Ops that cannot fold keep per-tensor scales.
    # Costs nothing at inference; helps models with skewed per-channel
    # activation ranges (the usual real-weights failure mode of
    # per-tensor calibration). Chain requant (mark_int8_chains) is
    # disabled on per-channel consumers — correctness over the measured-
    # neutral chain win.
    act_per_channel: bool = False
    # static-int8 profitability gate (measured on v5e,
    # scripts/int8_conv_probe.py): s8xs8 conv beats bf16 only for
    # k>1 convs with >= this many input channels (1.12-1.56x); 1x1
    # convs LOSE (0.6-0.8x: they are bandwidth-bound and the
    # quantize/dequant elementwise passes add HBM traffic). Ops outside
    # the gate run the bf16 weight-dequant path — less quant noise too.
    int8_min_channels: int = 128
    int8_pointwise: bool = False
    # layout of arrays the USER passes to input()/gets from extract():
    # "nhwc" (like the reference's Tensor, tensor.h) or "nchw" (PyTorch
    # habit; engine transposes at the boundary)
    io_layout: str = "nhwc"
    # device mesh; None = single device
    mesh: Optional[MeshConfig] = None
    # tensor-parallel implementation when mesh.model > 1:
    # "gspmd" (default) places Megatron shardings on the weights and
    # lets GSPMD insert the collectives (an all-reduce after each
    # row-parallel output projection); "ring" routes each attention
    # output projection through the EXPLICIT shard_map collective-
    # matmul (parallel/tp.tp_linear_row): the local matmul runs in
    # column chunks whose partials ride a lax.ppermute ring while the
    # next chunk is on the MXU — the hand-scheduled comm/compute
    # overlap of SURVEY.md §2.5. Numerics: the ring sums partials in
    # deterministic neighbor order, ~1 ulp from GSPMD's tree. Ops whose
    # head count does not divide the model axis fall back to gspmd.
    tp_mode: str = "gspmd"
    # pin a single-device engine to jax.devices()[device_index]
    # (DP engine pools: one engine per chip, serving/batcher.py).
    # None = the process default device. Mutually exclusive with mesh.
    device_index: Optional[int] = None
    # run load-time graph fusions (conv+bn fold, conv+activation tagging;
    # ir/passes.py). Off = every op runs standalone like the reference.
    fuse: bool = True
    # collapse eligible YOLOv5-style C3 blocks into the fused
    # whole-block VMEM kernel (ir/passes.fuse_c3_blocks +
    # kernels/c3block.py). Default OFF: measured e2e NEGATIVE on
    # yolov5l-640-b16 (int8 0.796x, bf16 0.871x — docs/PERF.md round-5:
    # XLA's conv emitter contracts all 9 taps at full K-depth while the
    # kernel's shifted-matmul taps cap at K=hid, and the MXU efficiency
    # forfeited exceeds the inter-conv HBM traffic saved). Kept as a
    # correct, tested, opt-in exploration (the kernels/stem.py
    # precedent); requires fuse=True; single-device TPU only.
    c3_fusion: bool = False
    # use Pallas kernels for eligible ops (1x1 int8 convs, int8 linear).
    # None = auto, currently OFF: measured on v5e, XLA's implicit-GEMM
    # convs + fusion beat the standalone int8 kernel end-to-end
    # (1155 vs 854 img/s yolov5s-640-b8; pallas_call is a fusion
    # barrier). Set True to force the Pallas path (single-device only).
    use_pallas: Optional[bool] = None
    # persistent XLA compilation cache directory (expanded; None
    # disables). Measured on the axon-attached v5e: a cold-process
    # model compile drops from minutes to ~11 s when the executable is
    # cached (docs/PERF.md). Process-global: the first Engine to
    # enable it wins; subsequent different dirs are ignored with a log.
    compilation_cache_dir: Optional[str] = "~/.cache/simpleinfer_tpu/xla"
    # donate input buffers to the jitted call
    donate_inputs: bool = False
    # "auto": compile the forward with XLA-chosen (AUTO) input layouts
    # and stage inputs in them (single-device only; falls back under a
    # mesh or if the layout API is unavailable). XLA would otherwise
    # re-lay the default-layout argument out on device EVERY forward —
    # measured ~2% of the yolov5s-640-b8 bf16 headline
    # (scripts/layout_experiment.py: 2.229 -> 2.187 ms). "default":
    # plain jit with default argument layouts.
    input_layout: str = "auto"
    # extra XLA backend options for engine-compiled executables (the
    # per-executable compiler_options surface swept by
    # scripts/xla_flags_experiment.py). None = stock XLA. Flags probed
    # so far (rwb fusion off, dot-dot fusion off) change the compiled
    # program but measured NO device-time effect once A/Bs were
    # interleaved within the same minute (scripts/dotdot_verify.py);
    # sequential sweeps had been fooled by the chip's 1.5-3.5 ms
    # same-day drift — docs/PERF.md. Applied on the AUTO-layout AOT
    # path and by bench.py; unknown options fall back to a plain
    # compile with a log.
    xla_compiler_options: Optional[dict] = None
    # uint8 inputs are shipped raw and scaled on-device by this factor
    # (4x less host->device traffic than pre-normalized f32 — the
    # serving-path win; set 1.0 to disable scaling)
    u8_scale: float = 1.0 / 255.0

    def __post_init__(self):
        if self.compute_dtype not in _DTYPES:
            raise ValueError(f"compute_dtype must be one of {list(_DTYPES)}")
        if self.quant not in (None, "int8w", "int8", "int4w"):
            raise ValueError(
                "quant must be None, 'int8w', 'int8' or 'int4w'")
        if self.quant == "int4w" and self.mesh is not None:
            raise ValueError(
                "int4w is single-device in this version (Quantized4Tensor"
                " carries no shard layout yet) — drop the mesh or use"
                " int8w")
        if self.act_clip_percentile is not None and not (
                0.0 < self.act_clip_percentile < 100.0):
            raise ValueError("act_clip_percentile must be in (0, 100)")
        if self.io_layout not in ("nhwc", "nchw"):
            raise ValueError("io_layout must be 'nhwc' or 'nchw'")
        if self.tp_mode not in ("gspmd", "ring"):
            raise ValueError("tp_mode must be 'gspmd' or 'ring'")
        if self.input_layout not in ("auto", "default"):
            raise ValueError("input_layout must be 'auto' or 'default'")
        if self.device_index is not None:
            if self.mesh is not None:
                raise ValueError("device_index pins a SINGLE-device "
                                 "engine; it cannot combine with a mesh")
            if self.device_index < 0:
                raise ValueError("device_index must be >= 0")

    @property
    def compute_jnp_dtype(self):
        return _DTYPES[self.compute_dtype]
