"""si.FusedC3 lowering — the whole-C3-block VMEM kernel op.

Created by ir/passes.fuse_c3_blocks from the YOLOv5 C3 pattern
(cv1 -> bottlenecks -> cat(cv2) -> cv3, zoo/builders.py c3()); the
kernel (kernels/c3block.py) computes the entire block per image in one
Pallas grid step so HBM sees one input read + one output write instead
of ~11 intermediate round-trips (docs/PERF.md round-5: the config-4
attribution's bandwidth-bound stem region).

Composite-op precedent: the reference folds the whole YOLO head into
one models.yolo.Detect layer (/root/reference/src/layer/
yolo_detect.cpp:31-155); this op plays that role for the C3 block.

Dispatch: the Pallas kernel on a single TPU device; the lax reference
chain (identical semantics, still one op for XLA to fuse aggressively)
on CPU tests, under a mesh, or when shapes fall outside
kernels.c3block.c3_supported. Weights stay float (quantizable={}):
they total < 1 MB per block and the int8-static win lives in the
activations, which never leave VMEM here.
"""
from __future__ import annotations

import numpy as np

from ..ir.graph import PARAM_BOOL, PARAM_INT
from .registry import OpImpl, register_op, require_attr, require_param


@register_op("si.FusedC3")
def lower_fused_c3(op, cfg):
    c_in = require_param(op, "in_channels", PARAM_INT).i
    hid = require_param(op, "hidden_channels", PARAM_INT).i
    oc = require_param(op, "out_channels", PARAM_INT).i
    n_btl = require_param(op, "n_bottlenecks", PARAM_INT).i
    shortcut = require_param(op, "shortcut", PARAM_BOOL).b
    act = (op.params["si_fused_act"].s
           if op.has_param("si_fused_act") else None)

    keys = ("cv1_w", "cv1_b", "cv2_w", "cv2_b", "cv3_w", "cv3_b",
            "btl_a_w", "btl_a_b", "btl_b_w", "btl_b_b")
    weights = {k: require_attr(op, k).array().astype(np.float32)
               for k in keys}
    if weights["cv1_w"].shape != (c_in, hid) \
            or weights["cv3_w"].shape != (2 * hid, oc) \
            or weights["btl_b_w"].shape != (n_btl, 9, hid, hid):
        raise ValueError(f"FusedC3 {op.name}: attr shapes do not match "
                         f"params (c={c_in}, hid={hid}, oc={oc}, "
                         f"T={n_btl})")

    # int8-STATIC engines get the s8 tap path: per-channel-quantized
    # tap weights prepped at load, activations dynamically s8-quantized
    # in-kernel (no calibration needed) — the unfused chain's s8 convs
    # run at 95-171 TFLOP/s, so the fused kernel must use the s8 MXU
    # too or it gives back its traffic win (docs/PERF.md round-5)
    taps_s8 = getattr(cfg, "quant", None) == "int8"
    if taps_s8:
        from ..kernels.c3block import quantize_taps

        wq, wsc = quantize_taps(weights["btl_b_w"])
        weights["btl_b_wq"] = wq
        weights["btl_b_wsc"] = wsc

    # kernel only off-mesh (a pallas_call cannot be GSPMD-partitioned —
    # the house gate) and on a real TPU backend
    mesh_free = getattr(cfg, "mesh", None) is None

    flops_px = 2 * (2 * c_in * hid + n_btl * 10 * hid * hid
                    + 2 * hid * oc)

    def apply(w, x):
        from ..kernels.c3block import (c3_block, c3_block_reference,
                                       c3_profitable, c3_supported,
                                       c3_taps_s8_profitable)
        from ..kernels.matmul import pallas_supported

        dt = x.dtype
        h, ww = x.shape[1], x.shape[2]
        kernel_ok = (mesh_free and pallas_supported()
                     and c3_supported(h, ww, c_in, hid, oc)
                     and c3_profitable(h, ww, hid, n_btl))
        # s8 taps only where measured profitable AND the int8-static
        # contract applies; the fallback reference chain always runs
        # the fp taps (its conv chain IS the unfused engine's math)
        s8 = taps_s8 and kernel_ok and c3_taps_s8_profitable(hid)
        args = (x, w["cv1_w"].astype(dt), w["cv1_b"],
                w["cv2_w"].astype(dt), w["cv2_b"],
                w["cv3_w"][:hid].astype(dt), w["cv3_w"][hid:].astype(dt),
                w["cv3_b"], w["btl_a_w"].astype(dt), w["btl_a_b"],
                w["btl_b_wq"] if s8 else w["btl_b_w"].astype(dt),
                w["btl_b_b"])
        scale = w["btl_b_wsc"] if s8 else None
        if kernel_ok:
            return c3_block(*args, btl_b_scale=scale, activation=act,
                            shortcut=shortcut)
        return c3_block_reference(*args, btl_b_scale=scale,
                                  activation=act, shortcut=shortcut)

    return OpImpl(
        name=op.name, type=op.type, apply=apply, weights=weights,
        flops_per_pixel=flops_px,
        # dequant scales are precision-critical (and tiny)
        fp32_keys=("btl_b_wsc",),
    )
