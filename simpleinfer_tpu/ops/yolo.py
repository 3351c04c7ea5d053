"""models.yolo.Detect lowering — fused YOLOv5 detection head.

Parity with /root/reference/src/layer/yolo_detect.cpp: three feature
levels (P3/P4/P5), each passed through its own 1x1 conv (weights from
attrs ``m.{0,1,2}.weight/bias``, yolo_detect.cpp:31-76), sigmoid, reshaped
to [N, H*W*A, n_info], decoded as

    xy = (sig(xy) * 2 + grid) * stride          (yolo_detect.cpp:258-260)
    wh = (sig(wh) * 2)^2 * anchor_grid          (:261-263)

then concatenated along the box dim. Strides come from attr ``pnnx_5``,
anchor grids from attrs ``pnnx_{4,2,0}`` and grids from ``pnnx_{6,3,1}``
(level order per anchor_index/grid_index, yolo_detect.h:28-29), each
stored [1, A, H, W, 2] and pre-reshaped at load to [1, H*W*A, 2] via the
(0,2,3,1,4) shuffle (yolo_detect.cpp:109-112).

The decode is kept in plain jnp (bandwidth-trivial vs the convs) per
SURVEY.md §7 hard-parts note.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import jax

from .conv import conv2d_nhwc
from .registry import OpImpl, register_op, require_attr

_ANCHOR_ATTR_INDEX = (4, 2, 0)  # yolo_detect.h:28
_GRID_ATTR_INDEX = (6, 3, 1)  # yolo_detect.h:29
_NUM_LEVELS = 3

# debug/A-B switch: decode once after the level concat (bf16 logits
# concat, stride folded into tables) vs per-level f32 decode before it.
# MEASURED LOSER on v5e yolov5s-640-b8 despite halving concat traffic
# (scripts/head_decode_experiment.py: per-level 1.56-1.89 ms vs
# after-concat 1.80-2.06 ms paired; the per-level decode fuses into the
# head conv epilogues, the post-concat decode adds a standalone 100 MB
# read-write fusion). Kept as a documented negative result.
_DECODE_AFTER_CONCAT = False


@register_op("models.yolo.DetectV8")
def lower_yolo_detect_v8(op, cfg):
    """Anchor-free YOLOv8-style decode (no reference analog — the
    reference supports only the anchor-based v5 head; this extends the
    model-family surface). Inputs: one [N, H, W, 4*reg_max+nc] map per
    level (NHWC at runtime). Decode per ultralytics v8:

        dist = softmax(box.reshape(..., 4, reg_max)) @ arange(reg_max)
        xy   = ((anchor+0.5) + (rb-lt)/2) * stride        (cell centers)
        wh   = (lt + rb) * stride
        out  = concat([xy, wh, sigmoid(cls)], -1)  ->  [N, total, 4+nc]
    """
    from .registry import require_param
    from ..ir.graph import PARAM_INT

    nc = require_param(op, "nc", PARAM_INT).i
    reg_max = require_param(op, "reg_max", PARAM_INT).i
    strides = require_attr(op, "strides", 1).array().astype(np.float32)
    n_levels = len(op.inputs)
    if strides.shape != (n_levels,):
        raise ValueError(f"DetectV8 {op.name}: strides {strides.shape} "
                         f"vs {n_levels} levels")
    no = 4 * reg_max + nc
    bins = jnp.arange(reg_max, dtype=jnp.float32)

    def apply(weights, *features):
        outs = []
        for i, x in enumerate(features):
            n, h, w_, c = x.shape
            if c != no:
                raise ValueError(
                    f"DetectV8 {op.name}: level {i} has {c} channels, "
                    f"expected {no}")
            x = x.astype(jnp.float32).reshape(n, h * w_, c)
            box, cls = x[..., :4 * reg_max], x[..., 4 * reg_max:]
            # DFL: softmax over reg_max bins -> expected distance
            d = jax.nn.softmax(box.reshape(n, h * w_, 4, reg_max), -1)
            d = jnp.einsum("nahr,r->nah", d, bins)  # [N, HW, 4] ltrb
            xv, yv = np.meshgrid(np.arange(w_), np.arange(h))
            anchor = jnp.asarray(
                np.stack([xv, yv], -1).reshape(1, h * w_, 2)
                .astype(np.float32) + 0.5)
            lt, rb = d[..., :2], d[..., 2:]
            xy = (anchor + (rb - lt) * 0.5) * strides[i]
            wh = (lt + rb) * strides[i]
            outs.append(jnp.concatenate(
                [xy, wh, jax.nn.sigmoid(cls)], -1))
        return jnp.concatenate(outs, axis=1)

    return OpImpl(name=op.name, type=op.type, apply=apply, weights={},
                  flops_per_item=0)


@register_op("models.yolo.Detect")
def lower_yolo_detect(op, cfg):
    strides = require_attr(op, "pnnx_5", 1).array().astype(np.float32)
    if strides.shape != (_NUM_LEVELS,):
        raise ValueError(f"YoloDetect {op.name}: bad strides {strides.shape}")

    weights: dict = {}
    num_anchors = None
    num_info = None
    level_consts: list = []  # (hw, gridc, anchorc) per level
    for i in range(_NUM_LEVELS):
        w = require_attr(op, f"m.{i}.weight", 1).array()  # [E, C, 1, 1] OIHW
        b = require_attr(op, f"m.{i}.bias", 1).array()
        if w.shape[2] != 1 or w.shape[3] != 1:
            raise ValueError(f"YoloDetect {op.name}: head conv m.{i} must be "
                             f"1x1, got {w.shape}")
        weights[f"w{i}"] = np.ascontiguousarray(
            np.transpose(w, (2, 3, 1, 0))).astype(np.float32)  # HWIO
        weights[f"b{i}"] = b.astype(np.float32)

        ag = require_attr(op, f"pnnx_{_ANCHOR_ATTR_INDEX[i]}", 1).array()
        gr = require_attr(op, f"pnnx_{_GRID_ATTR_INDEX[i]}", 1).array()
        for name, t in (("anchor_grid", ag), ("grid", gr)):
            if t.ndim != 5 or t.shape[0] != 1 or t.shape[4] != 2:
                raise ValueError(f"YoloDetect {op.name}: bad {name} shape "
                                 f"{t.shape} at level {i}")
        if ag.shape != gr.shape:
            raise ValueError(f"YoloDetect {op.name}: grid/anchor shape "
                             f"mismatch at level {i}")
        a = ag.shape[1]
        if num_anchors is None:
            num_anchors = a
        elif num_anchors != a:
            raise ValueError(f"YoloDetect {op.name}: anchor count varies")
        e = w.shape[0]
        if num_info is None:
            if e % a != 0:
                raise ValueError(f"YoloDetect {op.name}: head width {e} not "
                                 f"divisible by anchors {a}")
            num_info = e // a
        elif num_info != e // a:
            raise ValueError(f"YoloDetect {op.name}: head width varies")
        ni = e // a
        # Decode constants in the CHANNEL-PACKED [H*W, A*ni] domain (see
        # apply): gridc[p, a*ni+j] = grid[a, p, j] for j<2; anchorc[p,
        # a*ni+2+j] = anchor[a, p, j]. Keeping the decode in the packed
        # layout lets XLA fuse it into the head conv's epilogue instead
        # of re-tiling [N,HW,A*ni] -> [N,HWA,ni] twice (a measured
        # ~0.7 ms copy per forward at 640); the one re-tile happens at
        # the very end.
        hw = ag.shape[2] * ag.shape[3]
        gridc = np.zeros((hw, e), np.float32)
        anchorc = np.zeros((hw, e), np.float32)
        gr2 = gr.reshape(a, hw, 2)  # [A,H,W,2] -> [A, H*W, 2]
        ag2 = ag.reshape(a, hw, 2)
        for ai in range(a):
            gridc[:, ai * ni + 0] = gr2[ai, :, 0]
            gridc[:, ai * ni + 1] = gr2[ai, :, 1]
            anchorc[:, ai * ni + 2] = ag2[ai, :, 0]
            anchorc[:, ai * ni + 3] = ag2[ai, :, 1]
        level_consts.append((hw, gridc, anchorc))

    strides_list = [float(s) for s in strides]
    # ONE decode for all levels, AFTER the level concat (the per-level
    # f32 decode outputs used to be copied into the concat fusion —
    # 3 f32 copies, ~68 MB/forward at 640; concatenating the bf16
    # logits first halves that traffic and fuses the decode once).
    # Stride folds into the constants: (y*2+grid)*stride = y*(2*stride)
    # + grid*stride and (y*2)^2*anchor = y^2*(4*anchor), so rows of the
    # concatenated tables carry their level's stride (reference decode:
    # yolo_detect.cpp:204-271).
    if _DECODE_AFTER_CONCAT:
        weights["dec_ga"] = np.concatenate(
            [g * s for (_, g, _), s in zip(level_consts, strides_list)])
        weights["dec_ac"] = np.concatenate(
            [4.0 * ac for (_, _, ac) in level_consts])
        weights["dec_sc"] = np.concatenate(
            [np.full((hw, 1), 2.0 * s, np.float32)
             for (hw, _, _), s in zip(level_consts, strides_list)])
    else:
        # per-level decode constants (see flag above)
        for i, (_, g, ac) in enumerate(level_consts):
            weights[f"gridc{i}"] = g
            weights[f"anchorc{i}"] = ac
    na, ni = num_anchors, num_info
    chan = np.arange(na * ni) % ni
    xy_mask = jnp.asarray(chan < 2)
    wh_mask = jnp.asarray((chan >= 2) & (chan < 4))

    # When the decode output IS the graph output, the final
    # [N,HW,A*ni] -> [N,HWA,ni] re-tile (a ~150 us physical retile of a
    # 68 MB f32 tensor under TPU (8,128) tiling — %copy.20 in the
    # yolov5s trace) moves to the HOST: the packed concat's row-major
    # byte order equals the logical output's exactly, so np.reshape of
    # the fetched array is free. Engine.extract applies it
    # (Program.output_transforms); on-device consumers of extract(...,
    # as_numpy=False) get a jnp.reshape instead (same cost as before).
    terminal = all(c.type == "pnnx.Output"
                   for c in op.outputs[0].consumers) if op.outputs else False

    def apply(weights, *features):
        if len(features) != _NUM_LEVELS:
            raise ValueError("YoloDetect expects 3 feature maps")
        outs = []
        for i, x in enumerate(features):
            y = conv2d_nhwc(x, weights[f"w{i}"], weights[f"b{i}"])
            n, h, w_, c = y.shape
            if _DECODE_AFTER_CONCAT:
                # raw logits at the compute dtype; reshape is free
                # (lane dim unchanged) and the concat moves half the
                # bytes of the old f32 per-level decode outputs
                outs.append(y.reshape(n, h * w_, c))
                continue
            y = jax.nn.sigmoid(y).astype(jnp.float32)
            y = y.reshape(n, h * w_, c)
            xy = (y * 2.0 + weights[f"gridc{i}"]) * strides_list[i]
            wh = jnp.square(y * 2.0) * weights[f"anchorc{i}"]
            outs.append(jnp.where(xy_mask, xy, jnp.where(wh_mask, wh, y)))
        # one concat + ONE re-tile for all levels: rows of level L map to
        # rows 3p..3p+2 contiguously, so the packed concat reshapes
        # row-major to exactly the [N, sum(HWA), ni] output
        out = jnp.concatenate(outs, axis=1)
        if _DECODE_AFTER_CONCAT:
            # single fused decode in the channel-packed [N, ΣHW, A*ni]
            # domain (sigmoid in f32 — at least as accurate as the old
            # per-level bf16 sigmoid)
            yf = jax.nn.sigmoid(out.astype(jnp.float32))
            xy = yf * weights["dec_sc"] + weights["dec_ga"]
            wh = jnp.square(yf) * weights["dec_ac"]
            out = jnp.where(xy_mask, xy, jnp.where(wh_mask, wh, yf))
        if terminal:
            return out  # host reshapes for free (see above)
        return out.reshape(out.shape[0], out.shape[1] * na, ni)

    return OpImpl(
        name=op.name, type=op.type, apply=apply, weights=weights,
        host_output_retile=na if terminal else None,
        quantizable={},  # head convs are accuracy-critical; keep fp
        # decode constants and head biases stay f32: grid coords up to
        # ~80 would quantize to 0.25-cell steps in bf16 (8-px boxes at
        # stride 32); the decode arithmetic runs in f32 via the explicit
        # astype above
        fp32_keys=tuple(k for k in weights
                        if k[0] in "abdg"),  # b*, dec_*, gridc*, anchorc*
    )
