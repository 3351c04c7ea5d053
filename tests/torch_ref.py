"""Independent pnnx-graph interpreter in torch (CPU, NCHW).

The whole-model analog of the reference's naive-loop oracles (SURVEY.md
§4.1): every op is re-implemented through torch.nn.functional on NCHW
tensors — a completely separate code path from the framework's NHWC
jax/XLA lowering — so an end-to-end match validates layout conversion,
weight transforms, expression expansion and executor wiring at once.
Test-only; the framework itself never imports torch.
"""
import numpy as np
import torch
import torch.nn.functional as F


def _t(a):
    return torch.from_numpy(np.ascontiguousarray(a)).float()


def _conv2d(op, x):
    w = _t(op.attrs["weight"].array())
    b = _t(op.attrs["bias"].array()) if op.params["bias"].b else None
    if op.params["padding_mode"].s != "zeros":
        pad = op.params["padding"].ai
        x = F.pad(x, (pad[1], pad[1], pad[0], pad[0]),
                  mode={"replicate": "replicate",
                        "reflect": "reflect"}[op.params["padding_mode"].s])
        padding = [0, 0]
    else:
        padding = op.params["padding"].ai
    return F.conv2d(x, w, b, stride=op.params["stride"].ai,
                    padding=padding, dilation=op.params["dilation"].ai,
                    groups=op.params["groups"].i)


def _conv_transpose2d(op, x):
    w = _t(op.attrs["weight"].array())  # IOHW
    b = _t(op.attrs["bias"].array()) if op.params["bias"].b else None
    opad = (op.params["output_padding"].ai
            if "output_padding" in op.params else [0, 0])
    dil = (op.params["dilation"].ai
           if "dilation" in op.params else [1, 1])
    return F.conv_transpose2d(
        x, w, b, stride=op.params["stride"].ai,
        padding=op.params["padding"].ai, output_padding=opad,
        groups=op.params["groups"].i, dilation=dil)


def _bn(op, x):
    return F.batch_norm(
        x, _t(op.attrs["running_mean"].array()),
        _t(op.attrs["running_var"].array()),
        _t(op.attrs["weight"].array()), _t(op.attrs["bias"].array()),
        training=False, eps=op.params["eps"].f)


def _maxpool(op, x):
    return F.max_pool2d(
        x, kernel_size=op.params["kernel_size"].ai,
        stride=op.params["stride"].ai, padding=op.params["padding"].ai,
        dilation=op.params["dilation"].ai,
        ceil_mode=op.params["ceil_mode"].b)


def _upsample(op, x):
    if op.has_param("scale_factor", 6) or op.has_param("scale_factor", 3):
        p = op.params["scale_factor"]
        scale = p.af if p.type == 6 else [p.f, p.f]
        return F.interpolate(x, scale_factor=scale, mode="nearest")
    p = op.params["size"]
    size = p.ai if p.type == 5 else [p.i, p.i]
    return F.interpolate(x, size=size, mode="nearest")


def _linear(op, x):
    b = _t(op.attrs["bias"].array()) if op.params["bias"].b else None
    return F.linear(x, _t(op.attrs["weight"].array()), b)


def _mha(op, args):
    p = op.params
    E = p["embed_dim"].i
    kdim = p["kdim"].i if "kdim" in p else None
    vdim = p["vdim"].i if "vdim" in p else None
    has_bias = "in_proj_bias" in op.attrs
    m = torch.nn.MultiheadAttention(
        E, p["num_heads"].i, bias=has_bias,
        batch_first=p["batch_first"].b if "batch_first" in p else False,
        kdim=kdim, vdim=vdim).eval()
    sd = {k: _t(op.attrs[k].array()) for k in op.attrs}
    m.load_state_dict(sd, strict=False)
    # mirror the lowering's mask heuristic (ops/attention.py): a
    # trailing rank-2 operand (or one whose last dim is not the k/v
    # feature dim) is attn_mask, not a k/v input
    args = list(args)
    mask = None
    if len(args) == 4:
        mask = args.pop()
    elif len(args) in (2, 3):
        expect = (kdim or E) if len(args) == 2 else (vdim or E)
        if args[-1].ndim == 2 or args[-1].shape[-1] != expect:
            mask = args.pop()
    q = args[0]
    k = args[1] if len(args) > 1 else q
    v = args[2] if len(args) > 2 else k
    with torch.no_grad():
        out, _ = m(q, k, v, attn_mask=mask, need_weights=False)
    return out


def _expression(op, args):
    expr = op.params["expr"].s
    if expr == "add(@0,@1)":
        return args[0] + args[1]
    if expr == "mul(@0,@1)":
        return args[0] * args[1]
    raise NotImplementedError(f"torch oracle: expression {expr!r}")


def _yolo_detect(op, features):
    strides = op.attrs["pnnx_5"].array()
    anchor_idx, grid_idx = (4, 2, 0), (6, 3, 1)
    outs = []
    for i, x in enumerate(features):
        w = _t(op.attrs[f"m.{i}.weight"].array())
        b = _t(op.attrs[f"m.{i}.bias"].array())
        ag = op.attrs[f"pnnx_{anchor_idx[i]}"].array()  # [1,A,H,W,2]
        gr = op.attrs[f"pnnx_{grid_idx[i]}"].array()
        na = ag.shape[1]
        y = torch.sigmoid(F.conv2d(x, w, b))
        n, c, h, wd = y.shape
        no = c // na
        # NCHW [N, A*no, H, W] -> [N, H*W*A, no] in (h, w, a) order,
        # matching the engine's NHWC reshape
        y = (y.view(n, na, no, h, wd).permute(0, 3, 4, 1, 2)
             .reshape(n, h * wd * na, no))
        grid = _t(np.transpose(gr, (0, 2, 3, 1, 4)).reshape(1, -1, 2))
        anch = _t(np.transpose(ag, (0, 2, 3, 1, 4)).reshape(1, -1, 2))
        xy = (y[..., 0:2] * 2.0 + grid) * float(strides[i])
        wh = (y[..., 2:4] * 2.0) ** 2 * anch
        outs.append(torch.cat([xy, wh, y[..., 4:]], dim=-1))
    return torch.cat(outs, dim=1)


_ACTS = {
    "nn.ReLU": F.relu, "F.relu": F.relu,
    "nn.Sigmoid": torch.sigmoid, "F.sigmoid": torch.sigmoid,
    "nn.SiLU": F.silu, "F.silu": F.silu,
    "nn.Hardsigmoid": F.hardsigmoid, "F.hardsigmoid": F.hardsigmoid,
    "nn.Hardswish": F.hardswish, "F.hardswish": F.hardswish,
    "nn.GELU": F.gelu,
}


@torch.no_grad()
def _yolo_detect_v8(op, features):
    """Anchor-free v8 decode (independent re-derivation from the
    ultralytics formula): DFL expectation -> ltrb -> xywh * stride."""
    nc = op.params["nc"].i
    reg_max = op.params["reg_max"].i
    strides = op.attrs["strides"].array()
    bins = torch.arange(reg_max, dtype=torch.float32)
    outs = []
    for i, x in enumerate(features):  # [N, no, H, W]
        n, c, h, w = x.shape
        x = x.reshape(n, c, h * w).permute(0, 2, 1)  # [N, HW, no]
        box, cls = x[..., :4 * reg_max], x[..., 4 * reg_max:]
        d = torch.softmax(box.reshape(n, h * w, 4, reg_max), -1) @ bins
        xv, yv = np.meshgrid(np.arange(w), np.arange(h))
        anchor = _t(np.stack([xv, yv], -1).reshape(1, h * w, 2)
                    .astype(np.float32) + 0.5)
        lt, rb = d[..., :2], d[..., 2:]
        xy = (anchor + (rb - lt) * 0.5) * float(strides[i])
        wh = (lt + rb) * float(strides[i])
        outs.append(torch.cat([xy, wh, torch.sigmoid(cls)], -1))
    return torch.cat(outs, dim=1)


def run_graph_torch(graph, feeds_nchw):
    """Execute a pnnx ir.Graph on torch CPU. feeds/results are NCHW
    numpy arrays keyed by operand name."""
    env = {k: _t(v) for k, v in feeds_nchw.items()}
    outputs = []
    for op in graph.ops:
        if op.type == "pnnx.Input":
            continue
        if op.type == "pnnx.Output":
            outputs.extend(r.name for r in op.inputs)
            continue
        args = [env[r.name] for r in op.inputs]
        t = op.type
        if t == "nn.Conv2d":
            out = _conv2d(op, args[0])
        elif t == "nn.ConvTranspose2d":
            out = _conv_transpose2d(op, args[0])
        elif t == "nn.BatchNorm2d":
            out = _bn(op, args[0])
        elif t in _ACTS:
            out = _ACTS[t](args[0])
        elif t == "nn.MaxPool2d":
            out = _maxpool(op, args[0])
        elif t == "nn.AvgPool2d":
            p_ = op.params
            out = F.avg_pool2d(
                args[0], p_["kernel_size"].ai, p_["stride"].ai,
                p_["padding"].ai, ceil_mode=p_["ceil_mode"].b,
                count_include_pad=p_["count_include_pad"].b)
        elif t == "nn.AdaptiveAvgPool2d":
            out = F.adaptive_avg_pool2d(args[0], op.params["output_size"].ai)
        elif t in ("nn.Upsample", "nn.UpsamplingNearest2d"):
            out = _upsample(op, args[0])
        elif t == "torch.cat":
            out = torch.cat(args, dim=op.params["dim"].i)
        elif t == "torch.flatten":
            out = torch.flatten(args[0], op.params["start_dim"].i,
                                op.params["end_dim"].i)
        elif t == "nn.Linear":
            out = _linear(op, args[0])
        elif t == "torch.permute":
            out = args[0].permute(*op.params["dims"].ai)
        elif t == "nn.LayerNorm":
            p = op.params
            out = F.layer_norm(
                args[0], p["normalized_shape"].ai,
                _t(op.attrs["weight"].array())
                if p["elementwise_affine"].b else None,
                _t(op.attrs["bias"].array())
                if p["elementwise_affine"].b else None, p["eps"].f)
        elif t == "nn.GroupNorm":
            p = op.params
            out = F.group_norm(
                args[0], p["num_groups"].i,
                _t(op.attrs["weight"].array()) if p["affine"].b else None,
                _t(op.attrs["bias"].array()) if p["affine"].b else None,
                p["eps"].f)
        elif t == "nn.InstanceNorm2d":
            p = op.params
            has_rs = "running_mean" in op.attrs
            out = F.instance_norm(
                args[0],
                running_mean=_t(op.attrs["running_mean"].array())
                if has_rs else None,
                running_var=_t(op.attrs["running_var"].array())
                if has_rs else None,
                use_input_stats=not has_rs,
                weight=_t(op.attrs["weight"].array())
                if p["affine"].b else None,
                bias=_t(op.attrs["bias"].array())
                if p["affine"].b else None, eps=p["eps"].f)
        elif t == "pnnx.Expression":
            out = _expression(op, args)
        elif t == "models.yolo.Detect":
            out = _yolo_detect(op, args)
        elif t == "models.yolo.DetectV8":
            out = _yolo_detect_v8(op, args)
        elif t == "torch.chunk":
            outs = torch.chunk(args[0], op.params["chunks"].i,
                               op.params["dim"].i)
            for r, o in zip(op.outputs, outs):
                env[r.name] = o
            continue
        elif t == "torch.reshape":
            out = args[0].reshape(*op.params["shape"].ai)
        elif t == "torch.transpose":
            out = args[0].transpose(op.params["dim0"].i,
                                    op.params["dim1"].i)
        elif t == "torch.select":
            out = args[0].select(op.params["dim"].i, op.params["index"].i)
        elif t == "Tensor.expand":
            out = args[0].expand(*op.params["shape"].ai)
        elif t == "pnnx.Attribute":
            (a,) = op.attrs.values()
            out = _t(a.array())
        elif t == "nn.MultiheadAttention":
            out = _mha(op, args)
        elif t == "nn.Embedding":
            out = F.embedding(args[0].long(),
                              _t(op.attrs["weight"].array()))
        elif t == "nn.Tanh":
            out = torch.tanh(args[0])
        else:
            raise NotImplementedError(f"torch oracle: op type {t!r}")
        env[op.outputs[0].name] = out
    return {n: env[n].numpy() for n in outputs}
