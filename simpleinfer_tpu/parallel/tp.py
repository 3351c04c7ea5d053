"""Hand-scheduled tensor-parallel matmuls under `shard_map`.

The declarative path (parallel/mesh.py + ops' shard_hints) lets GSPMD
place collectives; this module is the EXPLICIT alternative (SURVEY.md
§2.5 "exposed via shard_map where explicit overlap with compute is
needed — the collective-matmul pattern"): the collective schedule is
written out by hand so compute can hide communication latency, the way
the reference hand-schedules its 16 Winograd-domain GEMMs over a thread
pool (/root/reference/src/layer/conv_2d.cpp:451-467) instead of letting
Eigen pick.

Two megatron-style shardings for `y = x @ w (+ b)`:

- **column** (`tp_linear_column`): w [K, N] sharded on N. Pure local
  compute, output sharded on N — zero communication. The standard first
  half of a megatron MLP pair.
- **row** (`tp_linear_row`): x sharded on K, w sharded on K. Each
  device holds a PARTIAL [M, N] product; the reduction runs as a ring
  of `lax.ppermute` hops interleaved with the local matmul's column
  chunks (the collective-matmul / "decomposed all-reduce" schedule):
  chunk c's partial rides the ring while chunk c+1 is still on the MXU,
  so on a real slice the ICI transfer hides behind compute. The result
  is a ring all-reduce (deterministic neighbor-sum order, NOT XLA's
  all-reduce tree — f32 sums differ by ~1 ulp from GSPMD's).

Correctness is CI-tested on the simulated 8-device CPU mesh against
numpy and against the GSPMD-declarative einsum; the compiled HLO is
asserted to contain `collective-permute` (the explicit ring) and no
`all-reduce` (tests/test_parallel.py). Perf validation needs a real
multi-chip slice (unavailable here — docs/BASELINE_RESULTS.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .mesh import AXIS_MODEL


def tp_linear_column(x, w, bias=None, *, mesh: Mesh,
                     axis: str = AXIS_MODEL,
                     batch_axis: str | None = None):
    """Column-parallel linear: w [K, N] arrives sharded on N (axis
    `axis`), x replicated over `axis`; returns y [..., N] sharded on N.
    No communication — the fan-out half of a megatron pair.
    `batch_axis` additionally shards x's leading dim (DP x TP on one
    mesh: each (data, model) device holds its batch shard and its
    weight shard)."""
    nd = x.ndim - 1
    x_spec = P(batch_axis, *([None] * (nd - 1)), None)
    out_spec = P(batch_axis, *([None] * (nd - 1)), axis)

    def local(xb, wb, *bb):
        y = jnp.einsum("...k,kn->...n", xb, wb,
                       preferred_element_type=jnp.float32)
        if bb:
            y = y + bb[0]
        return y.astype(xb.dtype)

    args, in_specs = [x, w], [x_spec, P(None, axis)]
    if bias is not None:
        args.append(bias)
        in_specs.append(P(axis))
    return shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                     out_specs=out_spec)(*args)


def tp_linear_row(x, w, bias=None, *, mesh: Mesh, axis: str = AXIS_MODEL,
                  chunks: int | None = None,
                  batch_axis: str | None = None):
    """Row-parallel linear with an explicit ring all-reduce overlapped
    against the local matmul (collective-matmul).

    x [..., K] sharded on K over `axis`; w [K, N] sharded on K; output
    replicated. The local [M, N] partial is computed in `chunks` column
    chunks (default: the axis size); each chunk's ring starts as soon
    as that chunk's matmul retires, so hop h of chunk c overlaps the
    matmul of chunk c+1 — XLA's async collective-permute start/done
    pairs make the overlap real on TPU.
    """
    p = mesh.shape[axis]
    n = w.shape[1]
    nc = max(1, min(chunks or p, n))
    perm = [(j, (j + 1) % p) for j in range(p)]
    step = n // nc

    def local(xb, wb, *bb):
        # split the local partial into column chunks; ring-reduce each
        outs = []
        for i in range(nc):
            cw = wb[:, i * step:] if i == nc - 1 \
                else wb[:, i * step:(i + 1) * step]
            part = jnp.einsum("...k,kn->...n", xb, cw,
                              preferred_element_type=jnp.float32)
            acc = part
            for _ in range(p - 1):
                part = jax.lax.ppermute(part, axis, perm)
                acc = acc + part
            outs.append(acc)
        y = jnp.concatenate(outs, axis=-1) if nc > 1 else outs[0]
        if bb:
            y = y + bb[0]
        return y.astype(xb.dtype)

    nd = x.ndim - 1
    args = [x, w]
    in_specs = [P(batch_axis, *([None] * (nd - 1)), axis), P(axis, None)]
    if bias is not None:
        args.append(bias)
        in_specs.append(P())
    # check_rep=False: after p-1 ring hops every device holds the full
    # sum over `axis` (replicated by the ring's MATH) — shard_map's
    # static replication checker cannot see through ppermute
    return shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                     out_specs=P(batch_axis, *([None] * nd)),
                     check_rep=False)(*args)


def tp_mlp(x, w1, b1, w2, b2, *, mesh: Mesh, axis: str = AXIS_MODEL,
           act=jax.nn.gelu, batch_axis: str | None = None):
    """A full megatron MLP pair: column-parallel fan-out (no comm) ->
    activation on the shard -> row-parallel fan-in (one overlapped ring
    all-reduce). ONE collective round for the whole block — the
    schedule GSPMD usually finds, here guaranteed by construction.
    `batch_axis` composes the pair with data parallelism (the TP ring
    then runs inside each data replica)."""
    h = tp_linear_column(x, w1, b1, mesh=mesh, axis=axis,
                         batch_axis=batch_axis)

    def local_act(hb):
        return act(hb.astype(jnp.float32)).astype(hb.dtype)

    nd = x.ndim - 1
    spec = P(batch_axis, *([None] * (nd - 1)), axis)
    h = shard_map(local_act, mesh=mesh, in_specs=(spec,),
                  out_specs=spec)(h)
    return tp_linear_row(h, w2, b2, mesh=mesh, axis=axis,
                         batch_axis=batch_axis)


def shard_tp_weights(mesh: Mesh, w1, b1, w2, b2, axis: str = AXIS_MODEL):
    """Place megatron-pair weights for tp_mlp: w1/b1 column-sharded,
    w2 row-sharded, b2 replicated."""
    put = jax.device_put
    return (put(w1, NamedSharding(mesh, P(None, axis))),
            put(b1, NamedSharding(mesh, P(axis)))
            if b1 is not None else None,
            put(w2, NamedSharding(mesh, P(axis, None))),
            put(b2, NamedSharding(mesh, P()))
            if b2 is not None else None)


# ---- convs (the conv+epilogue analog of the collective-matmul plan,
#      SURVEY.md §2.5 comm-backend row) ----------------------------------
def _conv_nhwc(x, w, *, stride=(1, 1), padding="SAME"):
    from jax import lax

    return lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def tp_conv_column(x, w, bias=None, *, mesh: Mesh, axis: str = AXIS_MODEL,
                   stride=(1, 1), padding="SAME"):
    """Output-channel-parallel conv: w [KH, KW, CI, CO] sharded on CO,
    x replicated; returns NHWC output sharded on C. No communication —
    the fan-out half of a conv pair (e.g. a bottleneck's 1x1)."""
    out_spec = P(None, None, None, axis)

    def local(xb, wb, *bb):
        y = _conv_nhwc(xb, wb, stride=stride, padding=padding)
        if bb:
            y = y + bb[0]
        return y.astype(xb.dtype)

    args, in_specs = [x, w], [P(), P(None, None, None, axis)]
    if bias is not None:
        args.append(bias)
        in_specs.append(P(axis))
    return shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                     out_specs=out_spec)(*args)


def tp_conv_row(x, w, bias=None, *, mesh: Mesh, axis: str = AXIS_MODEL,
                stride=(1, 1), padding="SAME", chunks: int | None = None):
    """Input-channel-parallel conv with the overlapped ring all-reduce
    (collective-matmul applied to conv): x NHWC sharded on C, w
    [KH, KW, CI, CO] sharded on CI, output replicated. The local
    partial is computed in output-channel chunks; chunk c's ring rides
    the ICI while chunk c+1's conv is on the MXU."""
    p = mesh.shape[axis]
    co = w.shape[3]
    nc = max(1, min(chunks or p, co))
    perm = [(j, (j + 1) % p) for j in range(p)]
    step = co // nc

    def local(xb, wb, *bb):
        outs = []
        for i in range(nc):
            cw = wb[..., i * step:] if i == nc - 1 \
                else wb[..., i * step:(i + 1) * step]
            part = _conv_nhwc(xb, cw, stride=stride, padding=padding)
            acc = part
            for _ in range(p - 1):
                part = jax.lax.ppermute(part, axis, perm)
                acc = acc + part
            outs.append(acc)
        y = jnp.concatenate(outs, axis=-1) if nc > 1 else outs[0]
        if bb:
            y = y + bb[0]
        return y.astype(xb.dtype)

    args = [x, w]
    in_specs = [P(None, None, None, axis), P(None, None, axis, None)]
    if bias is not None:
        args.append(bias)
        in_specs.append(P())
    # see tp_linear_row: the ring replicates by math, not by types
    return shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                     out_specs=P(), check_rep=False)(*args)


def tp_conv_pair(x, w1, b1, w2, b2, *, mesh: Mesh, axis: str = AXIS_MODEL,
                 act=jax.nn.silu, stride1=(1, 1), stride2=(1, 1)):
    """Megatron-style conv pair (e.g. a C3 bottleneck's 1x1 -> 3x3):
    column-parallel fan-out (no comm) -> activation on the shard ->
    row-parallel fan-in (one overlapped ring all-reduce)."""
    h = tp_conv_column(x, w1, b1, mesh=mesh, axis=axis, stride=stride1)

    def local_act(hb):
        return act(hb.astype(jnp.float32)).astype(hb.dtype)

    spec = P(None, None, None, axis)
    h = shard_map(local_act, mesh=mesh, in_specs=(spec,),
                  out_specs=spec)(h)
    return tp_conv_row(h, w2, b2, mesh=mesh, axis=axis, stride=stride2)


def sp_conv3x3_halo(x, w, bias=None, *, mesh: Mesh, axis: str,
                    act=None):
    """Height-sharded 3x3 stride-1 "same" conv with an EXPLICIT halo
    exchange overlapped against the interior compute — the spatial-
    parallel (SP) conv schedule written out by hand (the declarative
    mesh path lets GSPMD insert its own halos; this is the §2.5
    "explicit overlap" variant for the spatial axis).

    x [N, H, W, C] sharded on H over `axis` (H % devices == 0, local
    H >= 2); w [3, 3, CI, CO] replicated. Each device ppermutes its
    boundary rows to both neighbours FIRST, computes the interior
    output rows (which need no halo) while the transfers fly, then the
    two border rows once the halos land. Edge devices receive ZEROS
    from ppermute's missing partners — exactly the conv's zero padding.
    """
    p = mesh.shape[axis]
    down = [(j, j + 1) for j in range(p - 1)]   # send my LAST row down
    up = [(j, j - 1) for j in range(1, p)]      # send my FIRST row up

    def local(xb, wb, *bb):
        # start both halo transfers before any compute
        top_halo = jax.lax.ppermute(xb[:, -1:], axis, down)  # from above
        bot_halo = jax.lax.ppermute(xb[:, :1], axis, up)     # from below
        # interior rows depend only on local data: W-padded, H-valid
        interior = _conv_nhwc(xb, wb, padding=((0, 0), (1, 1)))
        # border rows: 2 local rows + the arrived halo row each
        # 3 input rows, H-valid -> exactly the one border output row
        top = _conv_nhwc(
            jnp.concatenate([top_halo, xb[:, :2]], axis=1), wb,
            padding=((0, 0), (1, 1)))
        bot = _conv_nhwc(
            jnp.concatenate([xb[:, -2:], bot_halo], axis=1), wb,
            padding=((0, 0), (1, 1)))
        y = jnp.concatenate([top, interior, bot], axis=1)
        if bb:
            y = y + bb[0]
        if act is not None:
            y = act(y.astype(jnp.float32))
        return y.astype(xb.dtype)

    args = [x, w]
    in_specs = [P(None, axis, None, None), P()]
    if bias is not None:
        args.append(bias)
        in_specs.append(P())
    return shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                     out_specs=P(None, axis, None, None))(*args)
