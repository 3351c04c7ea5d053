"""REAL multi-process execution of the multi-host layer (localhost).

`parallel.multihost` declares the multi-host idiom (same SPMD program on
every host, `jax.distributed.initialize` over DCN, per-host input
slices assembled with `jax.make_array_from_process_local_data`). This
module EXECUTES that layer as actual separate OS processes on one
machine — the "test multi-node without a real cluster" capability
SURVEY.md §4.4(c) mandates, one step beyond the single-process 8-device
mesh (which validates sharding semantics but never runs
`jax.distributed` or process-local array assembly):

- `launch(task, n_processes, devices_per_process)` spawns N python
  subprocesses, each a JAX *process* with its own CPU device set
  (`--xla_force_host_platform_device_count`), wired together through a
  localhost coordinator. Cross-process collectives run over Gloo — the
  CPU stand-in for DCN.
- each worker runs the SAME task body (SPMD), feeds its OWN batch rows
  through `multihost.host_local_batch`, and all-gathers outputs so
  every rank can save a full result.

Tasks double as receipts: the parent compares rank outputs against a
single-process run of the same mesh shape (tests/test_multiproc.py).

The reference has no analog (strictly single-process, SURVEY.md §2.5);
this is the north-star DCN path of BASELINE.json config 5.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

TASKS = ("cnn", "llm_tp", "cnn_serving")

# cnn_serving stream shape (shared with tests/test_multiproc.py's
# single-process reference): each process serves REQS_PER_RANK requests
# in two admission waves — 4 together (a full bucket-4 batch) then 3
# (bucket-4 with one padded row) — so bucket stats are deterministic.
REQS_PER_RANK = 7
SERVING_WAVES = ((0, 1, 2, 3), (4, 5, 6))


def serving_request(g: int) -> np.ndarray:
    """Deterministic HWC image for GLOBAL request index g (rank r's
    host-local stream is indices [r*REQS_PER_RANK, (r+1)*REQS_PER_RANK))
    — the single-process reference regenerates the identical stream."""
    return ((np.arange(64 * 64 * 3, dtype=np.float32) * (g + 3)) % 23
            ).reshape(64, 64, 3) / 23.0


# --------------------------------------------------------------- launcher
def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(task: str, n_processes: int = 2, devices_per_process: int = 2,
           timeout_s: float = 600.0) -> dict:
    """Run `task` as n_processes real JAX processes; returns the rank-0
    result dict (arrays + metadata) after asserting every rank produced
    an identical result file (SPMD agreement).

    Raises RuntimeError with the worker logs if any rank fails — callers
    that must degrade gracefully (driver dry runs) catch it."""
    if task not in TASKS:
        raise ValueError(f"unknown task {task!r}; tasks are {TASKS}")
    port = _free_port()
    outdir = tempfile.mkdtemp(prefix="si_multiproc_")
    procs = []
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # each child is its own single-controller JAX process: CPU backend
    # (forced again via jax.config in the worker — the TPU PJRT plugin
    # outranks the env var), D virtual devices, no inherited TPU state
    for rank in range(n_processes):
        env = dict(env_base,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS=(f"--xla_force_host_platform_device_count="
                              f"{devices_per_process}"),
                   SI_MP_TASK=task,
                   SI_MP_RANK=str(rank),
                   SI_MP_NPROCS=str(n_processes),
                   SI_MP_COORD=f"127.0.0.1:{port}",
                   SI_MP_OUT=outdir)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "simpleinfer_tpu.parallel.multiproc"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))))
    logs = []
    failed = False
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\n<<timeout>>"
        logs.append(f"--- rank {rank} (rc={p.returncode}) ---\n{out}")
        failed = failed or p.returncode != 0
    if failed:
        raise RuntimeError(
            f"multiproc task {task!r} failed:\n" + "\n".join(logs))
    results = []
    for rank in range(n_processes):
        with np.load(os.path.join(outdir, f"rank{rank}.npz")) as z:
            results.append({k: z[k] for k in z.files})
    r0 = results[0]
    for rank, r in enumerate(results[1:], 1):
        for k in r0:
            np.testing.assert_array_equal(
                r0[k], r[k],
                err_msg=f"rank {rank} result {k!r} diverged from rank 0 "
                        f"(SPMD runs must agree everywhere)")
    r0["n_processes"] = np.asarray(n_processes)
    r0["devices_per_process"] = np.asarray(devices_per_process)
    return r0


# ---------------------------------------------------------------- workers
def _worker_cnn(mesh, rank: int, nprocs: int) -> dict:
    """DP x TP yolov5n forward; every process feeds only ITS batch rows
    (the host-local input pipeline of BASELINE config 5)."""
    from simpleinfer_tpu import Engine, EngineConfig, MeshConfig
    from simpleinfer_tpu.parallel import multihost
    from simpleinfer_tpu.zoo import build_yolov5

    data = int(mesh.shape[multihost.AXIS_DATA])
    model = int(mesh.shape[multihost.AXIS_MODEL])
    cfg = EngineConfig(mesh=MeshConfig(data=data, model=model),
                       compute_dtype="float32")
    graph, in_name, out_name = build_yolov5("n", batch=data,
                                            image_size=64, seed=0)
    eng = Engine(cfg).load_model(None, graph=graph)
    # deterministic global batch, each host staging ONLY its own rows
    full = (np.arange(data * 64 * 64 * 3, dtype=np.float32)
            .reshape(data, 64, 64, 3) % 17) / 17.0
    rows_per_proc = data // nprocs
    local = full[rank * rows_per_proc:(rank + 1) * rows_per_proc]
    batch = multihost.host_local_batch(local, mesh)
    eng.input(in_name, batch)
    eng.forward()
    out = eng.extract(out_name, as_numpy=False)
    from jax.experimental import multihost_utils

    gathered = np.asarray(
        multihost_utils.process_allgather(out, tiled=True))
    return {"out": gathered, "batch_check": np.asarray(
        multihost_utils.process_allgather(batch, tiled=True))}


def _worker_llm_tp(mesh, rank: int, nprocs: int) -> dict:
    """Tensor-parallel greedy decode with the model axis SPANNING
    processes — the attention/MLP all-reduces run over Gloo (the DCN
    stand-in). Mirrors __graft_entry__._dryrun_llm_tp's model setup."""
    from simpleinfer_tpu import Engine, EngineConfig, MeshConfig
    from simpleinfer_tpu.parallel import multihost
    from simpleinfer_tpu.zoo import build_gpt
    from simpleinfer_tpu.zoo.generate import CachedDecoder

    model = int(mesh.shape[multihost.AXIS_MODEL])
    graph, _, _ = build_gpt(variant="nano", batch=1, seq_len=32,
                            vocab_size=64, depth=2, width=32,
                            num_heads=4, seed=0)
    cfg = EngineConfig(mesh=MeshConfig(data=1, model=model),
                       compute_dtype="float32")
    eng = Engine(cfg).load_model(None, graph=graph)
    dec = CachedDecoder(eng)
    toks = dec.generate([[3, 1, 4, 1, 5]], steps=12, temperature=0.0)
    return {"tokens": np.asarray(toks, np.int64)}


def _worker_cnn_serving(rank: int, nprocs: int) -> dict:
    """BASELINE config-5's actual shape: a CONTINUOUS-BATCHED image
    stream across a multi-process slice. Each process runs a
    BatchingService whose DP engine pool is pinned to its OWN local
    devices (serving/batcher.py engine-list mode) and feeds only its
    host-local request slice; the global result stream is assembled
    with process_allgather in global request order. Serving itself runs
    NO collectives — DP pools serve independent batches per device, the
    throughput direction — the distributed runtime provides the process
    topology and the final assembly. Reference: none (north star;
    SURVEY §2.5 DP row + §7.6)."""
    import jax
    from jax.experimental import multihost_utils

    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.serving.batcher import BatchingService
    from simpleinfer_tpu.zoo import build_yolov5

    # one engine per process-LOCAL device, addressed by its GLOBAL
    # device index (EngineConfig.device_index indexes jax.devices())
    local_idx = [i for i, dev in enumerate(jax.devices())
                 if dev.process_index == jax.process_index()]
    engines = []
    for gi in local_idx:
        graph, _in, _out = build_yolov5("n", batch=1, image_size=64,
                                        seed=0)
        engines.append(Engine(EngineConfig(
            compute_dtype="float32", device_index=gi)).load_model(
                None, graph=graph))
    svc = BatchingService(engines, max_batch=4, buckets=[1, 2, 4],
                          max_wait_ms=250.0).start()
    outs = []
    for wave in SERVING_WAVES:
        futs = [svc.submit(serving_request(rank * REQS_PER_RANK + i))
                for i in wave]
        outs += [f.result(timeout=300) for f in futs]
    svc.stop()
    st = svc.stats
    local = np.stack(outs)                        # [REQS_PER_RANK, ...]
    gathered = np.asarray(
        multihost_utils.process_allgather(local, tiled=True))
    return {
        "out": gathered,
        "bucket_stats": np.asarray(sorted(
            (b, s.batches, s.items) for b, s in st.per_bucket.items()),
            np.int64),
        "padded": np.asarray(st.padded_items),
        "requests": np.asarray(st.requests),
        "engines_used": np.asarray(sorted(st.batches_per_engine)),
    }


def worker_main() -> int:
    """Subprocess entry (env-configured): initialize the distributed
    runtime through parallel.multihost — the REAL code path — run the
    task, save this rank's result."""
    task = os.environ["SI_MP_TASK"]
    rank = int(os.environ["SI_MP_RANK"])
    nprocs = int(os.environ["SI_MP_NPROCS"])
    coord = os.environ["SI_MP_COORD"]
    outdir = os.environ["SI_MP_OUT"]

    import jax

    # the TPU PJRT plugin (when installed) outranks JAX_PLATFORMS; pin
    # the CPU backend through jax.config before any backend initializes
    jax.config.update("jax_platforms", "cpu")
    from simpleinfer_tpu.parallel import multihost

    multihost.initialize(coordinator_address=coord,
                         num_processes=nprocs, process_id=rank)
    assert jax.process_count() == nprocs, (
        f"distributed init saw {jax.process_count()} processes, "
        f"expected {nprocs}")
    n_global = len(jax.devices())
    # model axis sized to span processes for llm_tp (cross-process
    # collectives), to stay intra-process for cnn (data crosses hosts —
    # the cheap inference direction)
    if task == "cnn":
        model = 2 if len(jax.local_devices()) >= 2 else 1
        mesh = multihost.make_mesh(model=model)
        res = _worker_cnn(mesh, rank, nprocs)
    elif task == "cnn_serving":
        # no mesh: DP-pool serving is per-device independent batches;
        # the distributed runtime supplies topology + final gather
        res = _worker_cnn_serving(rank, nprocs)
    else:
        mesh = multihost.make_mesh(model=n_global)
        res = _worker_llm_tp(mesh, rank, nprocs)
    res["n_global_devices"] = np.asarray(n_global)
    res["process_count"] = np.asarray(jax.process_count())
    np.savez(os.path.join(outdir, f"rank{rank}.npz"), **res)
    print(json.dumps({"rank": rank, "task": task, "ok": True,
                      "devices": n_global}))
    return 0


if __name__ == "__main__":
    sys.exit(worker_main())
