"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's accelerate/DDP/NCCL layer (/root/reference/pretrain_e4t.py:
224-229,409-412; SURVEY.md §2.4).

Data parallelism is expressed as shardings over a 1-D ``dp`` mesh axis:
batches sharded on ``dp``, params replicated (optionally with optimizer
state sharded over ``dp`` — ZeRO-1 — which the reference lacks). XLA SPMD
inserts the gradient all-reduce over ICI; multi-host setups extend the same
mesh over DCN via jax.distributed.initialize.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
TENSOR_AXIS = "tp"


def maybe_initialize_distributed() -> None:
    """Multi-host bootstrap over DCN (jax.distributed) when launched under a
    multi-process coordinator; single-process runs are a no-op. Replaces
    `accelerate launch`'s process-group init (/root/reference/README.md:34).

    On Cloud TPU / Slurm / MPI the cluster is auto-detected by
    jax.distributed.initialize(); for manual launches export
    JAX_COORDINATOR_ADDRESS plus JAX_NUM_PROCESSES and JAX_PROCESS_ID and
    they are passed through explicitly (jax's auto-detection does not read
    the process-count/id pair from the environment on bare hosts).
    Exercised for real by tests/test_distributed.py: two CPU processes
    forming one 4-device mesh with cross-process gradient reduction."""
    import os

    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if not addr:
        return
    kwargs = {}
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if (nproc is None) != (pid is None):
        # advisor r2: a half-configured manual launch used to fall into
        # auto-detection, fail, be swallowed, and silently run
        # single-process — a hard-to-spot degraded multi-host job
        raise RuntimeError(
            "[mesh] JAX_COORDINATOR_ADDRESS is set but only one of "
            "JAX_NUM_PROCESSES/JAX_PROCESS_ID is — set both (or neither, "
            "on a cluster jax can auto-detect)")
    if nproc is not None:
        kwargs = dict(coordinator_address=addr, num_processes=int(nproc),
                      process_id=int(pid))
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        if "already" in str(e).lower():  # re-init in the same process
            print(f"[mesh] jax.distributed.initialize skipped: {e}")
            return
        # the coordinator address was explicitly configured: failing to
        # join the cluster must not degrade to a silent single-process run
        raise RuntimeError(
            f"[mesh] jax.distributed.initialize failed for explicitly "
            f"configured coordinator {addr!r}: {e}") from e


def get_mesh(num_devices: Optional[int] = None, tp: int = 1) -> Mesh:
    """Device mesh. ``tp=1`` (default) is the reference-parity pure-DP
    layout; ``tp>1`` folds the devices into a (dp, tp) grid for optional
    tensor parallelism over the UNet transformer sites (beyond reference
    parity — SURVEY.md §2.4 lists TP as absent upstream). The mesh is
    always 2-D so ``P("dp")`` batch specs work unchanged in both modes."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    grid = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(grid, (DATA_AXIS, TENSOR_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place host arrays so the leading axis is split across ``dp``.
    Rank-0 leaves and axes not divisible by the mesh are replicated."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    n = mesh.devices.size

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def zero1_sharding(tree, mesh: Mesh):
    """ZeRO-1: place optimizer-state leaves sharded over ``dp`` on their
    largest dp-divisible axis (replicated otherwise). The reference has no
    state sharding at all (plain DDP, SURVEY.md §2.4); with N chips this
    cuts optimizer-state HBM by ~N.

    Returns a pytree of NamedShardings aligned with ``tree`` — use as
    jit in_shardings/out_shardings or with jax.device_put.
    """
    n = mesh.devices.size
    rep = replicated(mesh)

    def spec(x):
        shape = getattr(x, "shape", ())
        for axis, dim in enumerate(shape):
            if dim % n == 0 and dim >= n:
                parts = [None] * len(shape)
                parts[axis] = DATA_AXIS
                return NamedSharding(mesh, P(*parts))
        return rep

    return jax.tree_util.tree_map(spec, tree)


def apply_zero1(opt_state, mesh: Mesh):
    """device_put the optimizer state with ZeRO-1 shardings."""
    shardings = zero1_sharding(opt_state, mesh)
    return jax.tree_util.tree_map(jax.device_put, opt_state, shardings)


def tensor_parallel_specs(params, mesh: Mesh):
    """PartitionSpecs for tensor parallelism over the UNet transformer
    sites (Megatron-style; beyond reference parity — SURVEY.md §2.4 lists
    TP as absent upstream).

    Column-parallel (output dim on ``tp``): to_q/to_k/to_v, ff net_0_proj,
    proj_in. Row-parallel (input dim on ``tp``): to_out_0, ff net_2,
    proj_out. Everything else (convs, norms, time embeddings) is
    replicated; XLA SPMD propagates activation shardings from the param
    shardings and inserts the reduce collectives over ICI — no manual
    psum. Works for both Dense kernels (2-D) and the 1x1-conv
    proj_in/proj_out form (4-D, feature axes last).

    Returns a pytree of NamedShardings aligned with ``params``; use with
    jax.device_put (or as jit in_shardings). With tp=1 meshes this
    degenerates to replication.
    """
    col_parallel = ("to_q", "to_k", "to_v", "net_0_proj", "proj_in")
    row_parallel = ("to_out_0", "net_2", "proj_out")
    rep = replicated(mesh)

    def spec(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "kernel" not in keys[-1:]:
            # biases: shard along tp only for column-parallel outputs
            if len(keys) >= 2 and keys[-2] in col_parallel \
                    and keys[-1] == "bias":
                return NamedSharding(mesh, P(TENSOR_AXIS))
            return rep
        owner = keys[-2] if len(keys) >= 2 else ""
        ndim = getattr(leaf, "ndim", 0)
        if owner in col_parallel:
            parts = [None] * ndim
            parts[-1] = TENSOR_AXIS  # (.., in, out) -> shard out
            return NamedSharding(mesh, P(*parts))
        if owner in row_parallel:
            parts = [None] * ndim
            parts[-2] = TENSOR_AXIS  # shard in
            return NamedSharding(mesh, P(*parts))
        return rep

    return jax.tree_util.tree_map_with_path(spec, params)


def apply_tensor_parallel(params, mesh: Mesh):
    """device_put ``params`` with tensor-parallel shardings."""
    specs = tensor_parallel_specs(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, specs)


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Per-process slice size for input pipelines (replaces webdataset
    split_by_node, /root/reference/pretrain_e4t.py:310-312)."""
    n = mesh.devices.size
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} devices")
    return global_batch // jax.process_count()
