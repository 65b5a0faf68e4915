"""Device mesh and distributed bring-up.

The reference's distributed substrate is NCCL process groups + DDP + SyncBN
configured inside the entry points (pretrain.py:205-230, 244-253). The
TPU-native replacement: optionally ``jax.distributed.initialize`` for
multi-host, one logical mesh with a ``data`` axis over all chips, batches
sharded on it, parameters replicated. The jitted train step then has global
semantics — XLA inserts all-gathers for the global contrastive denominators
and the gradient/BN-stat reductions over ICI.

A ``model`` axis is provisioned for tensor-parallel sharding but is size 1 by
default: these models are <=35M params (SURVEY.md §2.3 — TP/PP absent in the
reference; kept available, unused).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Env vars that indicate a multi-host launch where jax.distributed can
# auto-detect (or is explicitly given) a coordinator. Checked WITHOUT touching
# any jax API: jax.process_count()/devices() initialize the XLA backend, after
# which jax.distributed.initialize() raises.
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",   # explicit coordinator
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",  # multi-slice TPU
    "TPU_WORKER_HOSTNAMES",      # Cloud TPU pod auto-detection
    "SLURM_STEP_NODELIST",       # SLURM cluster auto-detection
)


def init_distributed() -> None:
    """Multi-host rendezvous when launched under a JAX-aware scheduler;
    a no-op single-host otherwise. Replaces dist.init_process_group
    (reference pretrain.py:205-230 incl. the SLURM path :594-609).

    Must run before any other jax call: initialize() requires an
    uninitialized backend, so the launch-environment check reads env vars
    only. Already-initialized (an outer launcher called initialize, or a
    second driver invocation in-process) is tolerated."""
    def _plausible(v: str) -> bool:
        # tooling sometimes exports sentinel/warning strings (e.g. a TPU
        # relay sets TPU_WORKER_HOSTNAMES to "WARNING: could not
        # determine..."); a real hostname list has no whitespace
        return bool(v) and not any(c.isspace() for c in v)

    if not any(_plausible(os.environ.get(k, "")) for k in _CLUSTER_ENV_VARS):
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        # only the already-initialized case is benign; anything else
        # (coordinator timeouts surface as RuntimeError subclasses) must
        # not silently degrade a pod launch to single-host
        if "already" in str(e).lower():
            return
        raise
    except ValueError as e:
        # auto-detection misfired (env var set but no coordinator could be
        # derived) — proceed single-host, loudly
        import warnings

        warnings.warn(
            f"jax.distributed.initialize() failed ({e}); continuing "
            "single-host. Set JAX_COORDINATOR_ADDRESS explicitly for "
            "multi-host runs.")


def data_mesh_for_batch(batch_size: int, model_parallel: int = 1) -> Mesh:
    """Mesh whose data axis is the largest device count dividing the
    per-process batch (a 4-sample smoke batch on an 8-device host uses 4
    devices rather than failing the sharding divisibility check).

    Multi-process: ``batch_size`` is per process (reference batch-per-GPU
    semantics, pretrain.py:183-184); the mesh spans all global devices and
    each process' local shard must divide its local devices."""
    if jax.process_count() > 1:
        local = jax.local_device_count() // model_parallel
        if batch_size % local:
            raise ValueError(
                f"per-process batch {batch_size} not divisible by "
                f"{local} local devices")
        return make_mesh(None, model_parallel)
    n = len(jax.devices()) // model_parallel
    d = min(n, batch_size)
    while batch_size % d:
        d -= 1
    return make_mesh(d * model_parallel, model_parallel)


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch with its leading axis split over the data axis.

    Multi-process: each process holds only its local shard of the global
    batch, so the global array is assembled from the per-host locals
    (otherwise jax.device_put would treat the local array as the global
    batch and silently drop (P-1)/P of every host's samples). This is what
    DistributedSampler + DDP gave the reference (pretrain.py:550-556)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                x, mesh, P("data")),
            batch)
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
