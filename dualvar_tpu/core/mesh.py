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


def init_distributed() -> None:
    """Multi-host rendezvous when launched under a JAX-aware scheduler
    (coordinator env vars set); a no-op single-host otherwise. Replaces
    dist.init_process_group (pretrain.py:218)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()


def data_mesh_for_batch(batch_size: int, model_parallel: int = 1) -> Mesh:
    """Mesh whose data axis is the largest device count dividing the
    per-process batch (a 4-sample smoke batch on an 8-device host uses 4
    devices rather than failing the sharding divisibility check)."""
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
    """Place a host batch with its leading axis split over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
