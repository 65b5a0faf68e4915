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


# Env vars that carry an EXPLICIT coordinator address. When one of these is
# set, the user asked for multi-host: failures must raise, never silently
# degrade to N independent single-host runs writing the same log dir.
_EXPLICIT_COORD_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",  # multi-slice TPU
)

# Env vars from which jax.distributed can AUTO-DETECT a cluster. These are
# exported by schedulers/relays on single-host rigs too (e.g. a TPU relay
# exports TPU_WORKER_HOSTNAMES=localhost), so they only count as a cluster
# signal when they name more than one host. Checked WITHOUT touching any jax
# API: jax.process_count()/devices() initialize the XLA backend, after which
# jax.distributed.initialize() raises.
_AUTO_DETECT_VARS = (
    "TPU_WORKER_HOSTNAMES",      # Cloud TPU pod auto-detection
    "SLURM_STEP_NODELIST",       # SLURM cluster auto-detection
)


def _plausible(v: str) -> bool:
    # tooling sometimes exports sentinel/warning strings (e.g. a TPU relay
    # sets TPU_WORKER_HOSTNAMES to "WARNING: could not determine..."); a
    # real hostname list / address has no whitespace
    return bool(v) and not any(c.isspace() for c in v)


def _names_multiple_hosts(v: str) -> bool:
    """True only when a scheduler host list names >1 worker. A single entry
    (``localhost``, this machine, or any lone hostname) is a single-host
    launch — jax.distributed has nothing to rendezvous."""
    if not _plausible(v):
        return False
    if "[" in v:  # SLURM compressed range, e.g. node[01-04]
        return True
    return len([h for h in v.split(",") if h.strip()]) > 1


def init_distributed() -> None:
    """Multi-host rendezvous when launched under a JAX-aware scheduler;
    a no-op single-host otherwise. Replaces dist.init_process_group
    (reference pretrain.py:205-230 incl. the SLURM path :594-609).

    Must run before any other jax call: initialize() requires an
    uninitialized backend, so the launch-environment check reads env vars
    only. Already-initialized (an outer launcher called initialize, or a
    second driver invocation in-process) is tolerated.

    Also enables the persistent compilation cache — bring-up is the one
    choke point every driver entry (train, test protocols) passes through
    before the first compile."""
    enable_compilation_cache()
    explicit = any(
        _plausible(os.environ.get(k, "")) for k in _EXPLICIT_COORD_VARS)
    auto = any(
        _names_multiple_hosts(os.environ.get(k, ""))
        for k in _AUTO_DETECT_VARS)
    if not (explicit or auto):
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        msg = str(e).lower()
        # distributed service already brought up (outer launcher, or a
        # second driver invocation in-process) — benign
        if "already" in msg:
            return
        # "must be called before any JAX calls": the XLA backend is live in
        # this process (pytest, notebook, library use). With only an
        # auto-detect hint that is a benign single-host situation; with an
        # explicit coordinator the user asked for multi-host and silently
        # degrading would fork the run into N independent trainings.
        if "before" in msg and "jax" in msg and not explicit:
            from dualvar_tpu.core.logging import get_logger

            get_logger().warning(
                "init_distributed: JAX backend already initialized in this "
                "process; continuing single-host (%s)", e)
            return
        raise
    except ValueError as e:
        if explicit:
            # coordinator explicitly requested but unusable — a real
            # multi-host launch must fail loudly on every process
            raise
        # auto-detection misfired (env var set but no coordinator could be
        # derived) — proceed single-host, loudly, on every process
        from dualvar_tpu.core.logging import get_logger

        get_logger().warning(
            "jax.distributed.initialize() failed (%s); continuing "
            "single-host. Set JAX_COORDINATOR_ADDRESS explicitly for "
            "multi-host runs.", e)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache for the drivers.

    The fused train step takes tens of seconds to compile on TPU; the
    reference pays the cuDNN autotune cost on every launch, but XLA can
    persist compiled executables across processes — making restart,
    resume-after-preemption, and the finetune→test→retrieval CLI chains
    near-instant after the first run. Default dir /tmp/dualvar_tpu_jax_cache
    (shared with bench/tests); override with DUALVAR_JAX_CACHE_DIR, disable
    with DUALVAR_JAX_CACHE_DIR=off."""
    env = os.environ.get("DUALVAR_JAX_CACHE_DIR", "")
    if env.lower() in ("0", "off", "none", "disabled"):
        return
    path = cache_dir or env or "/tmp/dualvar_tpu_jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # an old jax without the flag: not worth failing
        from dualvar_tpu.core.logging import get_logger

        get_logger().warning("compilation cache unavailable (%s)", e)


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
