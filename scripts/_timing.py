"""Shared device-timing helpers for the perf scripts.

Through this rig's TPU relay, ``jax.block_until_ready`` is unreliable —
the only real synchronization is a host transfer — so every measurement
uses: warm up, one barrier, N dispatches, one barrier, subtract the
measured host round-trip. The TPU executes programs serially, so syncing
on the last dispatch's output transitively waits for all of them.
(bench.py keeps a self-contained copy on purpose: the driver runs it as a
standalone file.)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def barrier(out) -> float:
    """Hard sync: host-transfer one element of the (first leaf of the)
    output."""
    leaf = jax.tree.leaves(out)[0]
    return float(
        jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:1].astype(jnp.float32)))


def rtt() -> float:
    """Median-of-3 host round-trip for a trivial transfer."""
    vals = []
    x = jnp.zeros((8,), jnp.float32)
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(x) + i)
        vals.append(time.perf_counter() - t0)
    return sorted(vals)[1]


def timeit(fn, *args, n: int = 10, _rtt_cache: list = []) -> float:
    """Seconds per call of ``fn(*args)``, RTT-corrected."""
    if not _rtt_cache:
        _rtt_cache.append(rtt())
    out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    barrier(out)
    return max(time.perf_counter() - t0 - _rtt_cache[0], 1e-9) / n
