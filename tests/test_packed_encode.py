"""Packed-encode parity (round-4 VERDICT #4): merging the SR shuffled pass
into the main encode batch (SimCLR TSV4: one 4B batch instead of 3B + B,
reference model/simclr.py:374-398; MoCo TSV4: one 3B query batch instead of
B + 2B, reference moco.py:551-557) must be

  * bitwise-identical in EVAL mode (BN uses running stats, so batching is
    semantically invisible), and
  * close-but-divergent in TRAIN mode (BN batch statistics merge across
    the packed views — the documented divergence, like jitter_order).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dualvar_tpu.models.ssl.moco import (MoCoEncoder, init_moco_state,
                                         moco_timeseries_forward)
from dualvar_tpu.models.ssl.simclr import SimCLRTimeSeriesV4

B, T, D = 4, 4, 32


def _block(key):
    return jax.random.uniform(key, (B, 3, T, D, D, 3))


def _tsv4(packed):
    return SimCLRTimeSeriesV4(network="r3d", dtype=jnp.float32,
                              packed_encode=packed)


def test_simclr_tsv4_packed_eval_bitwise(rng):
    block = _block(jax.random.PRNGKey(1))
    base, packed = _tsv4(False), _tsv4(True)
    v = base.init({"params": rng, "shuffle": rng}, block, train=True)
    k = jax.random.PRNGKey(2)
    r0 = base.apply(v, block, train=False, rngs={"shuffle": k})
    r1 = packed.apply(v, block, train=False, rngs={"shuffle": k})
    assert set(r0) == set(r1)
    for key in r0:
        a, b = np.asarray(r0[key]), np.asarray(r1[key])
        assert np.array_equal(a, b), (key, a, b)


def test_simclr_tsv4_packed_train_close(rng):
    """Train mode: same data, same perm -> losses agree to BN-batch-merge
    tolerance, and the BN divergence is real (not a no-op path)."""
    block = _block(jax.random.PRNGKey(1))
    base, packed = _tsv4(False), _tsv4(True)
    v = base.init({"params": rng, "shuffle": rng}, block, train=True)
    k = jax.random.PRNGKey(2)
    r0, upd0 = base.apply(v, block, train=True, rngs={"shuffle": k},
                          mutable=["batch_stats"])
    r1, upd1 = packed.apply(v, block, train=True, rngs={"shuffle": k},
                            mutable=["batch_stats"])
    for key in r0:
        if not key.endswith("loss"):
            continue
        a, b = float(r0[key]), float(r1[key])
        assert np.isfinite(b)
        assert abs(a - b) < 0.25 * max(1.0, abs(a)), (key, a, b)
    # BN running stats must still be updated (and generally differ)
    s0 = jax.tree_util.tree_leaves(upd0["batch_stats"])
    s1 = jax.tree_util.tree_leaves(upd1["batch_stats"])
    assert len(s0) == len(s1) and len(s0) > 0


def _moco_setup(rng, packed):
    enc = MoCoEncoder(network="r3d", dim=16, n_series=2, series_dim=8,
                      dtype=jnp.float32)
    block = _block(jax.random.PRNGKey(3))
    v = enc.init(rng, block[:, 0], True)
    state = init_moco_state(jax.random.PRNGKey(4), v["params"],
                            v.get("batch_stats", {}), K=16, dim=16,
                            n_series=2, series_dim=8)
    return enc, v, state, block


def test_moco_tsv4_packed_eval_bitwise(rng):
    enc, v, state, block = _moco_setup(rng, True)
    k = jax.random.PRNGKey(5)
    kw = dict(m=0.999, temperature=0.07, aligned_T=0.07, mode="clip-sr-tc",
              rng=k, train=False)
    r0, _, _ = moco_timeseries_forward(enc, v, state, block,
                                       packed_encode=False, **kw)
    r1, _, _ = moco_timeseries_forward(enc, v, state, block,
                                       packed_encode=True, **kw)
    assert set(r0) == set(r1)
    for key in r0:
        a, b = np.asarray(r0[key]), np.asarray(r1[key])
        assert np.array_equal(a, b), (key, a, b)


def test_moco_tsv4_packed_train_close(rng):
    enc, v, state, block = _moco_setup(rng, True)
    k = jax.random.PRNGKey(5)
    kw = dict(m=0.999, temperature=0.07, aligned_T=0.07, mode="clip-sr-tc",
              rng=k, train=True)
    r0, u0, s0 = moco_timeseries_forward(enc, v, state, block,
                                         packed_encode=False, **kw)
    r1, u1, s1 = moco_timeseries_forward(enc, v, state, block,
                                         packed_encode=True, **kw)
    for key in r0:
        if not key.endswith("loss"):
            continue
        a, b = float(r0[key]), float(r1[key])
        assert np.isfinite(b)
        assert abs(a - b) < 0.25 * max(1.0, abs(a)), (key, a, b)
    # queue/key side must be IDENTICAL: the key pass is untouched by packing
    assert np.array_equal(np.asarray(s0.queue), np.asarray(s1.queue))
    assert np.array_equal(np.asarray(s0.series_queue),
                          np.asarray(s1.series_queue))


def test_task_layer_wires_packed_encode(rng):
    """ModelConfig.packed_encode reaches both task families and the step
    still produces finite losses."""
    from dualvar_tpu.core.config import ModelConfig
    from dualvar_tpu.train.tasks import make_task, total_loss

    for model in ("simclr_timeseriesv4", "moco_timeseriesv4"):
        cfg = ModelConfig(net="r3d", model=model, dtype="float32",
                          packed_encode=True, moco_k=8)
        task = make_task(cfg)
        block = _block(jax.random.PRNGKey(6))
        t = task.init(rng, block)
        ret, _, _ = task.forward(t.params, t, block, jax.random.PRNGKey(7),
                                 train=True)
        assert np.isfinite(float(total_loss(ret))), model


def test_simclr_tsv4_packed_eval_bitwise_on_tiled(rng):
    """The perf-mode stack (packed_encode over the r21d_tiled backbone,
    BENCH_OBJECTIVES simclr_tsv4_r21d_tiled_packed): packing must stay a
    pure batching transform on the non-parity tiled widths too — eval-mode
    outputs bitwise equal to the unpacked tiled model."""
    block = jax.random.uniform(jax.random.PRNGKey(8), (2, 3, 4, 32, 32, 3))
    base = SimCLRTimeSeriesV4(network="r21d_tiled", dtype=jnp.float32,
                              packed_encode=False)
    packed = SimCLRTimeSeriesV4(network="r21d_tiled", dtype=jnp.float32,
                                packed_encode=True)
    v = base.init({"params": rng, "shuffle": rng}, block, train=True)
    k = jax.random.PRNGKey(9)
    r0 = base.apply(v, block, train=False, rngs={"shuffle": k})
    r1 = packed.apply(v, block, train=False, rngs={"shuffle": k})
    assert set(r0) == set(r1)
    for key in r0:
        assert np.array_equal(np.asarray(r0[key]), np.asarray(r1[key])), key
