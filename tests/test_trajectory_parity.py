"""Multi-step TRAJECTORY parity vs torch: co-train both frameworks.

Round-3 VERDICT next-step #4: single-step forward/grad parity
(tests/test_full_model_parity.py) bounds a step, but the accuracy target
(UCF101 82.0 / HMDB51 51.2 within 0.5 pts, BASELINE.md) depends on the
*trajectory* — BN-momentum, EMA, queue dynamics and SGD-momentum
interactions over many steps. Real multi-epoch pretraining is out of reach
in this container, so this file provides the cheapest available bound on
the drift risk: co-train torch and JAX for 20 steps on identical synthetic
batches with mirrored SGD (momentum 0.9 + weight decay, reference
pretrain.py:272) and fixed per-step segment permutations, and assert

  * the per-step total-loss curves track within tolerance at every step;
  * final parameters agree (stem conv, head kernels), scale-normalised;
  * (MoCo) the EMA key encoder, queue contents and queue pointer after 20
    steps — the ptr has wrapped the K=8 ring 5 times (reference
    moco.py:109-126 ring arithmetic under repeated wraparound).

The torch models are the clean-room oracles from test_full_model_parity.
Optimizer mirroring: torch SGD(momentum=0.9, dampening=0, nesterov=False,
weight_decay=wd) computes buf = m*buf + (g + wd*p); p -= lr*buf, which is
exactly optax.chain(add_decayed_weights(wd), sgd(lr, momentum=0.9)).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from tests.test_full_model_parity import (  # noqa: E402
    NS,
    SD,
    TorchDualVarMoCo,
    TorchDualVarSimCLR,
    copy_head,
    copy_r3d,
)
from tests.test_torch_parity import t2j_conv  # noqa: E402

STEPS = 20
LR, WD, MOM = 0.01, 1e-4, 0.9
B, T, IMG = 2, 8, 16

# Per-step loss tolerance. Single-step parity is ~0.5% relative
# (test_full_model_parity LOSS_RTOL note); over 20 SGD steps the parameter
# drift compounds, and with T=0.07 temperatures amplifying embedding error
# ~14x the curves stay within a few percent. A systematic optimizer or
# state-threading slip (wrong momentum accumulation, EMA applied at the
# wrong point, queue enqueued pre-loss) diverges the curve by >>10% within
# a few steps.
CURVE_RTOL = 6e-2


def _randomize_bn(tm):
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)


def _close(j, t, label, atol=2e-2):
    """Scale-normalised comparison for trained tensors."""
    t = np.asarray(t)
    j = np.asarray(j)
    assert j.shape == t.shape, (label, j.shape, t.shape)
    scale = max(np.abs(t).max(), 1e-6)
    np.testing.assert_allclose(j / scale, t / scale, atol=atol,
                               err_msg=label)


def _step_data(seed):
    rs = np.random.RandomState(seed)
    blocks = rs.rand(STEPS, B, 3, 3, T, IMG, IMG).astype(np.float32)
    perms = np.stack([[rs.permutation(NS) for _ in range(B)]
                      for _ in range(STEPS)]).astype(np.int64)
    return blocks, perms


def _j_block(block_np):
    return jnp.asarray(block_np.transpose(0, 1, 3, 4, 5, 2))


def test_simclr_tsv4_trajectory_parity():
    from dualvar_tpu.models.ssl.simclr import SimCLRTimeSeriesV4

    torch.manual_seed(30)
    tm = TorchDualVarSimCLR()
    tm.train()
    _randomize_bn(tm)

    jm = SimCLRTimeSeriesV4(network="r3d", dtype=jnp.float32,
                            shufflerank_theta=0.05)
    blocks, perms = _step_data(31)

    variables = jm.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(0)},
        _j_block(blocks[0]), perm=jnp.asarray(perms[0].astype(np.int32)),
        train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    copy_r3d(tm.backbone, params["backbone"], stats["backbone"])
    copy_head(tm.clip_head, params["clip_head"])
    copy_head(tm.series_head, params["series_head"])

    opt_t = torch.optim.SGD(tm.parameters(), lr=LR, momentum=MOM,
                            weight_decay=WD)
    tx = optax.chain(optax.add_decayed_weights(WD),
                     optax.sgd(LR, momentum=MOM))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, stats, opt_state, block, perm):
        def loss_fn(p):
            ret, upd = jm.apply(
                {"params": p, "batch_stats": stats}, block, perm=perm,
                train=True, mutable=["batch_stats"])
            losses = {k: v for k, v in ret.items() if k.endswith("_loss")}
            return sum(losses.values()), upd["batch_stats"]

        (total, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, total

    curve_t, curve_j = [], []
    for s in range(STEPS):
        opt_t.zero_grad()
        total_t = sum(tm(torch.from_numpy(blocks[s]),
                         torch.from_numpy(perms[s])).values())
        total_t.backward()
        opt_t.step()
        curve_t.append(float(total_t))

        params, stats, opt_state, total_j = train_step(
            params, stats, opt_state, _j_block(blocks[s]),
            jnp.asarray(perms[s].astype(np.int32)))
        curve_j.append(float(total_j))

    np.testing.assert_allclose(np.array(curve_j), np.array(curve_t),
                               rtol=CURVE_RTOL, err_msg="loss curves")
    # the curve must actually move (a frozen model would trivially "track")
    assert abs(curve_t[-1] - curve_t[0]) > 1e-3

    _close(params["backbone"]["conv1"]["kernel"],
           t2j_conv(tm.backbone.conv1.weight.detach()), "conv1 after 20")
    _close(params["clip_head"]["fc2"]["kernel"],
           tm.clip_head.fc2.weight.detach().numpy().T, "clip_head.fc2")
    _close(params["series_head"]["fc2"]["kernel"],
           tm.series_head.fc2.weight.detach().numpy().T, "series_head.fc2")


def test_moco_tsv4_trajectory_parity():
    from dualvar_tpu.models.ssl.moco import (
        MoCoEncoder,
        MoCoState,
        moco_timeseries_forward,
    )

    K = 8
    torch.manual_seed(40)
    tm = TorchDualVarMoCo(K=K)
    tm.train()
    _randomize_bn(tm)
    for mq, mk in zip(tm.encoder_q.modules(), tm.encoder_k.modules()):
        if isinstance(mq, nn.BatchNorm3d):
            mk.running_mean.data.copy_(mq.running_mean.data)
            mk.running_var.data.copy_(mq.running_var.data)

    rs = np.random.RandomState(41)
    queue_rows = rs.randn(K, 128).astype(np.float32)
    queue_rows /= np.linalg.norm(queue_rows, axis=1, keepdims=True)
    sq = rs.randn(K, NS, SD).astype(np.float32)
    sq /= np.linalg.norm(sq, axis=2, keepdims=True)
    sq_rows = sq.reshape(K, NS * SD)
    with torch.no_grad():
        tm.queue.copy_(torch.from_numpy(queue_rows.T))
        tm.series_queue.copy_(torch.from_numpy(sq_rows.T))

    blocks, perms = _step_data(42)

    encoder = MoCoEncoder(network="r3d", dim=128, n_series=NS, series_dim=SD,
                          dtype=jnp.float32)
    variables = encoder.init(jax.random.PRNGKey(0), _j_block(blocks[0])[:, 0],
                             False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    copy_r3d(tm.encoder_q, params["backbone"], stats["backbone"])
    copy_head(tm.clip_head_q, params["clip_head"])
    copy_head(tm.series_head_q, params["series_head"])
    mstate = MoCoState(
        params_k=jax.tree.map(jnp.copy, params),
        batch_stats_k=jax.tree.map(jnp.copy, stats),
        queue=jnp.asarray(queue_rows),
        series_queue=jnp.asarray(sq_rows),
        ptr=jnp.zeros((), jnp.int32),
    )

    # only the q-side carries gradients (reference moco.py:60-101): give the
    # torch optimizer exactly those parameters
    opt_t = torch.optim.SGD(tm._q_params(), lr=LR, momentum=MOM,
                            weight_decay=WD)
    tx = optax.chain(optax.add_decayed_weights(WD),
                     optax.sgd(LR, momentum=MOM))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, stats, mstate, opt_state, block, perm):
        def loss_fn(p):
            ret, upd_q, new_state = moco_timeseries_forward(
                encoder, {"params": p, "batch_stats": stats}, mstate, block,
                m=tm.m, temperature=tm.T, aligned_T=tm.aligned_T,
                mode="clip-sr-tc", perm=perm, train=True)
            losses = {k: v for k, v in ret.items() if k.endswith("_loss")}
            return sum(losses.values()), (upd_q["batch_stats"], new_state)

        (total, (new_stats, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, new_state,
                new_opt, total)

    curve_t, curve_j = [], []
    for s in range(STEPS):
        opt_t.zero_grad()
        total_t = sum(tm(torch.from_numpy(blocks[s]),
                         torch.from_numpy(perms[s])).values())
        total_t.backward()
        opt_t.step()
        curve_t.append(float(total_t))

        params, stats, mstate, opt_state, total_j = train_step(
            params, stats, mstate, opt_state, _j_block(blocks[s]),
            jnp.asarray(perms[s].astype(np.int32)))
        curve_j.append(float(total_j))

    np.testing.assert_allclose(np.array(curve_j), np.array(curve_t),
                               rtol=CURVE_RTOL, err_msg="loss curves")
    assert abs(curve_t[-1] - curve_t[0]) > 1e-3

    # ring pointer after 20 steps of B=2 enqueues into K=8: wrapped 5x
    assert int(mstate.ptr) == int(tm.queue_ptr) == (STEPS * B) % K
    np.testing.assert_allclose(
        np.asarray(mstate.queue), tm.queue.detach().numpy().T,
        atol=2e-2, err_msg="queue after 20 steps")
    np.testing.assert_allclose(
        np.asarray(mstate.series_queue), tm.series_queue.detach().numpy().T,
        atol=2e-2, err_msg="series queue after 20 steps")

    _close(params["backbone"]["conv1"]["kernel"],
           t2j_conv(tm.encoder_q.conv1.weight.detach()), "q conv1 after 20")
    _close(mstate.params_k["backbone"]["conv1"]["kernel"],
           t2j_conv(tm.encoder_k.conv1.weight.detach()), "EMA conv1 after 20")
    _close(mstate.params_k["clip_head"]["fc2"]["kernel"],
           tm.clip_head_k.fc2.weight.detach().numpy().T, "EMA clip fc2")
