"""Optimizer parity: optax chain(add_decayed_weights, sgd) must match
torch.optim.SGD(momentum, weight_decay) step-for-step (reference
pretrain.py:272), and the MultiStepLR schedule must drop x0.1 at the
scheduled epochs (pretrain.py:328, classifier.py:998-1003)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


def test_sgd_momentum_wd_matches_torch():
    w0 = np.random.RandomState(0).randn(5, 3).astype(np.float32)
    grads = [np.random.RandomState(i + 1).randn(5, 3).astype(np.float32)
             for i in range(4)]
    lr, wd, mom = 0.05, 1e-3, 0.9

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt_t = torch.optim.SGD([wt], lr=lr, momentum=mom, weight_decay=wd)
    for g in grads:
        opt_t.zero_grad()
        wt.grad = torch.tensor(g.copy())
        opt_t.step()

    tx = optax.chain(optax.add_decayed_weights(wd), optax.sgd(lr, momentum=mom))
    wj = jnp.asarray(w0)
    state = tx.init(wj)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, wj)
        wj = optax.apply_updates(wj, updates)

    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_multistep_lr_schedule():
    from dualvar_tpu.core.config import PRETRAIN_PRESETS
    from dualvar_tpu.train.pretrain import make_optimizer

    cfg = PRETRAIN_PRESETS["paper_table1_k400"]  # lr .003, drops (120, 160)
    _, lr = make_optimizer(cfg, steps_per_epoch=10)
    assert float(lr(0)) == pytest.approx(0.003)
    assert float(lr(119 * 10 + 9)) == pytest.approx(0.003)
    assert float(lr(120 * 10)) == pytest.approx(0.0003)
    assert float(lr(160 * 10)) == pytest.approx(0.00003, rel=1e-4)


def test_linear_probe_freezes_backbone():
    """train_what='last': backbone params must not move, head must
    (reference classifier.py:240-253)."""
    import dataclasses
    import jax

    from dualvar_tpu.aug.pipeline import AugConfig
    from dualvar_tpu.core.config import CLASSIFIER_PRESETS
    from dualvar_tpu.train.classifier import (
        TrainState, build_model, make_optimizer, make_train_step,
    )

    cfg = CLASSIFIER_PRESETS["smoke"]
    cfg = dataclasses.replace(
        cfg, train_what="last",
        data=dataclasses.replace(cfg.data, seq_len=4, img_dim=32,
                                 scale_hw=(40, 36)))
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg, 10)
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, example, train=True)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    step = jax.jit(make_train_step(model, tx, AugConfig(img_dim=32, seq_len=4),
                                   "last"))
    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (4, 4, 40, 36, 3), dtype=np.uint8))
    labels = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
    new_state, metrics = step(state, frames, labels, rng)

    bb_before = jax.tree.leaves(state.params["backbone"])
    bb_after = jax.tree.leaves(new_state.params["backbone"])
    assert all(np.array_equal(a, b) for a, b in zip(bb_before, bb_after))
    assert not np.array_equal(state.params["final_fc"]["kernel"],
                              new_state.params["final_fc"]["kernel"])
    # BN running stats also frozen in probe mode (model.eval() parity)
    bs_before = jax.tree.leaves(state.batch_stats)
    bs_after = jax.tree.leaves(new_state.batch_stats)
    assert all(np.array_equal(a, b) for a, b in zip(bs_before, bs_after))


def test_sgd_momentum_through_lr_drop_matches_torch():
    """Momentum buffers carry across MultiStepLR drops: co-train a raw
    parameter for 3 'epochs' x 5 steps through drops at epochs {1, 2} using
    the PRODUCTION schedule (pretrain.make_optimizer) vs torch SGD +
    MultiStepLR — exact step-for-step agreement. This is the schedule x
    momentum x weight-decay interaction the multi-epoch drift risk hinges
    on (reference pretrain.py:272,328)."""
    import dataclasses

    from dualvar_tpu.core.config import PRETRAIN_PRESETS
    from dualvar_tpu.train.pretrain import make_optimizer

    spe = 5
    cfg = PRETRAIN_PRESETS["smoke"]
    cfg = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, lr=0.05, wd=1e-3,
                                       momentum=0.9, schedule=(1, 2),
                                       optim="sgd"))
    tx, lr_fn = make_optimizer(cfg, steps_per_epoch=spe)

    w0 = np.random.RandomState(0).randn(6, 4).astype(np.float32)
    grads = [np.random.RandomState(i + 1).randn(6, 4).astype(np.float32)
             for i in range(3 * spe)]

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt_t = torch.optim.SGD([wt], lr=0.05, momentum=0.9, weight_decay=1e-3)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt_t, milestones=[1, 2],
                                                 gamma=0.1)
    wj = jnp.asarray(w0)
    state = tx.init(wj)
    step = 0
    for epoch in range(3):
        for _ in range(spe):
            opt_t.zero_grad()
            wt.grad = torch.tensor(grads[step].copy())
            opt_t.step()

            assert float(lr_fn(step)) == pytest.approx(
                opt_t.param_groups[0]["lr"], rel=1e-6)
            updates, state = tx.update(jnp.asarray(grads[step]), state, wj)
            wj = optax.apply_updates(wj, updates)
            step += 1
        sched.step()
        np.testing.assert_allclose(
            np.asarray(wj), wt.detach().numpy(), rtol=1e-5, atol=1e-7,
            err_msg=f"after epoch {epoch}")
