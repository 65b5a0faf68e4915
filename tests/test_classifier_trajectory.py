"""Downstream (classifier) TRAJECTORY parity vs torch.

tests/test_trajectory_parity.py bounds the PRETRAIN trajectory; the accuracy
targets (UCF101 ft 82.0 / HMDB51 51.2, BASELINE.md) additionally depend on
the FINETUNE/PROBE trajectory — CE loss through the backbone, BN running
stats evolving during finetune, and the probe regime where the backbone and
BN are frozen (reference classifier.py:240-253,422-498).

Two regimes, two oracles:

1. ``test_classifier_ft_trajectory_parity`` — full finetune. Same re-sync
   decomposition as the pretrain test (free-running deep-CNN co-training is
   not a usable oracle at f32): drive a REAL 20-step torch SGD(momentum, wd)
   trajectory; before every step transplant torch's weights into JAX and
   assert the CE loss, the logits, and (every 5 steps) conv1/final_fc grads
   match; meanwhile JAX accumulates its OWN BN running stats for all 20
   steps, and the end states (and an eval-mode forward through them) must
   agree with torch's.
2. ``test_classifier_probe_free_running_trajectory`` — linear probe. With
   the backbone frozen and BN in inference mode the trainable system is a
   LINEAR model + CE (convex, non-chaotic), so here we CAN free-run both
   frameworks side by side with no re-sync: 30 steps of SGD(momentum, wd)
   over final_fc only, asserting the loss at every step and the fc weights
   throughout. This pins the probe semantics end to end: frozen backbone
   params, frozen BN (reference model.eval() when train_what == 'last',
   classifier.py:435-438), weight decay not moving frozen params.

The torch classifier is a clean-room oracle (TorchR3D from
tests/test_torch_parity.py + avgpool + nn.Linear — exactly the reference's
LinearClassifier shape, model/classifier.py:10-63, with dropout disabled in
both frameworks since dropout RNG cannot be mirrored).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from dualvar_tpu.models.backbones import select_backbone  # noqa: E402
from dualvar_tpu.models.heads import LinearClassifier  # noqa: E402
from dualvar_tpu.models.ssl.losses import (  # noqa: E402
    cross_entropy_from_logits,
)
from tests.test_full_model_parity import copy_r3d  # noqa: E402
from tests.test_torch_parity import TorchR3D, t2j_conv  # noqa: E402

B, T, IMG, NC = 2, 8, 16, 7
LR, WD, MOM = 0.01, 1e-3, 0.9  # finetune recipe shape (classifier.py:38-108)


class TorchClassifier(nn.Module):
    """Clean-room LinearClassifier oracle: backbone -> avgpool -> FC.

    Reference model/classifier.py:10-63 with use_dropout=False,
    use_l2_norm=False, use_final_bn=False (the finetune-default switches).
    """

    def __init__(self, num_class=NC):
        super().__init__()
        self.backbone = TorchR3D()
        self.final_fc = nn.Linear(512, num_class)
        nn.init.normal_(self.final_fc.weight, std=0.01)
        nn.init.zeros_(self.final_fc.bias)

    def forward(self, x):
        f = self.backbone(x)
        feat = tF.adaptive_avg_pool3d(f, 1).flatten(1)
        return self.final_fc(feat), feat


def _randomize_bn(tm):
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)


def _data(seed, steps):
    rs = np.random.RandomState(seed)
    clips = rs.rand(steps, B, 3, T, IMG, IMG).astype(np.float32)
    labels = rs.randint(0, NC, size=(steps, B)).astype(np.int64)
    return clips, labels


def _j_clip(clip_np):
    return jnp.asarray(clip_np.transpose(0, 2, 3, 4, 1))


def _deep(tree):
    """Deep-copy: jnp.asarray of a transposed torch-weight numpy view can
    ALIAS torch memory on the CPU backend (see test_trajectory_parity)."""
    return jax.tree.map(lambda x: jnp.array(np.asarray(x)), tree)


def _build_jax_classifier():
    backbone, info = select_backbone("r3d")
    return LinearClassifier(backbone=backbone,
                            feature_size=info["feature_size"], num_class=NC,
                            use_dropout=False)


def _sync(tm, variables, scratch_stats):
    p = jax.device_get(variables["params"])
    copy_r3d(tm.backbone, p["backbone"], scratch_stats["backbone"])
    p["final_fc"]["kernel"] = jnp.asarray(
        tm.final_fc.weight.detach().numpy().T)
    p["final_fc"]["bias"] = jnp.asarray(tm.final_fc.bias.detach().numpy())
    return _deep(p)


def test_classifier_ft_trajectory_parity():
    STEPS = 20
    torch.manual_seed(50)
    tm = TorchClassifier()
    tm.train()
    _randomize_bn(tm)
    rv0 = {m: m.running_var.detach().clone() for m in tm.modules()
           if isinstance(m, nn.BatchNorm3d)}

    jm = _build_jax_classifier()
    clips, labels = _data(51, STEPS)

    variables = jm.init(jax.random.PRNGKey(0), _j_clip(clips[0]), False)
    scratch_stats = jax.device_get(variables["batch_stats"])
    params = _sync(tm, variables, scratch_stats)
    # running stats start identical to torch, then JAX accumulates its own
    stats = jax.device_get(variables["batch_stats"])
    copy_r3d(tm.backbone, jax.device_get(variables["params"])["backbone"],
             stats["backbone"])
    stats = _deep(stats)

    opt_t = torch.optim.SGD(tm.parameters(), lr=LR, momentum=MOM,
                            weight_decay=WD)

    @jax.jit
    def forward(params, stats, clip, label):
        def loss_fn(p):
            (logit, _), upd = jm.apply(
                {"params": p, "batch_stats": stats}, clip, True,
                mutable=["batch_stats"])
            return (cross_entropy_from_logits(logit, label),
                    (logit, upd["batch_stats"]))

        (loss, (logit, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return (loss, logit, new_stats,
                grads["backbone"]["conv1"]["kernel"],
                grads["final_fc"]["kernel"])

    curve_t = []
    for s in range(STEPS):
        params = _sync(tm, variables, scratch_stats)
        clip_t = torch.from_numpy(clips[s])
        label_t = torch.from_numpy(labels[s])
        opt_t.zero_grad()
        logit_t, _ = tm(clip_t)
        loss_t = tF.cross_entropy(logit_t, label_t)
        loss_t.backward()

        loss_j, logit_j, stats, g_conv1, g_fc = forward(
            params, stats, _j_clip(clips[s]), jnp.asarray(labels[s]))
        np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"step {s} CE loss")
        # logit diff = growing_fc_W . (~2e-4 feature diff), so it scales with
        # the weight magnitude as the fc fits the random labels — compare
        # normalised by the torch logits' own scale; a wiring slip (wrong
        # pool/head/BN mode) shows up at O(1) relative
        lt = logit_t.detach().numpy()
        lscale = max(np.abs(lt).max(), 1e-8)
        np.testing.assert_allclose(np.asarray(logit_j) / lscale, lt / lscale,
                                   atol=1e-2, err_msg=f"step {s} logits")
        if s % 5 == 0 or s == STEPS - 1:
            tg = tm.backbone.conv1.weight.grad.detach().numpy().transpose(
                2, 3, 4, 1, 0)
            scale = max(np.abs(tg).max(), 1e-8)
            np.testing.assert_allclose(np.asarray(g_conv1) / scale,
                                       tg / scale, atol=5e-2,
                                       err_msg=f"step {s} conv1 grad")
            # fc grad = softmax_err (x) pooled_feat: inherits the backbone's
            # ~2e-4 f32 feature discrepancy, amplified as training sharpens
            # the softmax — compare direction+scale like conv1 above
            tfc = tm.final_fc.weight.grad.detach().numpy().T
            fscale = max(np.abs(tfc).max(), 1e-8)
            np.testing.assert_allclose(
                np.asarray(g_fc) / fscale, tfc / fscale,
                atol=1e-2, err_msg=f"step {s} final_fc grad")
        opt_t.step()
        curve_t.append(float(loss_t.detach()))

    assert np.std(curve_t) > 1e-3  # actually trains

    # BN running stats accumulated independently for 20 steps must agree
    np.testing.assert_allclose(
        np.asarray(stats["backbone"]["bn1"]["bn"]["mean"]),
        tm.backbone.bn1.running_mean.detach().numpy(), atol=2e-3,
        err_msg="bn1 running mean after 20 steps")
    np.testing.assert_allclose(
        np.asarray(stats["backbone"]["bn1"]["bn"]["var"]),
        tm.backbone.bn1.running_var.detach().numpy(), rtol=2e-2, atol=2e-3,
        err_msg="bn1 running var after 20 steps")

    # eval-mode forward through each framework's OWN end state: the pair
    # (final weights, accumulated BN stats) must produce matching inference
    # logits — this is exactly what validation/test protocols consume.
    # One documented divergence must be factored out first: torch folds the
    # UNBIASED batch variance (factor n/(n-1)) into running_var while flax
    # folds the biased one. At real shapes n >= 1e3 per BN and the factor is
    # <= 1e-3; at THIS test's tiny activations the deepest BNs see n=2 (a 2x
    # var mismatch that would swamp the check). The exact conversion: after
    # S steps at decay 0.9, rv_torch = 0.9^S * rv0 + (n/(n-1)) * A where A
    # is the biased accumulation flax holds — so de-bias only the
    # accumulated part, using each layer's actual n (captured by hook).
    params = _sync(tm, variables, scratch_stats)
    tm.eval()
    sizes = {}
    hooks = [
        m.register_forward_hook(
            lambda mod, inp, out: sizes.__setitem__(
                mod, inp[0].numel() // inp[0].shape[1]))
        for m in tm.modules() if isinstance(m, nn.BatchNorm3d)
    ]
    with torch.no_grad():
        tm(torch.from_numpy(clips[0]))  # eval mode: captures shapes only
    for h in hooks:
        h.remove()
    decay = 0.9 ** STEPS
    with torch.no_grad():
        for m, n in sizes.items():
            init_part = decay * rv0[m]
            m.running_var.copy_(
                init_part + (m.running_var - init_part) * (n - 1) / n)
        logit_te, _ = tm(torch.from_numpy(clips[0]))
    logit_je, _ = jm.apply({"params": params, "batch_stats": stats},
                           _j_clip(clips[0]), False)
    lte = logit_te.numpy()
    lsc = max(np.abs(lte).max(), 1e-8)
    np.testing.assert_allclose(np.asarray(logit_je) / lsc, lte / lsc,
                               atol=1e-2, err_msg="eval logits at end state")


def test_classifier_probe_free_running_trajectory():
    STEPS = 30
    torch.manual_seed(60)
    tm = TorchClassifier()
    tm.eval()  # probe: BN in inference mode (classifier.py:435-438)
    _randomize_bn(tm)
    for p in tm.backbone.parameters():
        p.requires_grad_(False)

    jm = _build_jax_classifier()
    clips, labels = _data(61, 3)  # cycle 3 batches

    variables = jm.init(jax.random.PRNGKey(0), _j_clip(clips[0]), False)
    scratch_stats = jax.device_get(variables["batch_stats"])
    params = _sync(tm, variables, scratch_stats)
    p0_conv1 = np.array(params["backbone"]["conv1"]["kernel"])
    stats = jax.device_get(variables["batch_stats"])
    copy_r3d(tm.backbone, jax.device_get(variables["params"])["backbone"],
             stats["backbone"])
    stats = _deep(stats)

    # torch optimizer sees ONLY final_fc (reference classifier.py:240-247);
    # JAX mirrors the driver: tx over everything, backbone updates zeroed
    opt_t = torch.optim.SGD(tm.final_fc.parameters(), lr=LR, momentum=MOM,
                            weight_decay=WD)
    tx = optax.chain(optax.add_decayed_weights(WD),
                     optax.sgd(LR, momentum=MOM))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, clip, label):
        def loss_fn(p):
            # train=False: probe keeps BN in inference mode and writes
            # nothing to batch_stats (driver classifier.py make_train_step)
            logit, _ = jm.apply({"params": p, "batch_stats": stats},
                                clip, False)
            return cross_entropy_from_logits(logit, label)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        updates = dict(updates)
        updates["backbone"] = jax.tree.map(jnp.zeros_like,
                                           updates["backbone"])
        return optax.apply_updates(params, updates), new_opt, loss

    curve = []
    for s in range(STEPS):
        i = s % 3
        clip_t = torch.from_numpy(clips[i])
        label_t = torch.from_numpy(labels[i])
        opt_t.zero_grad()
        logit_t, _ = tm(clip_t)
        loss_t = tF.cross_entropy(logit_t, label_t)
        loss_t.backward()
        opt_t.step()

        params, opt_state, loss_j = train_step(
            params, opt_state, _j_clip(clips[i]), jnp.asarray(labels[i]))
        # free-running: no re-sync — the trajectories must track on their own
        np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"step {s} probe CE loss")
        np.testing.assert_allclose(
            np.asarray(params["final_fc"]["kernel"]),
            tm.final_fc.weight.detach().numpy().T, atol=1e-4,
            err_msg=f"step {s} fc weights")
        curve.append(float(loss_t.detach()))

    assert curve[-1] < curve[0]  # the probe actually learns
    # frozen backbone must not have moved in EITHER framework
    np.testing.assert_allclose(np.asarray(params["backbone"]["conv1"]["kernel"]),
                               p0_conv1, atol=0,
                               err_msg="frozen backbone moved (JAX)")
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["conv1"]["kernel"]),
        t2j_conv(tm.backbone.conv1.weight.detach()), atol=2e-8,
        err_msg="torch frozen backbone diverged from JAX frozen backbone")
