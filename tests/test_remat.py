"""Backbone rematerialization must not change numerics.

``remat`` (select_backbone, threaded through the SSL models and the
classifier) recomputes backbone activations in the backward pass to cut
activation memory — the parity-safe lever that fits the r21d paper config
at B=64 (per-view sequential encode would change BN batch statistics;
remat does not).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dualvar_tpu.models.ssl.simclr import SimCLRTimeSeriesV4

B, T, IMG = 2, 4, 32


def _loss_and_grad(remat):
    model = SimCLRTimeSeriesV4(network="r21d", dtype=jnp.float32,
                               remat=remat)
    rng = jax.random.PRNGKey(0)
    block = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, T, IMG, IMG, 3))
    v = model.init({"params": rng, "shuffle": rng}, block, train=True)

    def loss_fn(params):
        ret, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, block,
            train=True, rngs={"shuffle": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return sum(x for k, x in ret.items() if k.endswith("loss"))

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(v["params"])
    return float(loss), grads, v["params"]


def test_remat_preserves_loss_and_grads():
    loss0, g0, p0 = _loss_and_grad(remat=False)
    loss1, g1, p1 = _loss_and_grad(remat=True)
    # identical init: the lifted transform must not change param structure
    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(loss0, loss1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_classifier_remat_builds_and_matches():
    """The classifier --remat path (backbone called through nn.remat's
    positional-args contract in heads.py) must build and match no-remat
    numerics."""
    from dualvar_tpu.models.backbones import select_backbone
    from dualvar_tpu.models.heads import LinearClassifier

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, T, IMG, IMG, 3))
    outs = []
    for remat in (False, True):
        backbone, meta = select_backbone("r3d", jnp.float32, remat=remat)
        clf = LinearClassifier(backbone=backbone,
                               feature_size=meta["feature_size"],
                               num_class=5)
        v = clf.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        (logit, feat), _ = clf.apply(v, x, train=True,
                                     rngs={"dropout": jax.random.PRNGKey(2)},
                                     mutable=["batch_stats"])
        outs.append(np.asarray(logit))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)
