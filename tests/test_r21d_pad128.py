"""mid_mode='pad128' — the parity-preserving tile-aligned R(2+1)D variant.

Claims under test (r21d.intermed_channels docstring):
  1. the pad blocks initialize to exactly zero;
  2. with a formula-width tree embedded, pad128 computes the same function
     (train and eval forward) to reduction-order rounding — XLA tiles the
     padded reductions differently, regrouping the nonzero partial sums,
     so agreement is ~1e-6/layer in f32 rather than bitwise (a single
     SpatioTemporalConv pair compiled alone IS bitwise equal);
  3. the pad blocks stay BITWISE zero through SGD+momentum+weight-decay
     training, and the loss trajectory matches mid_mode='formula' to
     float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dualvar_tpu.models.backbones.r21d import (R2Plus1DNet, embed_formula_tree,
                                               intermed_channels)

X = jax.random.uniform(jax.random.PRNGKey(7), (2, 8, 32, 32, 3))


@pytest.fixture(scope="module")
def models():
    formula = R2Plus1DNet(mid_mode="formula")
    padded = R2Plus1DNet(mid_mode="pad128")
    vf = formula.init(jax.random.PRNGKey(0), X, True)
    vp_tpl = padded.init(jax.random.PRNGKey(1), X, True)
    vp = {
        "params": embed_formula_tree(vf["params"], vp_tpl["params"]),
        "batch_stats": embed_formula_tree(vf["batch_stats"],
                                          vp_tpl["batch_stats"]),
    }
    return formula, padded, vf, vp_tpl, vp


def _pad_block_norm(params) -> float:
    """Sum |pad block| over every SpatioTemporalConv pair; logical widths
    recomputed from the kernel shapes themselves."""
    total, found = 0.0, 0

    def walk(node):
        nonlocal total, found
        if not isinstance(node, dict):
            return
        if "spatial_conv" in node and "temporal_conv" in node:
            sp = node["spatial_conv"]["kernel"]   # (1, kh, kw, cin, mid)
            tc = node["temporal_conv"]["kernel"]  # (kt, 1, 1, mid, cout)
            _, kh, kw, cin, mid_phys = sp.shape
            kt, _, _, _, cout = tc.shape
            logical = intermed_channels(cin, cout, (kt, kh, kw))
            assert mid_phys == -(-logical // 128) * 128
            total += float(jnp.abs(sp[..., logical:]).sum())
            total += float(jnp.abs(tc[:, :, :, logical:, :]).sum())
            found += 1
        for v in node.values():
            walk(v)

    walk(params)
    assert found >= 9  # conv1 + 2 per block + downsample convs
    return total


def test_pad_blocks_zero_at_init(models):
    _, _, _, vp_tpl, _ = models
    assert _pad_block_norm(vp_tpl["params"]) == 0.0


def test_embedded_forward_equivalence(models):
    formula, padded, vf, _, vp = models
    for train in (False, True):
        a = formula.apply(vf, X, train, mutable=["batch_stats"])[0]
        b = padded.apply(vp, X, train, mutable=["batch_stats"])[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-4)


def test_training_trajectory_matches_and_pads_stay_zero(models):
    formula, padded, vf, _, vp = models
    tx = optax.chain(optax.add_decayed_weights(1e-3),
                     optax.sgd(0.01, momentum=0.9))
    target = jax.random.normal(jax.random.PRNGKey(3), (2, 512))

    def run(model, variables, steps=4):
        params, bs = variables["params"], variables["batch_stats"]
        opt = tx.init(params)

        @jax.jit
        def step(params, bs, opt):
            def loss_fn(p):
                y, upd = model.apply({"params": p, "batch_stats": bs}, X,
                                     True, mutable=["batch_stats"])
                pooled = y.mean(axis=(1, 2, 3))
                return jnp.mean((pooled - target) ** 2), upd["batch_stats"]

            (loss, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            upd, nopt = tx.update(g, opt, params)
            return optax.apply_updates(params, upd), nbs, nopt, loss

        losses = []
        for _ in range(steps):
            params, bs, opt, loss = step(params, bs, opt)
            losses.append(float(loss))
        return losses, params

    lf, _ = run(formula, vf)
    lp, trained_padded = run(padded, vp)
    np.testing.assert_allclose(lf, lp, rtol=5e-3)
    # the structural claim: after real training steps the pad blocks of
    # every conv kernel are still bitwise zero
    assert _pad_block_norm(trained_padded) == 0.0
