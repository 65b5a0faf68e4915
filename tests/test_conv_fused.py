"""Interpret-mode checks for the experimental fused conv+BN-stats kernel
(dualvar_tpu/ops/conv_fused.py — see its STATUS note; not wired into
models, kept as the measured record of the fused-conv investigation)."""

import jax
import jax.numpy as jnp
import numpy as np

from dualvar_tpu.ops.conv_fused import _fused_fwd, conv3d_bn_stats_xla


def test_fused_conv_matches_xla_interpret():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 6, 6, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 8)) * 0.2, jnp.float32)
    y, s1, s2 = _fused_fwd(x, w, interpret=True)
    yr, s1r, s2r = conv3d_bn_stats_xla(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r), atol=1e-3)


def test_fused_conv_xla_reference_grads():
    """The custom_vjp backward (stat cotangents folded into dy) matches
    autodiff of the XLA reference contract."""
    from dualvar_tpu.ops import conv_fused

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3, 6, 6, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 8)) * 0.2, jnp.float32)

    def loss_ref(x, w):
        y, s1, s2 = conv_fused.conv3d_bn_stats_xla(x, w)
        return jnp.sum(jnp.sin(y)) + jnp.sum(s1 * 0.3) + jnp.sum(s2 * 0.1)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)

    # drive the custom_vjp bwd directly with the same cotangents
    y, s1, s2 = conv_fused.conv3d_bn_stats_xla(x, w)
    cots = (jnp.cos(y), jnp.full_like(s1, 0.3), jnp.full_like(s2, 0.1))
    gx, gw = conv_fused._bwd((x, w, y), cots)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=2e-3)
