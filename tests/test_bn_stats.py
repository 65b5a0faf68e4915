"""Pallas channel-sum kernels (ops/bn_stats.py) vs numpy oracle — the
opaque BN-stat boundary of the layer1 fusion-ceiling attempt #2 (round-4
VERDICT #2). Interpret mode on CPU; the on-hardware exactness + perf check
lives in scripts/layer1_fusion_probe.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dualvar_tpu.ops.bn_stats import channel_sums


@pytest.mark.parametrize("shape,dtype", [
    ((4, 6, 8, 8, 64), jnp.float32),
    ((2, 3, 5, 7, 128), jnp.bfloat16),   # odd rows -> XLA tail path
    ((16, 512), jnp.float32),
    ((7, 64), jnp.bfloat16),             # < 8 rows -> pure tail
])
def test_channel_sums_matches_oracle(shape, dtype):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k1, shape).astype(dtype)
    b = jax.random.normal(k2, shape).astype(dtype)
    s1, s2 = channel_sums(a, b, interpret=True)
    C = shape[-1]
    af = np.asarray(a, np.float32).reshape(-1, C)
    bf = np.asarray(b, np.float32).reshape(-1, C)
    np.testing.assert_allclose(np.asarray(s1), af.sum(0), rtol=2e-6,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2), (af * bf).sum(0), rtol=2e-6,
                               atol=2e-4)
    assert s1.dtype == jnp.float32 and s2.dtype == jnp.float32


def test_bn_train_fused_with_pallas_stats(monkeypatch):
    """_bn_train_fused must produce the same (y, mu, var) through the
    Pallas stat path as through the fused-XLA path (f32: identical sums up
    to reduction order)."""
    from dualvar_tpu.models import layers
    from dualvar_tpu.ops import bn_stats

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 5, 5, 64))
    scale = jnp.ones((64,)) * 1.3
    bias = jnp.ones((64,)) * 0.2
    y0, mu0, var0 = layers._bn_train_fused(x, scale, bias, 1e-5)

    monkeypatch.setenv("DUALVAR_BN_STATS", "pallas")
    orig = bn_stats._channel_sums_2d

    def interp(a2, b2, interpret=False):
        return orig(a2, b2, interpret=True)

    monkeypatch.setattr(bn_stats, "_channel_sums_2d", interp)
    y1, mu1, var1 = layers._bn_train_fused(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)

    # backward path through the pallas sums: compare dx/dscale/dbias under
    # a fixed cotangent (note sum(y^2) of a BN output is scale-invariant —
    # its grad is pure float noise, useless as an oracle)
    ct = jax.random.normal(jax.random.PRNGKey(2), x.shape)

    def run_bwd():
        def f(xx, sc, bi):
            y, _, _ = layers._bn_train_fused(xx, sc, bi, 1e-5)
            return jnp.sum(y * ct)

        return jax.grad(f, argnums=(0, 1, 2))(x, scale, bias)

    dx1, dsc1, dbi1 = run_bwd()
    monkeypatch.setenv("DUALVAR_BN_STATS", "xla")
    dx0, dsc0, dbi0 = run_bwd()
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dsc1), np.asarray(dsc0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dbi1), np.asarray(dbi0), atol=2e-4)
