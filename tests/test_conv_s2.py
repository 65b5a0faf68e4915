"""conv3d_s2: the phase-decomposed data gradient for stride-2 convs must be
exactly the autodiff gradient of the standard lowering, for every stride
pattern the backbones use (layers.py conv3d_s2 / _phase_dgrad)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualvar_tpu.models.layers import _conv3d, conv3d_s2


CASES = [
    # (stride, padding, x shape, kernel thw) — backbone downsample shapes
    ((2, 2, 2), (1, 1, 1), (2, 8, 12, 10, 5), (3, 3, 3)),   # r3d layer2-4
    ((1, 2, 2), (1, 1, 1), (2, 5, 12, 10, 5), (3, 3, 3)),   # spatial-only
    ((2, 1, 1), (1, 0, 0), (2, 8, 6, 6, 5), (3, 1, 1)),     # r21d temporal
    ((2, 2, 2), (1, 1, 1), (1, 4, 6, 8, 3), (3, 3, 3)),     # odd channels
]


@pytest.mark.parametrize("stride,pad,shape,k", CASES)
def test_phase_dgrad_matches_autodiff(stride, pad, shape, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((*k, shape[-1], 7)) * 0.2, jnp.float32)

    def f_custom(x, w):
        return jnp.sum(jnp.sin(conv3d_s2(x, w, stride, pad)))

    def f_ref(x, w):
        return jnp.sum(jnp.sin(_conv3d(x, w, stride, pad)))

    v1, g1 = jax.value_and_grad(f_custom, argnums=(0, 1))(x, w)
    v2, g2 = jax.value_and_grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=2e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=2e-6)


def test_stride4_uses_standard_path():
    """Strides outside {1,2} must not route into the phase-decomposed
    dgrad (regression: the guard admitted them and the backward
    KeyError'd at trace time)."""
    from dualvar_tpu.models.layers import Conv3d

    conv = Conv3d(6, kernel_size=3, stride=(2, 4, 4), padding=1,
                  use_bias=False)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 4, 8, 8, 3)), jnp.float32)
    v = conv.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p, x: jnp.sum(conv.apply(p, x) ** 2))(v, x)
    assert np.isfinite(np.asarray(
        jax.tree_util.tree_leaves(g)[0])).all()
