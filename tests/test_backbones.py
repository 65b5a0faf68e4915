"""Backbone parity: parameter counts and output shapes vs the torch reference.

Goldens were produced by running the reference backbones on CPU
(backbone/select_backbone.py registry, input (1,3,16,112,112)):

    c3d      feature 512   27,661,440 params   out (1,512,2,7,7)
    r3d      feature 512   14,361,792          out (1,512,2,7,7)
    r21d     feature 512   14,365,303          out (1,512,2,7,7)
    s3d      feature 1024   7,910,048          out (1,1024,2,3,3)
    s3dg     feature 1024   9,098,000          out (1,1024,2,3,3)
    r2d3d18  feature 256    5,210,176          out (1,256,16,4,4)

r50 (r2d3d50) cannot be constructed in the reference (two latent defects, see
models/backbones/resnet_2d3d.py docstring); we pin our own implementation's
contract instead. Shapes here are channels-last (B, T, H, W, C).

Uses jax.eval_shape so no convolutions actually run — numerical behavior is
covered by the train-step smoke tests.
"""

import jax
import jax.numpy as jnp
import pytest

from dualvar_tpu.models.backbones import select_backbone

GOLDENS = {
    "c3d": (512, 27_661_440, (1, 2, 7, 7, 512)),
    "r3d": (512, 14_361_792, (1, 2, 7, 7, 512)),
    "r21d": (512, 14_365_303, (1, 2, 7, 7, 512)),
    "s3d": (1024, 7_910_048, (1, 2, 3, 3, 1024)),
    "s3dg": (1024, 9_098_000, (1, 2, 3, 3, 1024)),
    "r2d3d18": (256, 5_210_176, (1, 16, 4, 4, 256)),
    "r50": (1024, 17_401_920, (1, 16, 4, 4, 1024)),
}


@pytest.mark.parametrize("net", sorted(GOLDENS))
def test_backbone_contract(net):
    feature_size, n_params, out_shape = GOLDENS[net]
    model, param = select_backbone(net)
    assert param["feature_size"] == feature_size

    x = jnp.zeros((1, 16, 112, 112, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(lambda r, x: model.init(r, x, train=False), rng, x)
    count = sum(
        int(jnp.prod(jnp.array(leaf.shape)))
        for leaf in jax.tree.leaves(variables["params"])
    )
    assert count == n_params, f"{net}: {count} != {n_params}"

    out = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), variables, x
    )
    assert tuple(out.shape) == out_shape


def test_r3d_s2d_stem_equivalent():
    """Space-to-depth stem evaluates to the same function as the plain
    stride-2 stem (checkpoint-compatible parameter tree)."""
    from dualvar_tpu.models.backbones.r3d import R3DNet

    plain = R3DNet()
    s2d = R3DNet(s2d_stem=True)
    x = jnp.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 32, 36, 3)))
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    y0 = plain.apply(variables, x, train=False)
    y1 = s2d.apply(variables, x, train=False)
    assert y0.shape == y1.shape
    import numpy as np

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)


def test_r21d_tiled_variant():
    """TPU-native r21d variant: (2+1)D mid widths snapped to 128-lane
    tiles (NOT reference parity; see r21d.intermed_channels). Parameter
    budget stays within 5% of the paper formula."""
    import jax
    import jax.numpy as jnp

    from dualvar_tpu.models.backbones import select_backbone
    from dualvar_tpu.models.backbones.r21d import intermed_channels

    assert intermed_channels(3, 64, (3, 7, 7), "tile128") == 128
    assert intermed_channels(64, 64, (3, 3, 3), "tile128") == 128
    assert intermed_channels(256, 512, (3, 3, 3), "tile128") == 896

    x = jnp.zeros((1, 4, 32, 32, 3))
    tiled, meta = select_backbone("r21d_tiled", jnp.float32)
    assert meta["feature_size"] == 512
    v = tiled.init(jax.random.PRNGKey(0), x, True)
    ref, _ = select_backbone("r21d", jnp.float32)
    v2 = ref.init(jax.random.PRNGKey(0), x, True)
    n_tiled = sum(a.size for a in jax.tree.leaves(v["params"]))
    n_ref = sum(a.size for a in jax.tree.leaves(v2["params"]))
    assert abs(n_tiled / n_ref - 1) < 0.05, (n_tiled, n_ref)
    out, _ = tiled.apply(v, x, True, mutable=["batch_stats"])
    assert out.shape == (1, 1, 2, 2, 512)
