"""Soft-DTW: XLA implementation vs an independent numpy DP, and the Pallas
kernel (interpret mode on CPU) vs the XLA oracle — the reference's own test
pattern (utils/soft_dtw_cuda.py:373-409 cross-checks CUDA vs numba-CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualvar_tpu.ops.soft_dtw import (
    euclidean_matrix,
    similarity_matrix,
    soft_dtw,
    soft_dtw_sequences,
)


def np_softdtw(D, gamma, bandwidth=0.0):
    """Straight-line DP, written from the recurrence (float64)."""
    B, N, M = D.shape
    R = np.full((B, N + 2, M + 2), np.inf)
    R[:, 0, 0] = 0
    for b in range(B):
        for j in range(1, M + 1):
            for i in range(1, N + 1):
                if 0 < bandwidth < abs(i - j):
                    continue
                r = np.array([-R[b, i - 1, j - 1], -R[b, i - 1, j], -R[b, i, j - 1]]) / gamma
                rmax = r.max()
                rsum = np.exp(r - rmax).sum()
                R[b, i, j] = D[b, i - 1, j - 1] - gamma * (np.log(rsum) + rmax)
    return R[:, -2, -2]


@pytest.fixture
def D():
    return np.random.RandomState(0).rand(6, 5, 7).astype(np.float32)


def test_xla_forward_matches_numpy(D):
    want = np_softdtw(D.astype(np.float64), 1.0)
    got = np.array(soft_dtw(jnp.array(D), 1.0, 0.0, "xla"))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_xla_forward_banded(D):
    want = np_softdtw(D.astype(np.float64), 0.7, bandwidth=2.0)
    got = np.array(soft_dtw(jnp.array(D), 0.7, 2.0, "xla"))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_xla_gradient_finite_difference(D):
    f = lambda d: jnp.sum(soft_dtw(d, 1.0, 0.0, "xla"))
    g = np.array(jax.grad(f)(jnp.array(D)))
    eps = 1e-3
    for idx in [(0, 0, 0), (2, 3, 4), (5, 4, 6)]:
        Dp, Dm = D.copy(), D.copy()
        Dp[idx] += eps
        Dm[idx] -= eps
        fd = (
            np_softdtw(Dp.astype(np.float64), 1.0).sum()
            - np_softdtw(Dm.astype(np.float64), 1.0).sum()
        ) / (2 * eps)
        assert abs(g[idx] - fd) < 1e-2


def test_pallas_interpret_matches_xla(D):
    y_xla = soft_dtw(jnp.array(D), 1.0, 0.0, "xla")
    y_pal = soft_dtw(jnp.array(D), 1.0, 0.0, "pallas_interpret")
    np.testing.assert_allclose(np.array(y_pal), np.array(y_xla), rtol=1e-6)


def test_pallas_interpret_grad_matches_xla(D):
    g_xla = jax.grad(lambda d: jnp.sum(soft_dtw(d, 1.0, 0.0, "xla")))(jnp.array(D))
    g_pal = jax.grad(lambda d: jnp.sum(soft_dtw(d, 1.0, 0.0, "pallas_interpret")))(
        jnp.array(D)
    )
    np.testing.assert_allclose(np.array(g_pal), np.array(g_xla), rtol=1e-5, atol=1e-6)


def test_distance_builders():
    rng = np.random.RandomState(1)
    x = jnp.array(rng.rand(2, 3, 4).astype(np.float32))
    y = jnp.array(rng.rand(2, 5, 4).astype(np.float32))
    S = np.array(similarity_matrix(x, y))
    E = np.array(euclidean_matrix(x, y))
    xn, yn = np.array(x), np.array(y)
    np.testing.assert_allclose(S[1, 2, 3], xn[1, 2] @ yn[1, 3], rtol=1e-6)
    np.testing.assert_allclose(
        E[1, 2, 3], ((xn[1, 2] - yn[1, 3]) ** 2).sum(), rtol=1e-6
    )
    out = soft_dtw_sequences(x, y, 1.0, 0.0, "euclidean", impl="xla")
    assert out.shape == (2,)


def test_pallas_kernel_matches_oracle_on_device():
    """Hardware regression check for the PARITY bit-exactness claim: the
    Pallas fwd AND bwd kernels must equal the XLA oracle ON TPU. Skipped
    off-TPU (the conftest forces the CPU platform for the suite; this test
    exists for on-hardware runs — bench.py also runs the same check every
    bench invocation via scripts/softdtw_device_check.py)."""
    import jax
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("needs a TPU; covered on-hardware by bench.py")
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.softdtw_device_check import run_check

    fwd_err, bwd_err, impl = run_check(verbose=False)
    assert impl == "pallas"
    assert fwd_err == 0.0, f"Pallas fwd drifted from oracle: {fwd_err}"
    assert bwd_err == 0.0, f"Pallas bwd drifted from oracle: {bwd_err}"
