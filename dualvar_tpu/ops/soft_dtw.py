"""Differentiable soft-DTW (dynamic time warping) for TPU.

Capability parity with reference utils/soft_dtw_cuda.py: given a batch of
pairwise-distance matrices D (B, N, M), compute the soft minimum over
monotone alignment paths,

    R[i,j] = D[i-1,j-1] + softmin_gamma(R[i-1,j-1], R[i-1,j], R[i,j-1]),

returning R[N, M], with the analytic backward pass through the E-matrix
recurrence (reference kernels: forward :33-75, backward :78-111) and optional
Sakoe-Chiba ``bandwidth`` pruning.

TPU design. The CUDA reference assigns one thread per row and sweeps 2N-1
anti-diagonals with ``cuda.syncthreads()`` between passes. On TPU the
sequences are tiny (n_series in 2..16) and the parallel axis is the *batch*:
the Pallas kernel lays the batch out on the 128-wide lane dimension —
R is (N+2, M+2, bb) in VMEM — and statically unrolls the anti-diagonal sweep,
each pass updating the whole (masked) wavefront for all bb clips at once with
VPU ops. No semaphores needed: the sequential dependency lives entirely
inside one program invocation.

Both a Pallas kernel and a pure-XLA implementation (the test oracle, mirror
of the numba CPU fallback :184-239) are provided; ``soft_dtw(..., impl=...)``
selects, defaulting to Pallas on TPU.

Like the reference module (SoftDTW._similarity_dist_func, :321-331), the
companion ``similarity_matrix``/``euclidean_matrix`` helpers build D from two
batches of sequences.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INF = jnp.inf


def similarity_matrix(x: Array, y: Array) -> Array:
    """D[b,i,j] = <x[b,i], y[b,j]> (reference :321-331)."""
    return jnp.einsum("bid,bjd->bij", x, y)


def euclidean_matrix(x: Array, y: Array) -> Array:
    """D[b,i,j] = ||x[b,i] - y[b,j]||^2 (reference :309-319)."""
    return jnp.sum((x[:, :, None, :] - y[:, None, :, :]) ** 2, axis=-1)


def _softmin3(a: Array, b: Array, c: Array, gamma: float) -> Array:
    """-gamma * log(sum exp(-r/gamma)) over three values, inf-safe."""
    r0, r1, r2 = -a / gamma, -b / gamma, -c / gamma
    rmax = jnp.maximum(jnp.maximum(r0, r1), r2)
    safe = jnp.where(jnp.isfinite(rmax), rmax, 0.0)
    ex = (
        jnp.where(jnp.isneginf(r0), 0.0, jnp.exp(r0 - safe))
        + jnp.where(jnp.isneginf(r1), 0.0, jnp.exp(r1 - safe))
        + jnp.where(jnp.isneginf(r2), 0.0, jnp.exp(r2 - safe))
    )
    return jnp.where(ex > 0.0, -gamma * (jnp.log(ex) + safe), _INF)


def _band_mask(N: int, M: int, bandwidth: float) -> Array:
    """(N, M) bool — True where the 1-indexed cell (i,j) is inside the band."""
    i = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0) + 1
    j = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1) + 1
    if bandwidth > 0:
        return jnp.abs(i - j) <= bandwidth
    return jnp.ones((N, M), bool)


# --------------------------------------------------------------------------
# pure-XLA implementation (oracle; mirror of reference numba CPU :184-239)
# --------------------------------------------------------------------------

def _softdtw_R_xla(D: Array, gamma: float, bandwidth: float) -> Array:
    """Full R matrix, (B, N+2, M+2); R[:, N, M] is the soft-DTW value."""
    B, N, M = D.shape
    R = jnp.full((B, N + 2, M + 2), _INF, D.dtype)
    R = R.at[:, 0, 0].set(0.0)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0) + 1
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1) + 1
    band = _band_mask(N, M, bandwidth)
    for p in range(2, N + M + 1):  # anti-diagonal i+j == p; N, M are static
        cand = _softmin3(
            R[:, 0:N, 0:M], R[:, 0:N, 1 : M + 1], R[:, 1 : N + 1, 0:M], gamma
        ) + D
        mask = ((i_idx + j_idx) == p) & band
        inner = jnp.where(mask[None], cand, R[:, 1 : N + 1, 1 : M + 1])
        R = R.at[:, 1 : N + 1, 1 : M + 1].set(inner)
    return R


def _softdtw_E_xla(D: Array, R: Array, gamma: float, bandwidth: float) -> Array:
    """E matrix inner block, (B, N, M) — d(soft_dtw)/d(D)."""
    B, N, M = D.shape
    Dp = jnp.zeros((B, N + 2, M + 2), D.dtype)
    Dp = Dp.at[:, 1 : N + 1, 1 : M + 1].set(D)
    R = jnp.where(jnp.isinf(R), -_INF, R)  # reference bwd :100-101 / :225-226
    R = R.at[:, :, -1].set(-_INF)
    R = R.at[:, -1, :].set(-_INF)
    R = R.at[:, -1, -1].set(R[:, -2, -2])
    E = jnp.zeros((B, N + 2, M + 2), D.dtype)
    E = E.at[:, -1, -1].set(1.0)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0) + 1
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1) + 1
    band = _band_mask(N, M, bandwidth)
    inv_g = 1.0 / gamma
    for p in range(N + M, 1, -1):  # reversed anti-diagonals
        Rin = R[:, 1 : N + 1, 1 : M + 1]
        a = jnp.exp((R[:, 2 : N + 2, 1 : M + 1] - Rin - Dp[:, 2 : N + 2, 1 : M + 1]) * inv_g)
        b = jnp.exp((R[:, 1 : N + 1, 2 : M + 2] - Rin - Dp[:, 1 : N + 1, 2 : M + 2]) * inv_g)
        c = jnp.exp((R[:, 2 : N + 2, 2 : M + 2] - Rin - Dp[:, 2 : N + 2, 2 : M + 2]) * inv_g)
        cand = (
            E[:, 2 : N + 2, 1 : M + 1] * a
            + E[:, 1 : N + 1, 2 : M + 2] * b
            + E[:, 2 : N + 2, 2 : M + 2] * c
        )
        mask = ((i_idx + j_idx) == p) & band
        inner = jnp.where(mask[None], cand, E[:, 1 : N + 1, 1 : M + 1])
        E = E.at[:, 1 : N + 1, 1 : M + 1].set(inner)
    return E[:, 1 : N + 1, 1 : M + 1]


# --------------------------------------------------------------------------
# Pallas TPU kernels — batch on the lane axis, unrolled wavefront
# --------------------------------------------------------------------------

_BB = 128  # batch tile == lane width

# Pallas/Mosaic has no scatter: all wavefront updates are full-grid
# shift-and-mask ops — (N+2, M+2, BB) arrays, shifts built from static
# slices + concatenate, the active anti-diagonal selected with jnp.where.


def _shift_down(x, fill):
    """y[i] = x[i-1]; row 0 = fill."""
    top = jnp.full((1,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([top, x[:-1]], axis=0)


def _shift_right(x, fill):
    """y[:, j] = x[:, j-1]; col 0 = fill."""
    left = jnp.full((x.shape[0], 1) + x.shape[2:], fill, x.dtype)
    return jnp.concatenate([left, x[:, :-1]], axis=1)


def _shift_up(x, fill):
    bot = jnp.full((1,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[1:], bot], axis=0)


def _shift_left(x, fill):
    right = jnp.full((x.shape[0], 1) + x.shape[2:], fill, x.dtype)
    return jnp.concatenate([x[:, 1:], right], axis=1)


def _pad_interior(d, N, M):
    """(N, M, bb) -> (N+2, M+2, bb) with a zero border."""
    bb = d.shape[-1]
    zrow = jnp.zeros((1, M, bb), d.dtype)
    d = jnp.concatenate([zrow, d, zrow], axis=0)
    zcol = jnp.zeros((N + 2, 1, bb), d.dtype)
    return jnp.concatenate([zcol, d, zcol], axis=1)


def _grid_ij(N, M):
    i = jax.lax.broadcasted_iota(jnp.int32, (N + 2, M + 2, 1), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (N + 2, M + 2, 1), 1)
    return i, j


def _full_band(i, j, N, M, bandwidth):
    interior = (i >= 1) & (i <= N) & (j >= 1) & (j <= M)
    if bandwidth > 0:
        interior = interior & (jnp.abs(i - j) <= bandwidth)
    return interior


def _fwd_kernel(d_ref, r_ref, *, gamma: float, bandwidth: float, N: int, M: int):
    # d_ref: (N, M, BB); r_ref: (N+2, M+2, BB)
    i, j = _grid_ij(N, M)
    origin = (i == 0) & (j == 0)
    active = _full_band(i, j, N, M, bandwidth)
    d_full = _pad_interior(d_ref[:].astype(jnp.float32), N, M)
    r = jnp.where(origin, 0.0, _INF)
    r = jnp.broadcast_to(r, d_full.shape).astype(jnp.float32)
    for p in range(2, N + M + 1):
        r_nw = _shift_right(_shift_down(r, _INF), _INF)
        r_n = _shift_down(r, _INF)
        r_w = _shift_right(r, _INF)
        cand = _softmin3(r_nw, r_n, r_w, gamma) + d_full
        mask = ((i + j) == p) & active
        r = jnp.where(mask, cand, r)
    r_ref[:] = r


def _bwd_kernel(d_ref, r_ref, g_ref, e_ref, *, gamma: float, bandwidth: float,
                N: int, M: int):
    # d_ref: (N, M, BB); r_ref: (N+2, M+2, BB); g_ref: (1, BB); e_ref: (N, M, BB)
    i, j = _grid_ij(N, M)
    active = _full_band(i, j, N, M, bandwidth)
    dp = _pad_interior(d_ref[:].astype(jnp.float32), N, M)
    r = r_ref[:].astype(jnp.float32)
    r = jnp.where(jnp.isinf(r), -_INF, r)  # reference bwd :100-101
    r = jnp.where((i == N + 1) | (j == M + 1), -_INF, r)
    rNM = r_ref[N, M, :][None, None, :]
    corner = (i == N + 1) & (j == M + 1)
    r = jnp.where(corner, rNM, r)
    e = jnp.where(corner, 1.0, 0.0)
    e = jnp.broadcast_to(e, r.shape).astype(jnp.float32)
    inv_g = 1.0 / gamma
    for p in range(N + M, 1, -1):
        r_s = _shift_up(r, -_INF)
        r_e = _shift_left(r, -_INF)
        r_se = _shift_left(_shift_up(r, -_INF), -_INF)
        dp_s = _shift_up(dp, 0.0)
        dp_e = _shift_left(dp, 0.0)
        dp_se = _shift_left(_shift_up(dp, 0.0), 0.0)
        a = jnp.exp((r_s - r - dp_s) * inv_g)
        b = jnp.exp((r_e - r - dp_e) * inv_g)
        c = jnp.exp((r_se - r - dp_se) * inv_g)
        cand = _shift_up(e, 0.0) * a + _shift_left(e, 0.0) * b \
            + _shift_left(_shift_up(e, 0.0), 0.0) * c
        mask = ((i + j) == p) & active
        e = jnp.where(mask, cand, e)
    e_ref[:] = e[1 : N + 1, 1 : M + 1, :] * g_ref[0, :][None, None, :]


def _pad_batch(x: Array, bb: int) -> tuple[Array, int]:
    B = x.shape[-1]
    Bp = -(-B // bb) * bb
    if Bp != B:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)]
        x = jnp.pad(x, pad)
    return x, Bp


def _softdtw_R_pallas(D: Array, gamma: float, bandwidth: float,
                      interpret: bool = False) -> Array:
    """R via the Pallas wavefront kernel. Returns (B, N+2, M+2)."""
    B, N, M = D.shape
    Dt = jnp.moveaxis(D.astype(jnp.float32), 0, -1)  # (N, M, B)
    Dt, Bp = _pad_batch(Dt, _BB)
    kern = functools.partial(_fwd_kernel, gamma=gamma, bandwidth=bandwidth, N=N, M=M)
    r = pl.pallas_call(
        kern,
        grid=(Bp // _BB,),
        in_specs=[pl.BlockSpec((N, M, _BB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N + 2, M + 2, _BB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + 2, M + 2, Bp), jnp.float32),
        interpret=interpret,
    )(Dt)
    return jnp.moveaxis(r, -1, 0)[:B]


def _softdtw_E_pallas(D: Array, R: Array, g: Array, gamma: float, bandwidth: float,
                      interpret: bool = False) -> Array:
    B, N, M = D.shape
    Dt = jnp.moveaxis(D.astype(jnp.float32), 0, -1)
    Rt = jnp.moveaxis(R.astype(jnp.float32), 0, -1)
    Gt = g.astype(jnp.float32)[None, :]  # (1, B)
    Dt, Bp = _pad_batch(Dt, _BB)
    Rt, _ = _pad_batch(Rt, _BB)
    Gt, _ = _pad_batch(Gt, _BB)
    kern = functools.partial(_bwd_kernel, gamma=gamma, bandwidth=bandwidth, N=N, M=M)
    e = pl.pallas_call(
        kern,
        grid=(Bp // _BB,),
        in_specs=[
            pl.BlockSpec((N, M, _BB), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N + 2, M + 2, _BB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, M, _BB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, M, Bp), jnp.float32),
        interpret=interpret,
    )(Dt, Rt, Gt)
    return jnp.moveaxis(e, -1, 0)[:B]


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------

Impl = Literal["auto", "pallas", "xla", "pallas_interpret"]


def _use_pallas(impl: Impl) -> bool:
    if impl == "auto":
        return jax.default_backend() == "tpu"
    return impl.startswith("pallas")


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def soft_dtw(D: Array, gamma: float = 1.0, bandwidth: float = 0.0,
             impl: Impl = "auto") -> Array:
    """Soft-DTW values, (B,), for distance matrices D (B, N, M).

    Differentiable in D (reference SoftDTW module :273-343). ``bandwidth`` 0
    disables Sakoe-Chiba pruning.
    """
    y, _ = _soft_dtw_fwd(D, gamma, bandwidth, impl)
    return y


def _soft_dtw_fwd(D, gamma, bandwidth, impl):
    if _use_pallas(impl):
        R = _softdtw_R_pallas(D, gamma, bandwidth, interpret=impl == "pallas_interpret")
    else:
        R = _softdtw_R_xla(D, gamma, bandwidth)
    return R[:, -2, -2], (D, R)


def _soft_dtw_bwd(gamma, bandwidth, impl, res, g):
    D, R = res
    if _use_pallas(impl):
        dD = _softdtw_E_pallas(D, R, g, gamma, bandwidth,
                               interpret=impl == "pallas_interpret")
    else:
        E = _softdtw_E_xla(D, R, gamma, bandwidth)
        dD = E * g[:, None, None]
    return (dD.astype(D.dtype),)


soft_dtw.defvjp(_soft_dtw_fwd, _soft_dtw_bwd)


def soft_dtw_sequences(x: Array, y: Array, gamma: float = 1.0,
                       bandwidth: float = 0.0, dist: str = "similarity",
                       impl: Impl = "auto") -> Array:
    """Soft-DTW between sequence batches x (B,N,d), y (B,M,d).

    ``dist='similarity'`` uses the reference's default inner-product cost
    (soft_dtw_cuda.py:321-331), 'euclidean' the squared L2 cost.
    """
    D = similarity_matrix(x, y) if dist == "similarity" else euclidean_matrix(x, y)
    return soft_dtw(D, gamma, bandwidth, impl)
