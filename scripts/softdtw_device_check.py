"""Re-verify the Pallas soft-DTW kernels against the pure-XLA oracle ON the
current default backend (the hardware kernel when a TPU is attached).

The reference ships a self-check comparing its CUDA kernels against the
numba-CPU implementation (utils/soft_dtw_cuda.py:373-409); this is the
TPU-native equivalent, runnable standalone and wired into bench.py so the
PARITY "bit-exact vs oracle on TPU" claim is re-verified on every bench run
instead of being a one-off measurement.

Exit code 0 iff forward AND backward match to f32 exactness on every probed
shape/bandwidth combination.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_check(verbose: bool = True) -> tuple[float, float, str]:
    """Returns (max_fwd_err, max_bwd_err, impl_used). impl 'pallas' means the
    real Mosaic kernel (TPU); off-TPU falls back to the interpreter (still a
    kernel-logic check, not a hardware check)."""
    from dualvar_tpu.ops.soft_dtw import soft_dtw

    impl = "pallas" if jax.default_backend() == "tpu" else "pallas_interpret"
    rng = np.random.default_rng(0)
    fwd_err = bwd_err = 0.0
    # n_series in 2..16 are the production sizes; 130 exercises batch padding
    # past the 128-lane tile. Kept to 4 combos: each is a fresh fwd+bwd
    # compile and this runs inside every bench invocation.
    for B, N, M in ((130, 4, 4), (16, 16, 16)):
        D = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
        for bw in (0.0, 2.0):
            for g in (0.1,):
                def val(d, i):
                    return jnp.sum(soft_dtw(d, g, bw, i))

                yk, gk = jax.value_and_grad(lambda d: val(d, impl))(D)
                yo, go = jax.value_and_grad(lambda d: val(d, "xla"))(D)
                fe = float(jnp.max(jnp.abs(
                    soft_dtw(D, g, bw, impl) - soft_dtw(D, g, bw, "xla"))))
                be = float(jnp.max(jnp.abs(gk - go)))
                fwd_err = max(fwd_err, fe)
                bwd_err = max(bwd_err, be)
                if verbose:
                    print(f"  B={B} N={N} M={M} bw={bw} gamma={g}: "
                          f"fwd_err={fe:.2e} bwd_err={be:.2e}",
                          file=sys.stderr)
    return fwd_err, bwd_err, impl


def main() -> int:
    as_json = "--json" in sys.argv
    fwd, bwd, impl = run_check(verbose=not as_json)
    ok = fwd == 0.0 and bwd == 0.0
    if as_json:
        import json
        print(json.dumps({"impl": impl, "fwd_err": fwd, "bwd_err": bwd,
                          "exact": ok}))
    else:
        print(f"softdtw device check [{impl} on {jax.default_backend()}]: "
              f"max fwd err {fwd:.3e}, max bwd err {bwd:.3e} -> "
              f"{'EXACT' if ok else 'MISMATCH'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
