"""Re-verify the fused Pallas augmentation kernel against the unfused jnp
pipeline ON the current default backend (the real Mosaic kernel on TPU).

Same self-check pattern as scripts/softdtw_device_check.py (reference
precedent: utils/soft_dtw_cuda.py:373-409): the fused path draws randomness
with the unfused path's exact key splits, so with the same key the two must
agree to the f32 chain tolerance. The only allowed difference is the blur:
the unfused TPU blur einsum runs bf16 MXU operands (default precision) while
the kernel blur is f32-exact, leaving ~5e-2 max error in normalized space on
blurred clips.

Run with --json to print one machine-readable line on stdout (bench.py mode).
Exit code 0 iff max error < 0.2.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_check(attribute: bool = False):
    """Returns max |fused - unfused| on the current backend; with
    ``attribute=True`` also re-runs the unfused pipeline under
    default_matmul_precision='highest' (f32 MXU operands) and returns that
    error too — if the residual collapses, the gap is PROVEN to be the
    unfused blur's bf16 MXU operands, not a kernel bug (round-4 VERDICT #6:
    the 0.0253 on-device max_err needed a demonstrated attribution)."""
    from dualvar_tpu.aug.pipeline import (AugConfig, _pretrain_batch_unfused,
                                          pretrain_batch_fused)

    frames = jax.device_put(np.random.default_rng(3).integers(
        0, 255, (8, 2 * 16, 171, 128, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(5)
    cfg = dict(img_dim=112, seq_len=16, fused_compute="float32")
    fused = pretrain_batch_fused(key, frames, AugConfig(**cfg, fused="on"))
    ref = _pretrain_batch_unfused(key, frames, AugConfig(**cfg, fused="off"))
    err = float(jnp.max(jnp.abs(fused - ref)))
    if not attribute:
        return err
    with jax.default_matmul_precision("highest"):
        ref32 = jax.jit(lambda k, f: _pretrain_batch_unfused(
            k, f, AugConfig(**cfg, fused="off")))(key, frames)
    err32 = float(jnp.max(jnp.abs(fused - ref32)))
    return err, err32


def attribution(err: float, err32: float) -> dict:
    """Per-op bound + rationale for the bench record (VERDICT #6 done
    condition). The unfused blur is a separable gaussian einsum whose MXU
    operands round to bf16 at default precision (~2^-8 relative on [0,1]
    pixels -> up to ~0.05 in normalized space after /std ~ 0.225); the
    fused kernel computes the same taps in f32 (ops/aug_fused.py blur
    section). Forcing the unfused einsum to f32 ('highest') removes the
    operand rounding, so the residual err32 is the true fused-vs-unfused
    disagreement."""
    return {
        "op": "blur (unfused einsum bf16 MXU operands; kernel is f32)",
        "bound": 0.06,
        "residual_f32_blur": err32,
        "rationale": ("benign: bf16 operand rounding of the UNFUSED "
                      "reference path, ~1e-2 of the aug noise floor; "
                      "kernel is the more precise side"
                      if err32 < 5e-3 else
                      "ATTRIBUTION FAILED: residual survives f32 blur"),
    }


def main() -> int:
    as_json = "--json" in sys.argv
    err, err32 = run_check(attribute=True)
    ok = err < 0.2 and err32 < 5e-3
    if as_json:
        import json
        print(json.dumps({"max_err": err, "ok": ok,
                          "attribution": attribution(err, err32),
                          "backend": jax.default_backend()}))
    else:
        print(f"fused aug vs unfused [{jax.default_backend()}]: "
              f"max err {err:.2e}, with f32-blur unfused ref {err32:.2e} "
              f"-> {'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
