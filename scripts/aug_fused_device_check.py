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


def run_check() -> float:
    from dualvar_tpu.aug.pipeline import (AugConfig, _pretrain_batch_unfused,
                                          pretrain_batch_fused)

    frames = jax.device_put(np.random.default_rng(3).integers(
        0, 255, (8, 2 * 16, 171, 128, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(5)
    cfg = dict(img_dim=112, seq_len=16, fused_compute="float32")
    fused = pretrain_batch_fused(key, frames, AugConfig(**cfg, fused="on"))
    ref = _pretrain_batch_unfused(key, frames, AugConfig(**cfg, fused="off"))
    return float(jnp.max(jnp.abs(fused - ref)))


def main() -> int:
    as_json = "--json" in sys.argv
    err = run_check()
    ok = err < 0.2
    if as_json:
        import json
        print(json.dumps({"max_err": err, "ok": ok,
                          "backend": jax.default_backend()}))
    else:
        print(f"fused aug vs unfused [{jax.default_backend()}]: "
              f"max err {err:.2e} -> {'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
