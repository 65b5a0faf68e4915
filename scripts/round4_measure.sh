#!/bin/bash
# One-shot round-4 hardware measurement plan — run the moment the TPU relay
# recovers (round-3 VERDICT #1/#5/#8). Serializes all TPU work (never two
# TPU processes at once) and bounds every step.
#
# Usage: bash scripts/round4_measure.sh 2>&1 | tee /tmp/round4_measure.log
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  echo "=== [$(date +%H:%M:%S)] $*" >&2
  timeout 1500 "$@"
  echo "=== rc=$? ===" >&2
}

# 0. preflight (fail fast if the relay is still dead)
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "relay still dead; aborting" >&2; exit 1; }

# 1. headline bench with the fused aug kernel (BENCH_r04 preview)
run python bench.py

# 2. input-pipeline-fed bench (native decoder -> HostLoader -> H2D)
run python bench.py --input-pipeline

# 3. r21d flagship: B=32 baseline, B=64 with --remat, r21d_tiled variant
run python scripts/r21d_ceiling.py --measure --B 32
run python scripts/r21d_ceiling.py --measure --B 64 --remat
run python scripts/r21d_ceiling.py --measure --B 32 --net r21d_tiled

# 4. fused aug kernel: bf16 in-kernel compute (VERDICT #5 measurement)
run python scripts/aug_overhead_probe.py
run python -c "
import sys; sys.path.insert(0, '.')
import time, numpy as np, jax, jax.numpy as jnp
from dualvar_tpu.aug.pipeline import AugConfig, pretrain_batch_fused
frames = jax.device_put(np.random.default_rng(0).integers(
    0, 255, (128, 32, 171, 128, 3), dtype=np.uint8))
for comp in ('float32', 'bfloat16'):
    cfg = AugConfig(img_dim=112, seq_len=16, fused='on', fused_compute=comp,
                    jitter_order='sample')
    key = jax.random.PRNGKey(0)
    try:
        out = pretrain_batch_fused(key, frames, cfg)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(10):
            out = pretrain_batch_fused(jax.random.fold_in(key, i), frames, cfg)
        jax.block_until_ready(out)
        print(f'fused_compute={comp}: {(time.perf_counter()-t0)/10*1e3:.1f} ms')
    except Exception as e:
        print(f'fused_compute={comp}: FAILED {type(e).__name__}: {e}')
"

# 5. VERDICT #8: microbatched encode probe (bounded; record and close)
run python scripts/microbatch_encode.py

# 6. batch-size frontier: B=192 was never probed (128 ok, 256 OOM by 216MB);
#    with the fused aug kernel's smaller intermediates it may now fit
run python scripts/perf_sweep.py 192
run python scripts/perf_sweep.py remat192

echo "ALL MEASUREMENTS DONE — record results in PARITY.md round-4 section" >&2
