"""Test harness configuration.

Forces the CPU platform with 8 virtual XLA devices — the JAX-native
replacement for a multi-node cluster (SURVEY.md §4) — and a persistent
compilation cache so repeat test runs skip XLA compiles.

Fast/slow split: the real 2-process ``jax.distributed`` scripts
(tests/test_multihost.py) are ``@pytest.mark.slow`` and DESELECTED by
default via ``addopts = "-m 'not slow'"`` in pyproject.toml — they cost
~45 of the full suite's ~58 min on a 1-core rig. ``pytest tests/`` is the
<15-min fast path; ``pytest tests/ -m 'slow or not slow'`` runs everything
(the pre-release habit); ``pytest tests/ -m slow`` runs just the
distributed scripts.

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on (virtual multi-)CPU
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is NOT enough on this rig: the axon sitecustomize calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter startup,
# which takes precedence over JAX_PLATFORMS — and a wedged relay then hangs
# every backends() call. The explicit config update wins over both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/dualvar_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# jax 0.9 XLA:CPU runs DEFAULT-precision matmuls/convs at reduced precision
# (~5e-4 relative vs numpy); the oracle/parity tests need true f32
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
