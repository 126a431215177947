"""Test config: force CPU with a virtual 8-device mesh (set BEFORE jax import).

Mirrors the multi-chip simulation strategy from SURVEY.md §4: sharding tests
run on `--xla_force_host_platform_device_count=8` CPU devices; the driver
separately dry-runs the real multi-chip path.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Force the CPU backend with 8 virtual devices. NOTE: on this machine the
# JAX_PLATFORMS / XLA_FLAGS env vars are overridden by the axon TPU plugin,
# so the config API is the only reliable way — without it, "CPU" tests
# silently run on (and contend for) the single tunneled TPU chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache: repeated test runs skip XLA recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/ff_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest

REFERENCE_ROOT = "/root/reference"


def pytest_configure(config):
    # `-m "not slow"` is the quick dev loop (~1/3 wall); the FULL suite
    # (default, no -m filter) remains the green gate the driver runs.
    config.addinivalue_line(
        "markers", "slow: multi-minute end-to-end parity/training suites")


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "core"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted at /root/reference"
)


@pytest.fixture(scope="session")
def ref_ffraft_modules():
    """Import the reference FF-RAFT core (torch CPU) for parity checks."""
    path = os.path.join(REFERENCE_ROOT, "core/models/ff-raft")
    if path not in sys.path:
        sys.path.insert(0, path)
    import FF_RAFT_Core.raft as ref_raft
    import FF_RAFT_Core.ff_raft as ref_ff_raft
    import losses.losses as ref_losses

    return ref_raft, ref_ff_raft, ref_losses
