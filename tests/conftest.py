"""Test configuration: run tests on an 8-device virtual CPU backend so
multi-chip sharding paths run without TPU hardware (and without fighting
the axon platform hook, which forces its own default backend), and persist
the XLA compilation cache (compiles dominate test time on small hosts)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# persistent cache ONLY under the axon plugin: without it, XLA:CPU AOT
# deserialization on this host SEGFAULTS (even on entries written by the
# same process — reproducible at sim/pbd.py extract_rotation); with the
# plugin loaded the same loads work. CPU-only runs pay cold compiles.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# this environment's CPU backend runs f32 matmuls at reduced precision by
# default; tests need deterministic full-precision numerics
jax.config.update("jax_default_matmul_precision", "highest")

try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
# route all test computation to CPU even when a TPU plugin hijacks the
# default platform selection
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass


def cpu_devices(n=8):
    return jax.devices("cpu")[:n]


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "quick: cold-CI tier — modules that finish in minutes even with "
        "zero compile cache (plain-CPU runs are ALWAYS cold on this host: "
        "the XLA:CPU AOT cache segfaults off-plugin, see above). Run: "
        "pytest tests/ -m quick -q  (~3-4 min cold; scripts/ci_quick.sh)")
