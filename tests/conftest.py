"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware, and persist the XLA compilation
cache (compiles dominate test time on small hosts)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# this environment's CPU backend runs f32 matmuls at reduced precision by
# default; tests need deterministic full-precision numerics
jax.config.update("jax_default_matmul_precision", "highest")
