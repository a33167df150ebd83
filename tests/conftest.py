"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8); the real TPU
is exercised by bench.py, not the test suite.

KNOWN BLIND SPOT: a program can be bit-exact on CPU and wrong on TPU
(e.g. the r2-r4 grouped-scan leaf-id bitcast: denormal floats flushed to
zero only on hardware). bench.py's `exact_oracle_max_err` (10k-point
brute-force comparison ON the TPU, run every round) is the hardware
correctness gate — CPU-green alone does not clear numeric-carrier or
Mosaic-lowering changes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS from the environment; the
# config update below is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache for the CPU test programs: on the 1-core CI
# box XLA:CPU compiles dominate suite wall time, and most test programs
# recur run-to-run. Kept SEPARATE from the TPU cache directory (mixing
# backends in one dir spams cross-backend AOT warnings; CLAUDE.md).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/sdflib_tpu/jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
