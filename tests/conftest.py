"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin and the env pins
JAX_PLATFORMS=axon, so the env-var route is not enough — we must override via
jax.config before any backend is initialized (SURVEY.md section 4: the
JAX-native fake backend for testing pjit/psum without a TPU).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# x64 available for float64 oracle-parity tests; f32 arrays stay f32.
jax.config.update("jax_enable_x64", True)
# Keep f32 convs/matmuls at full precision in numerics tests.
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu"

# Persist XLA executables across suite runs (same cache the CLIs and the
# multichip dryrun use): the heavy remat/ADA/scan step compiles dominate
# suite wall time and are identical run to run.
try:
    from pgx.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:                      # cache is an accelerator, never a gate
    pass
