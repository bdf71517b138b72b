"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding code is validated on
``xla_force_host_platform_device_count=8`` CPU devices (the driver separately
dry-run-compiles the multi-chip path via ``__graft_entry__.dryrun_multichip``).
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; an explicit config update wins over both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: repeat suite runs skip recompilation.
os.makedirs("/root/.jax_cache_cpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert len(jax.devices()) == 8, jax.devices()
