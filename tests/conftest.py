"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding paths are validated on
host-platform virtual devices. The environment's sitecustomize pre-registers
the TPU tunnel backend, so forcing CPU requires jax.config.update (env vars
alone are overridden before pytest starts).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU in-process collectives abort the whole process (CHECK failure in
# rendezvous.cc) when the per-device executor threads can't all get
# scheduled within 40 s. On an oversubscribed single-core CI host the
# multi-device tests trip that under load; raise the rendezvous timeouts.
if "collective_timeout" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=600"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound (single-CPU CI
# host, 8 virtual devices), and most modules re-jit near-identical programs.
# Caching compiled executables on disk makes warm runs fast.
_CACHE_DIR = os.environ.get(
    "WEASAL_TEST_CACHE", os.path.join(os.path.dirname(__file__),
                                      ".jax_compile_cache"))
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
