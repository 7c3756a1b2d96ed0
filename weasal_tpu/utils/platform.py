"""Platform selection helper.

Some environments pre-register an accelerator PJRT plugin at interpreter
start and force it via env, which makes `JAX_PLATFORMS=cpu python ...`
ineffective. `apply_platform_env()` honors the WEASAL_PLATFORM variable
through jax.config (which wins as long as no backend has initialized yet);
entry scripts call it before any jax computation.
"""

import os


def apply_platform_env() -> None:
    platform = os.environ.get("WEASAL_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    enable_persistent_compile_cache()
    if platform == "cpu":
        # XLA:CPU in-process collectives CHECK-fail (process abort) when
        # the per-device executor threads starve past 40 s on a loaded
        # host (single-core CI). Raise the rendezvous timeouts; must land
        # before backend init.
        flags = os.environ.get("XLA_FLAGS", "")
        if "collective_timeout" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_cpu_collective_timeout_seconds=600"
                " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
                " --xla_cpu_collective_call_terminate_timeout_seconds=600"
            ).strip()


def enable_persistent_compile_cache() -> None:
    """Point jax at a persistent on-disk compilation cache (shared across
    processes and working directories). TPU compiles cost 20-40 s per
    program through this platform's tunnel and a multi-stage training
    chain re-launches python per stage (plus stall resumes) — the cache
    turns every recompile of an unchanged program into a disk read.
    WEASAL_COMPILE_CACHE overrides the location; "off" disables."""
    loc = os.environ.get("WEASAL_COMPILE_CACHE", "")
    if loc.lower() == "off":
        return
    if not loc:
        loc = os.path.join(os.path.expanduser("~"), ".cache",
                           "weasal_jax_cache")
    os.makedirs(loc, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", loc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def resolve_pallas_flag(value, auto_requires: bool = True) -> bool:
    """Resolve a use_pallas_* config knob.

    True/False are explicit (callers who force True own the sorted-input
    precondition — tests do this with pallas_interpret). None / "auto"
    (the default) enables the Pallas kernels exactly when the active
    backend is a real TPU AND `auto_requires` holds — the banded KPConv
    passes `config.device_pyramid` here, because only the device-pyramid
    path guarantees the spatially sorted levels the banding needs; the
    host-pyramid path stays on the XLA kernels.
    """
    if isinstance(value, str) and value.lower() not in ("auto", ""):
        return value.lower() in ("1", "true", "yes", "on")
    if value is None or isinstance(value, str):
        if not auto_requires:
            return False
        import jax
        return jax.default_backend() == "tpu"
    return bool(value)
