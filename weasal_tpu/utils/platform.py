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
