"""Make JAX_PLATFORMS behave as users expect for CLI entry points.

The deployment environment may install a sitecustomize that force-registers
an accelerator backend and overrides jax_platforms AFTER the environment
variable is read, so `JAX_PLATFORMS=cpu xfb-run ...` would silently still
target the accelerator. Each CLI calls apply_env_platform() before its
first jax import to restore the principle of least surprise.
"""

import os


def apply_env_platform() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
