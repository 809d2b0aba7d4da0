"""Platform selection shim for the axon environment.

The TPU tunnel's sitecustomize force-registers the `axon` platform and
calls `jax.config.update("jax_platforms", "axon,cpu")` at interpreter
start, which silently overrides a user's `JAX_PLATFORMS` environment
variable.  Entry points that must honor the env var (CLI subprocesses,
the driver's CPU-simulated multichip dryrun, pytest) call this first.
"""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    val = os.environ.get("JAX_PLATFORMS")
    if val:
        import jax

        jax.config.update("jax_platforms", val)
