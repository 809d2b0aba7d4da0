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


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's on-disk executable cache for every CLI entry.

    The Mosaic/XLA compile of the flow megakernel at a fresh utterance
    shape costs minutes through the axon remote-compile path; the
    persistent cache cuts a repeat process's first generate call from
    345 s to 7 s (measured r2 session 16).  Keyed by HLO hash, so code
    or shape changes miss cleanly.  Opt out / redirect with
    PWN_TPU_COMPILE_CACHE=off | <dir>; an explicit
    JAX_COMPILATION_CACHE_DIR (native jax env var) wins outright.
    """
    import jax

    if jax.config.jax_compilation_cache_dir:  # env/user already set one
        return
    path = path or os.environ.get(
        "PWN_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/pwn_tpu/xla"),
    )
    if path.lower() in ("", "0", "off", "none"):
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_cpu() -> None:
    """Pin this process to the CPU backend (callable BEFORE any jax
    backend initialization).  For host-scale work — e.g. the `eval`
    CLI's DSP metrics on two short wavs — where dispatching dozens of
    small graphs through the axon TPU tunnel costs minutes of remote
    compiles + RTTs for milliseconds of math (measured: ~7-12 min per
    eval on the tunnel vs seconds on CPU, r4)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
