"""Persistent XLA compilation cache.

Solver kernels take tens of seconds to compile over a remote-TPU
backend; the jitted-callable shape cache (ops/*_pallas.py) removes
recompiles within a process, and this removes them across processes:
compiled executables are written to disk and re-loaded on the next run
(measured 61s -> 0.45s for a fresh process on this machine's backend).

The CLI enables it automatically; library users call
``enable_compilation_cache()`` themselves (a library should not mutate
global JAX config on import). ``ODESAT_NO_CACHE=1`` disables,
``ODESAT_CACHE_DIR`` overrides the location.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.
    Respects an explicit user setting of ``jax_compilation_cache_dir``
    and the ``ODESAT_NO_CACHE`` escape hatch. Returns the directory in
    use, or None when disabled."""
    if os.environ.get("ODESAT_NO_CACHE"):
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    cache_dir = (
        cache_dir
        or os.environ.get("ODESAT_CACHE_DIR")
        or os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "odesat_tpu",
            "xla",
        )
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # solver kernels are always worth persisting; the default 1s floor
    # would skip small-formula kernels that still cost seconds remotely
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
