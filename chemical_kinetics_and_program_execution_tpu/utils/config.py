"""Global configuration for the TPU-native framework.

The reference enables float64 via an environment-variable hack
(`examples/autocatalysis.py:17-35`) and gates debug output on
`MARKOV_TAPES_DEBUG` (`framework/markov_tapes.py:38`). Here the x64
enablement is done once, centrally, at package import time, and the debug
flag keeps the reference's name (plus a `CKPE_DEBUG` alias).
"""

from __future__ import annotations

import os


def _env_flag(*names: str, default: bool = False) -> bool:
    for name in names:
        val = os.environ.get(name)
        if val is not None:
            return bool(int(val)) if val.isdigit() else val.lower() in ("true", "yes", "on")
    return default


IS_DEBUG = _env_flag("MARKOV_TAPES_DEBUG", "CKPE_DEBUG")

# Default compiled-problem disk cache location (see engine/compile.py).
CACHE_DIR = os.environ.get(
    "CKPE_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "ckpe_tpu"),
)


def enable_x64() -> None:
    """Enables float64 in JAX. Must run before the first jax array op."""
    import jax

    jax.config.update("jax_enable_x64", True)


_initialized = False


def initialize() -> None:
    global _initialized
    if _initialized:
        return
    enable_x64()
    # Respect an explicit platform override. This works even where a
    # site hook has already imported jax and pinned `JAX_PLATFORMS`
    # (env-var changes are ignored after jax import; the config update
    # is honored until backend initialisation).
    platform = os.environ.get("CKPE_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    # Persistent XLA compilation cache: the big solver jits (DOP853
    # while_loop over a multi-million-event RHS) can take minutes to
    # compile on a TPU tunnel; caching makes reruns start instantly.
    if _env_flag("CKPE_JIT_CACHE", default=True):
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("CKPE_JIT_CACHE_DIR",
                           os.path.join(CACHE_DIR, "xla")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _initialized = True
