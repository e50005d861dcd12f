"""Persistent XLA compile cache, shared by the CLI and bench.py.

The inner-epoch program is ~680 s cold on one v5e chip and ~0 s warm, so
every entry point defaults the cache ON.  One helper owns the env-var
default, the ``"off"`` sentinel, and the 0.5 s admission threshold so the
two call sites cannot drift (advisor finding, ADVICE.md round 2).
"""

from __future__ import annotations

import os

DEFAULT_DIR = "~/.cache/sml_tpu/xla"
ENV_VAR = "SML_COMPILE_CACHE"


def default_cache_dir() -> str:
    """Cache dir from ``$SML_COMPILE_CACHE``, else ``~/.cache/sml_tpu/xla``.
    The value ``"off"`` disables caching."""
    return os.environ.get(ENV_VAR, os.path.expanduser(DEFAULT_DIR))


def enable_compile_cache(cache_dir: str | None = None, log=None) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default:
    :func:`default_cache_dir`).  Returns True iff the cache was enabled.

    An unwritable directory must never kill a run: the failure is logged
    via ``log`` (default: stderr print) and caching is skipped.
    """
    if cache_dir is None:
        cache_dir = default_cache_dir()
    if not cache_dir or cache_dir == "off":
        return False
    import jax
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return True
    except OSError as e:
        msg = f"compile cache disabled: {e}"
        if log is None:
            import sys
            print(msg, file=sys.stderr)
        else:
            log(msg)
        return False
