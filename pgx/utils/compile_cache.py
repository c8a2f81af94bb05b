"""Persistent XLA compilation cache.

Progressive growing is compile-heavy by design: every growth stage (and
every fade/stabilize phase) is its own jitted executable, and on TPU each
costs tens of seconds to build.  The reference pays the analogous cost
through torch's per-process CUDA JIT plugins and recompiles them per
machine (torch_utils/custom_ops.py's md5-cached build dir); pgx instead
persists XLA's compiled executables to disk, so restarts, resumes,
grow-then-continue and repeated CLI runs skip straight to execution.

Enabled by default on every CLI (``--compile-cache off`` opts out,
``--compile-cache DIR`` relocates it; ``PGX_COMPILE_CACHE`` is the env
override).  Library users call :func:`enable_compilation_cache` directly
before first device use.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join("~", ".cache", "pgx", "xla")


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             min_compile_time_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Must run before the first compilation.  Entries cheaper than
    ``min_compile_time_secs`` are not persisted (they recompile faster
    than they deserialize).  Returns the resolved directory.
    """
    import jax

    cache_dir = os.path.expanduser(
        cache_dir or os.environ.get("PGX_COMPILE_CACHE") or _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
