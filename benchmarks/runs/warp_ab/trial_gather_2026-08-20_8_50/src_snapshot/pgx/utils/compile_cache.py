"""Persistent XLA compilation cache.

Progressive growing is compile-heavy by design: every growth stage (and
every fade/stabilize phase) is its own jitted executable, and on TPU each
costs tens of seconds to build.  The reference pays the analogous cost
through torch's per-process CUDA JIT plugins and recompiles them per
machine (torch_utils/custom_ops.py's md5-cached build dir); pgx instead
persists XLA's compiled executables to disk, so restarts, resumes,
grow-then-continue and repeated CLI runs skip straight to execution.

Entries are scoped by a HOST FINGERPRINT subdirectory (platform + CPU
feature flags + jax/jaxlib versions): XLA's own cache key does not cover
every host feature its CPU AOT backend specializes on, and reloading an
executable built on a different machine can warn — or SIGILL — at run
time (observed live as ``cpu_aot_loader ... doesn't match the machine
type for execution`` when one cache dir was shared across driver hosts).
A different machine simply gets its own subtree, which is exactly the
reference's per-machine rebuild discipline (custom_ops.py:80-108).

Enabled by default on every CLI (``--compile-cache off`` opts out,
``--compile-cache DIR`` relocates it; ``PGX_COMPILE_CACHE`` is the env
override).  Library users call :func:`enable_compilation_cache` directly
before first device use.
"""

from __future__ import annotations

import hashlib
import os
import platform
from typing import Optional

_DEFAULT_DIR = os.path.join("~", ".cache", "pgx", "xla")


def _cpu_feature_flags() -> str:
    """The host CPU's feature-flag line (ISA extensions), best effort.

    This is what the XLA:CPU AOT loader specializes on; two hosts with the
    same uname but different AVX/AMX support must not share cache entries.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    # sort: flag ORDER is kernel-version noise
                    return " ".join(sorted(line.split(":", 1)[1].split()))
    except OSError:
        pass
    return platform.processor() or "unknown-cpu"


def host_fingerprint() -> str:
    """A short stable id for (machine type, CPU features, jax stack)."""
    import jax
    import jaxlib

    parts = [
        platform.system(),
        platform.machine(),
        _cpu_feature_flags(),
        jax.__version__,
        jaxlib.__version__,
    ]
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             min_compile_time_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at a host-scoped subdir of
    ``cache_dir``.

    Must run before the first compilation.  Entries cheaper than
    ``min_compile_time_secs`` are not persisted (they recompile faster
    than they deserialize).  Returns the resolved directory.
    """
    import jax

    base = os.path.expanduser(
        cache_dir or os.environ.get("PGX_COMPILE_CACHE") or _DEFAULT_DIR)
    resolved = os.path.join(base, host_fingerprint())
    os.makedirs(resolved, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", resolved)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return resolved
