"""Utilities: PNG/grid writing, EasyDict, tee logger, profiling hooks."""

import sys
from typing import Any

from pgx.utils.png import make_grid, save_image_grid, to_uint8, write_png  # noqa: F401
from pgx.utils.url import is_url, open_url  # noqa: F401


class EasyDict(dict):
    """Attribute-access dict (dnnlib.util.EasyDict, ada/dnnlib/util.py:40-53)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


class Logger:
    """Tee stdout to a log file (dnnlib.util.Logger, ada/dnnlib/util.py:56-112)."""

    def __init__(self, file_name=None, mode="a", should_flush=True):
        self.file = open(file_name, mode) if file_name else None
        self.should_flush = should_flush
        self.stdout = sys.stdout
        sys.stdout = self

    def write(self, text: str) -> None:
        if self.file is not None:
            self.file.write(text)
        self.stdout.write(text)
        if self.should_flush:
            self.flush()

    def flush(self) -> None:
        if self.file is not None:
            self.file.flush()
        self.stdout.flush()

    def close(self) -> None:
        sys.stdout = self.stdout
        if self.file is not None:
            self.file.close()


def profiled(name: str):
    """Annotate a function with a jax.profiler TraceAnnotation (the TPU
    equivalent of misc.profiled_function, ada/torch_utils/misc.py:98-103)."""
    import functools

    import jax

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)
        return wrapper
    return deco


# ---------------------------------------------------------------------------
# dnnlib.util helper parity (ada/dnnlib/util.py:140-330)
# ---------------------------------------------------------------------------

def format_time(seconds) -> str:
    """Human-readable duration (dnnlib.util.format_time, :145-155)."""
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 60 * 60:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 24 * 60 * 60:
        return f"{s // (60 * 60)}h {(s // 60) % 60:02d}m {s % 60:02d}s"
    return (f"{s // (24 * 60 * 60)}d {(s // (60 * 60)) % 24:02d}h "
            f"{(s // 60) % 60:02d}m")


def format_size(num_bytes: int) -> str:
    """Human-readable byte size."""
    value = float(num_bytes)
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if value < 1024 or unit == "TB":
            return (f"{int(value)} {unit}" if unit == "B"
                    else f"{value:.1f} {unit}")
        value /= 1024
    raise AssertionError


def get_obj_by_name(name: str):
    """Import an object by dotted path (dnnlib.util reflection, :222-263)."""
    import importlib
    parts = name.split(".")
    for split in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:split])
        try:
            module = importlib.import_module(module_name)
        except ImportError:
            continue
        obj = module
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
            return obj
        except AttributeError:
            continue
    raise ImportError(f"cannot resolve {name!r}")


def call_func_by_name(name: str, *args, **kwargs):
    """Resolve a dotted path and call it (dnnlib.util.call_func_by_name)."""
    return get_obj_by_name(name)(*args, **kwargs)


def list_dir_recursively_with_ignore(root: str, ignores=None):
    """[(abs_path, rel_path)] for all files under root, skipping ignored
    directory/file name patterns (dnnlib.util, :315-350)."""
    import fnmatch
    import os
    ignores = ignores or []
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames
                       if not any(fnmatch.fnmatch(d, p) for p in ignores)]
        for name in sorted(filenames):
            if any(fnmatch.fnmatch(name, p) for p in ignores):
                continue
            abs_path = os.path.join(dirpath, name)
            out.append((abs_path, os.path.relpath(abs_path, root)))
    return out
