"""Utilities: PNG/grid writing, EasyDict, tee logger, profiling hooks."""

import sys
from typing import Any

from pgx.utils.png import make_grid, save_image_grid, to_uint8, write_png  # noqa: F401


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
