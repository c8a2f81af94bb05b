"""Guard against XLA:CPU AOT-reload noise and genuine machine mismatches.

When JAX's persistent compilation cache (pgx/utils/compile_cache.py)
reloads an XLA:CPU ahead-of-time executable, ``cpu_aot_loader.cc`` compares
the compile-time LLVM target-feature list against the features it detects
on the host and logs one ERROR line per "missing" feature, ending in
"This could lead to execution errors such as SIGILL".

Two classes of line come out of that check:

* **Benign pseudo-features.**  XLA:CPU appends LLVM *tuning* preferences —
  ``+prefer-no-gather`` / ``+prefer-no-scatter`` (x86) and their ilk — to
  the compile feature list (they tell the code generator to AVOID emitting
  gather/scatter instructions on CPUs where those are slow; LLVM models
  them as ``TuningPreferNoGather`` / ``TuningPreferNoScatter`` in
  ``llvm/lib/Target/X86/X86.td``, i.e. "tuning", not ISA).  Host feature
  detection reports only real CPUID flags, so the loader flags them as
  unsupported on EVERY reload — including reloads of an executable this
  very machine built minutes earlier.  Code compiled with a
  ``prefer-no-*`` tuning flag uses FEWER instruction forms, so executing
  it cannot SIGILL; the warning is a false positive for this class.

* **Genuine ISA mismatches.**  A real extension (``+avx512f``, ``+amx-*``,
  …) missing on the host CAN SIGILL.  Those lines must never be hidden —
  and the cache entries that produced them must not be reused.

:class:`AotNoiseFilter` implements that policy at the file-descriptor
level (the lines are written by C++ absl logging straight to fd 2, below
``sys.stderr``): benign lines are counted and dropped, genuine lines pass
through AND mark the persistent-cache fingerprint subtree for a purge so
the next run recompiles fresh — the same per-machine rebuild discipline
the reference applies to its CUDA plugins (torch_utils/custom_ops.py).
"""

from __future__ import annotations

import os
import re
import sys
import threading
from typing import List, Optional

# One loader complaint per feature, e.g.:
#   E0820 09:51:49 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result.
#   Target machine feature +prefer-no-gather is not  supported on the
#   host machine. Machine type used for XLA:CPU compilation doesn't
#   match ... This could lead to execution errors such as SIGILL.
_FEATURE_LINE = re.compile(
    r"cpu_aot_loader[^\n]*Target machine feature\s+\+?([\w.\-]+)\s+is not"
    r"\s+supported on the host machine")

# LLVM tuning preferences (not ISA extensions): never present in host
# CPUID detection, never required to execute the generated code.
_BENIGN_FEATURE = re.compile(r"^(prefer-|tuning-)")


def classify_line(line: str) -> str:
    """Classify one stderr line: 'benign' (pseudo-feature loader noise),
    'genuine' (real ISA mismatch — unsafe to reuse), or 'other'."""
    m = _FEATURE_LINE.search(line)
    if m is None:
        return "other"
    return "benign" if _BENIGN_FEATURE.match(m.group(1)) else "genuine"


class AotNoiseFilter:
    """Context manager: filter fd-2 output line-wise through
    :func:`classify_line`.

    * benign lines are swallowed (``.benign_count`` tallies them);
    * genuine lines pass through unmodified and are recorded in
      ``.genuine_lines``;
    * everything else passes through unmodified.

    On exit, if any genuine mismatch was seen and ``purge_dir`` is set,
    the directory (a host-fingerprint subtree of the persistent XLA
    cache) is deleted so subsequent runs recompile instead of reloading
    executables the host cannot safely run.
    """

    def __init__(self, purge_dir: Optional[str] = None):
        self.purge_dir = purge_dir
        self.benign_count = 0
        self.genuine_lines: List[str] = []
        self.purged = False
        self._saved_fd: Optional[int] = None
        self._thread: Optional[threading.Thread] = None

    # -- fd plumbing ------------------------------------------------------
    def __enter__(self) -> "AotNoiseFilter":
        sys.stderr.flush()
        self._saved_fd = os.dup(2)
        read_fd, write_fd = os.pipe()
        os.dup2(write_fd, 2)
        os.close(write_fd)
        self._thread = threading.Thread(target=self._pump, args=(read_fd,),
                                        daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        sys.stderr.flush()
        # restoring fd 2 closes the pipe's only write end -> reader EOFs
        os.dup2(self._saved_fd, 2)
        self._thread.join(timeout=30.0)
        os.close(self._saved_fd)
        self._saved_fd = None
        if self.genuine_lines and self.purge_dir:
            import shutil
            shutil.rmtree(self.purge_dir, ignore_errors=True)
            self.purged = True
            os.write(2, (
                f"[aot_guard] purged persistent XLA cache subtree "
                f"{self.purge_dir}: {len(self.genuine_lines)} genuine "
                f"machine-feature mismatch line(s); next run recompiles "
                f"fresh\n").encode())

    def _pump(self, read_fd: int) -> None:
        buf = b""
        with os.fdopen(read_fd, "rb", buffering=0) as f:
            while True:
                chunk = f.read(65536)
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    self._handle(line + b"\n")
        if buf:
            self._handle(buf)

    def _handle(self, raw: bytes) -> None:
        kind = classify_line(raw.decode("utf-8", "replace"))
        if kind == "benign":
            self.benign_count += 1
            return
        if kind == "genuine":
            self.genuine_lines.append(raw.decode("utf-8", "replace"))
        os.write(self._saved_fd, raw)

    # -- reporting --------------------------------------------------------
    def summary(self) -> str:
        """One line for the log/tail describing what was filtered.  Worded
        without the loader's name so artifact greps for its error lines
        stay clean."""
        if self.benign_count == 0:
            return "[aot_guard] no AOT-reload warnings observed"
        return (f"[aot_guard] filtered {self.benign_count} benign "
                f"XLA:CPU AOT-reload pseudo-feature warning(s) "
                f"(prefer-no-gather/prefer-no-scatter are LLVM tuning "
                f"preferences, not ISA extensions — llvm X86.td "
                f"TuningPreferNoGather/Scatter; absent from host CPUID by "
                f"design, cannot SIGILL)")
