"""Optional Orbax backend for the full-train-state checkpoint.

The default backend stores the train state as one flax-serialization
msgpack file (pgx/checkpoint/__init__.py:save_state) — simple, portable,
synchronous.  This backend swaps that part (and only that part: the
reference-format ``{iter}_g.model`` / ``{iter}_d.model`` npz params that
the FID sweep, GIF builder, and import/grow tools consume are written by
``save_checkpoint`` regardless of backend) for an
``orbax.checkpoint.CheckpointManager``:

* **async save** — the device-to-host copy happens synchronously but
  serialization/IO runs in a background thread, so training does not
  stall on checkpoint writes (the reference blocks on ``torch.save``,
  train.py:182-187);
* durable atomic commits and step-indexed directories;
* the same pytree (G, D, EMA, both Adam states, RNG, iteration, ADA
  state) round-trips through ``StandardSave``/``StandardRestore``.

Select with ``LoopConfig(checkpoint_backend="orbax")`` or
``--checkpoint-backend orbax`` on any training CLI.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

ORBAX_DIRNAME = "orbax_state"


class OrbaxStateStore:
    """Step-indexed async store for the full train state of one trial."""

    def __init__(self, trial_dir: str, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        path = os.path.abspath(os.path.join(trial_dir, ORBAX_DIRNAME))
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None, enable_async_checkpointing=async_save)
        self._mgr = ocp.CheckpointManager(path, options=options)

    def save(self, iteration: int, state: Dict[str, Any]) -> None:
        self._mgr.save(iteration,
                       args=self._ocp.args.StandardSave(state))

    def restore(self, iteration: int,
                template: Dict[str, Any]) -> Dict[str, Any]:
        return self._mgr.restore(
            iteration, args=self._ocp.args.StandardRestore(template))

    def latest_iteration(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        """Block until pending async saves are durable."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._mgr.close()


def has_orbax_state(trial_dir: str) -> bool:
    d = os.path.join(trial_dir, ORBAX_DIRNAME)
    return os.path.isdir(d) and bool(os.listdir(d))
