"""Checkpointing, resume, and the smaller-to-bigger checkpoint grower.

Mirrors and extends the reference's checkpoint protocol (SURVEY.md 5.4):

* ``{iter:03d}_g.model`` — the EMA generator params (the reference saves
  ``g_running``, train.py:182-187) and ``{iter:03d}_d.model`` — D params,
  stored as flattened-key ``.npz`` pytrees (framework-neutral, no pickles).
* ``{iter:03d}_state.msgpack`` — the FULL train state (G, D, EMA, both Adam
  states, RNG key, iteration, ADA p), which the reference loses on resume.
* ``train_config_*.json`` — nested config schema round-trip
  (load_config, fid/load_mnist_model_and_fid_it.py:31-35).
* latest-checkpoint discovery by leading iteration index
  (get_checkpoint_step_idx, same file :27-28).
* the smaller->bigger grower (scripts/smaller_to_bigger_net_checkpoint_load
  .py): resolution-keyed params make the reference's "align D from the end"
  a plain key-match, with the same equivalence assertion.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pgx.models.config import DiscriminatorConfig, GeneratorConfig
from pgx.train.wgan import TrainConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Flat npz param files
# ---------------------------------------------------------------------------

def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Params:
    tree: Params = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def save_params(path: str, params: Params) -> None:
    # write through a file object: np.savez would append '.npz' to the
    # reference-style '*_g.model' filenames otherwise
    with open(path, "wb") as f:
        np.savez(f, **_flatten(params))


def load_params(path: str) -> Params:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


# ---------------------------------------------------------------------------
# Full train state (msgpack via flax.serialization)
# ---------------------------------------------------------------------------

def save_state(path: str, state: Dict[str, Any]) -> None:
    from flax import serialization
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def load_state(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    from flax import serialization
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


# ---------------------------------------------------------------------------
# Trial directory protocol
# ---------------------------------------------------------------------------

def checkpoint_name(iteration: int, kind: str) -> str:
    """'{iter+0:03d}_g.model' naming (train.py:183-186; zero-padded to >=3)."""
    return f"{str(iteration).zfill(3)}_{kind}.model"


def save_checkpoint(trial_dir: str, iteration: int, state: Dict[str, Any],
                    full_state: bool = True) -> None:
    ckpt = os.path.join(trial_dir, "checkpoint")
    os.makedirs(ckpt, exist_ok=True)
    save_params(os.path.join(ckpt, checkpoint_name(iteration, "g")),
                state["g_ema"])
    save_params(os.path.join(ckpt, checkpoint_name(iteration, "d")),
                state["d"])
    if full_state:
        save_state(os.path.join(ckpt, f"{str(iteration).zfill(3)}_state.msgpack"),
                   state)


def checkpoint_iteration(path: str) -> int:
    """Leading iteration index from a checkpoint filename
    (get_checkpoint_step_idx, fid/load_mnist_model_and_fid_it.py:27-28)."""
    return int(os.path.basename(path).split("_")[0])


def list_checkpoints(trial_dir: str, kind: str = "g"):
    ckpt = os.path.join(trial_dir, "checkpoint")
    if not os.path.isdir(ckpt):
        return []

    def _numeric(name: str) -> bool:
        # a stray hand-named copy (best_g.model) must not break every
        # checkpoint consumer for the whole trial
        try:
            checkpoint_iteration(name)
            return True
        except ValueError:
            return False

    names = [n for n in os.listdir(ckpt)
             if n.endswith(f"_{kind}.model") and _numeric(n)]
    names.sort(key=checkpoint_iteration)
    return [os.path.join(ckpt, n) for n in names]


def latest_checkpoint(trial_dir: str, kind: str = "g") -> Optional[str]:
    paths = list_checkpoints(trial_dir, kind)
    return paths[-1] if paths else None


def resolve_checkpoint(trial_dir: str, checkpoint: Optional[int] = None,
                       kind: str = "g") -> str:
    """Pin-or-latest checkpoint path for a trial (the convention every
    consumer — sampling CLI, serving, export, FID sweep — shares): an
    explicit ``checkpoint`` iteration must exist, otherwise the newest
    ``*_{kind}.model`` wins.  Raises FileNotFoundError either way."""
    if checkpoint is not None:
        path = os.path.join(trial_dir, "checkpoint",
                            checkpoint_name(int(checkpoint), kind))
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"no checkpoint {checkpoint} in {trial_dir}")
        return path
    path = latest_checkpoint(trial_dir, kind)
    if path is None:
        raise FileNotFoundError(
            f"no *_{kind}.model checkpoints in {trial_dir}")
    return path


def load_generator_state(trial_dir: str, schedule,
                         checkpoint: Optional[int] = None,
                         path: Optional[str] = None):
    """Load a trial's EMA generator the way the reference's samplers do
    (fid/load_mnist_model_and_fid_it.py:27-35,94-100): resolve the
    pin-or-latest ``*_g.model``, load params, and re-derive the growth
    state from the iteration index.  Checkpoints written at iteration N
    were saved *after* step N ran, so the growth state is
    ``schedule.state_at(N - 1)`` — the single place that off-by-one
    convention lives.

    ``path`` loads an already-resolved checkpoint file directly (sweeps
    iterate over ``list_checkpoints`` results; round-tripping those through
    the iteration number would re-derive a zero-padded name that a
    hand-renamed file need not match).

    Returns ``(gpath, params, iteration, state)``; ``state`` is None when
    ``schedule`` is None.
    """
    gpath = path if path is not None else resolve_checkpoint(
        trial_dir, checkpoint, "g")
    params = load_params(gpath)
    iteration = checkpoint_iteration(gpath)
    state = (schedule.state_at(max(iteration - 1, 0))
             if schedule is not None else None)
    return gpath, params, iteration, state


# ---------------------------------------------------------------------------
# Config JSON round-trip
# ---------------------------------------------------------------------------

def save_config(trial_dir: str, gcfg: GeneratorConfig,
                dcfg: DiscriminatorConfig, tc: TrainConfig,
                extra: Optional[Dict[str, Any]] = None,
                postfix: str = "") -> str:
    cfg = {
        "generator": dataclasses.asdict(gcfg),
        "discriminator": dataclasses.asdict(dcfg),
        "train": dataclasses.asdict(tc),
        **(extra or {}),
    }
    os.makedirs(trial_dir, exist_ok=True)
    path = os.path.join(trial_dir, f"train_config_{postfix}.json")
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2)
    return path


def load_config(trial_dir: str) -> Dict[str, Any]:
    """Find and parse the trial's train_config_*.json
    (load_config, fid/load_mnist_model_and_fid_it.py:31-35)."""
    names = [n for n in os.listdir(trial_dir)
             if n.startswith("train_config") and n.endswith(".json")]
    if not names:
        raise FileNotFoundError(f"no train_config_*.json in {trial_dir}")
    with open(os.path.join(trial_dir, sorted(names)[0])) as f:
        return json.load(f)


def configs_from_dict(cfg: Dict[str, Any]
                      ) -> Tuple[GeneratorConfig, DiscriminatorConfig,
                                 TrainConfig]:
    g = dict(cfg["generator"])
    d = dict(cfg["discriminator"])
    for k in ("channels",):
        if k in g:
            g[k] = tuple(g[k])
    for k in ("stage_in", "stage_out"):
        if k in d:
            d[k] = tuple(d[k])
    return (GeneratorConfig(**g), DiscriminatorConfig(**d),
            TrainConfig(**cfg.get("train", {})))


# ---------------------------------------------------------------------------
# Smaller -> bigger checkpoint grower
# ---------------------------------------------------------------------------

def grow_params(small: Params, big: Params, decay: float = 0.0) -> Params:
    """Copy every matching-path leaf of ``small`` into ``big``.

    Because pgx keys blocks/from_rgb/embeddings by *resolution*, this single
    function reproduces both the reference's by-name G copy and its
    "align D lists from the end" logic
    (scripts/smaller_to_bigger_net_checkpoint_load.py:11-36).  ``decay``
    blends like accumulate(): new = decay*big + (1-decay)*small.
    """
    def rec(s, b):
        if isinstance(b, dict):
            return {k: rec(s[k], v) if isinstance(s, dict) and k in s else v
                    for k, v in b.items()}
        assert s.shape == b.shape, f"shape mismatch {s.shape} vs {b.shape}"
        return decay * b + (1.0 - decay) * s
    return rec(small, big)


def assert_grow_equivalence(small_params, small_cfg, big_params, big_cfg,
                            z, labels=None, step: int = 1,
                            atol: float = 1e-5) -> None:
    """The reference's inline equivalence check: the grown net must produce
    identical outputs at the shared step (same script, :79-92)."""
    from pgx.models.generator import generator_apply
    a = generator_apply(small_params, small_cfg, z, labels, step=step)
    b = generator_apply(big_params, big_cfg, z, labels, step=step)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol,
                               rtol=1e-5)


def assert_grow_equivalence_d(small_params, small_cfg, big_params, big_cfg,
                              img, labels=None, step: int = 1,
                              atol: float = 1e-5) -> None:
    """D half of the reference's check: the grown discriminator must score a
    shared-step image identically (scripts/smaller_to_bigger_net_checkpoint_
    load.py:80-92 compares `score` as well as the image)."""
    from pgx.models.discriminator import discriminator_apply
    a = discriminator_apply(small_params, small_cfg, img, labels, step=step)
    b = discriminator_apply(big_params, big_cfg, img, labels, step=step)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol,
                               rtol=1e-5)
