"""Adaptive augmentation probability controller.

Port of the reference's AdaptiveAugment (ada/adapt_augm.py:6-51, from
PyTorch-StudioGAN): accumulate sign(D(real)) over >= 4 batches, compare the
mean sign r_t against ``ada_target`` and nudge ``p`` by
(batch_size / ada_length) per accumulated sample, clamped to [0, 1].

State lives as plain jnp scalars inside the train-state pytree so it rides
checkpoints; the update itself is pure and can run inside the jitted step
(the sign-sum is a global batch reduction under GSPMD).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AdaConfig:
    ada_target: float = 0.6
    ada_length: int = 500_000
    interval_batches: int = 4     # update once per >= 4 accumulated batches


def init_ada_state(prev_p: float = 0.0) -> Dict[str, jnp.ndarray]:
    return {
        "p": jnp.asarray(prev_p, jnp.float32),
        "sign_sum": jnp.zeros((), jnp.float32),
        "count": jnp.zeros((), jnp.float32),
    }


def ada_update(state: Dict[str, jnp.ndarray], real_logits: jnp.ndarray,
               cfg: AdaConfig, batch_size: int) -> Dict[str, jnp.ndarray]:
    """One accumulation step; adjusts p when enough batches are gathered.

    Branch-free jnp.where formulation of the reference's
    ``if ada_augment[1] > batch_size*4 - 1`` trigger (adapt_augm.py:40-46).
    """
    sign_sum = state["sign_sum"] + jnp.sum(jnp.sign(real_logits))
    count = state["count"] + real_logits.shape[0]

    trigger = count > (batch_size * cfg.interval_batches - 1)
    r_t = sign_sum / jnp.maximum(count, 1.0)
    direction = jnp.where(r_t > cfg.ada_target, 1.0, -1.0)
    step = batch_size / cfg.ada_length
    new_p = jnp.clip(state["p"] + direction * step * count, 0.0, 1.0)

    return {
        "p": jnp.where(trigger, new_p, state["p"]),
        "sign_sum": jnp.where(trigger, 0.0, sign_sum),
        "count": jnp.where(trigger, 0.0, count),
    }
