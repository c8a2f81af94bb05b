"""Unified progressive discriminator.

Covers the reference discriminator family (progan_modules.py:257-311 legacy,
:548-598 proper, :407-476/:697-775 label-plane conditional, :857-915
projection, mnist_pggan.py:82-137/:224-348 grayscale) via
``DiscriminatorConfig``.  The reference's ``for i in range(step, ..., -1)``
loop with list indices becomes a statically unrolled walk down
resolution-keyed stages; PixelNorm is always on in D blocks (the reference
constructs its ConvBlocks with the default pixel_norm=True).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from pgx.core import layers as L
from pgx.models.config import DiscriminatorConfig
from pgx.models.generator import l2_normalize
from pgx.ops import downsample2x

Params = Dict[str, Any]


def init_discriminator(key: jax.Array, cfg: DiscriminatorConfig) -> Params:
    keys = iter(jax.random.split(key, 4 + 3 * cfg.num_stages))
    params: Params = {"blocks": {}, "from_rgb": {}}

    rgb_in = cfg.img_channels + (1 if cfg.conditioning == "label_plane" else 0)
    for k in range(cfg.num_stages):
        res = str(4 * 2 ** k)
        if k == 0:
            # final 4x4 block: (in+1 stddev) -> 3x3 pad1 -> 4x4 valid
            params["blocks"][res] = L.conv_block_init(
                next(keys), cfg.stage_in[0] + 1, cfg.stage_out[0],
                kernel1=3, kernel2=4)
        elif cfg.block_type == "single":
            params["blocks"][res] = L.single_conv_block_init(
                next(keys), cfg.stage_in[k], cfg.stage_out[k], kernel=3)
        else:
            params["blocks"][res] = L.conv_block_init(
                next(keys), cfg.stage_in[k], cfg.stage_out[k])
        params["from_rgb"][res] = L.equal_conv2d_init(
            next(keys), rgb_in, cfg.stage_in[k], kernel=1)

    if cfg.conditioning == "label_plane":
        params["embeddings"] = {}
        for k in range(cfg.num_stages):
            res = 4 * 2 ** k
            params["embeddings"][str(res)] = L.embedding_init(
                next(keys), cfg.num_classes, res * res)
    elif cfg.conditioning == "projection":
        params["embedding"] = L.embedding_init(
            next(keys), cfg.num_classes, cfg.feat_dim)

    params["linear"] = L.equal_linear_init(next(keys), cfg.feat_dim, 1)
    return params


def _with_label_plane(params: Params, cfg: DiscriminatorConfig,
                      img: jnp.ndarray, labels: jnp.ndarray,
                      k: int) -> jnp.ndarray:
    """Concat the per-resolution spatial label plane to the image
    (reference: progan_modules.py:447-450)."""
    res = img.shape[1]
    plane = L.embedding(params["embeddings"][str(res)], labels,
                        equalized=cfg.equal_embed, dtype=img.dtype)
    plane = plane.reshape(-1, res, res, 1)
    return jnp.concatenate([img, plane], axis=-1)


def _block(params: Params, cfg: DiscriminatorConfig, k: int,
           x: jnp.ndarray) -> jnp.ndarray:
    res = str(4 * 2 ** k)
    p = params["blocks"][res]
    if k == 0:
        return L.conv_block(p, x, padding1=1, padding2=0)
    if cfg.block_type == "single":
        return L.single_conv_block(p, x, padding=1)
    return L.conv_block(p, x)


def _from_rgb(params: Params, cfg: DiscriminatorConfig, k: int,
              img: jnp.ndarray,
              labels: Optional[jnp.ndarray]) -> jnp.ndarray:
    if cfg.conditioning == "label_plane":
        img = _with_label_plane(params, cfg, img, labels, k)
    return L.equal_conv2d(params["from_rgb"][str(4 * 2 ** k)], img)


def discriminator_apply(params: Params, cfg: DiscriminatorConfig,
                        img: jnp.ndarray,
                        labels: Optional[jnp.ndarray] = None, *, step: int,
                        alpha=1.0, fading: bool = False,
                        stddev_axis_name: Optional[str] = None,
                        stddev_groups: int = 1) -> jnp.ndarray:
    """Score a batch of images entering at the resolution of ``step``.

    Returns shape (B, 1) for plain/label-plane heads, (B,) for the projection
    head (mirroring the reference's return shapes,
    progan_modules.py:307-311 vs :910-915).

    ``stddev_groups > 1`` evaluates the minibatch-stddev statistic per
    contiguous B/groups slice: one concatenated forward then scores each
    slice exactly as separate per-slice calls would (the batched-D
    dispatch, TrainConfig.d_concat).
    """
    step = min(step, cfg.max_step)
    dtype = cfg.compute_dtype
    img = img.astype(dtype)
    entry = cfg.entry_stage(step)

    x = _from_rgb(params, cfg, entry, img, labels)
    for k in range(entry, 0, -1):
        x = _block(params, cfg, k, x)
        x = downsample2x(x)
        if k == entry and fading and entry > 0:
            a = jnp.asarray(alpha, dtype)
            skip = _from_rgb(params, cfg, entry - 1, downsample2x(img), labels)
            x = (1 - a) * skip + a * x

    x = L.minibatch_stddev(x, axis_name=stddev_axis_name,
                           groups=stddev_groups)
    x = _block(params, cfg, 0, x)           # -> (B, 1, 1, feat)
    h = x.reshape(x.shape[0], -1)
    out = L.equal_linear(params["linear"], h)

    if cfg.conditioning == "projection":
        embed = l2_normalize(L.embedding(params["embedding"], labels,
                                         dtype=dtype))
        proj = jnp.sum(h * embed, axis=-1)
        return out.reshape(-1) + proj
    return out
