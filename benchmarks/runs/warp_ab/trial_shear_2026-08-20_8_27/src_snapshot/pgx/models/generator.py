"""Unified progressive generator.

Covers the reference generator family (progan_modules.py:171-254 legacy,
:479-545 proper, :314-404/:601-694/:778-854 conditional variants,
mnist_pggan.py:10-79/:140-221 grayscale) via ``GeneratorConfig``.

``step`` and ``fading`` are *static*: jit specializes one XLA graph per
resolution stage, replacing the reference's data-dependent Python branching
(progan_modules.py:219-254).  ``alpha`` stays a traced scalar so fade-in does
not retrace per iteration.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from pgx.core import layers as L
from pgx.models.config import GeneratorConfig
from pgx.ops import upsample2x

Params = Dict[str, Any]


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(dim=-1): x / max(||x||_2, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def init_generator(key: jax.Array, cfg: GeneratorConfig) -> Params:
    keys = iter(jax.random.split(key, 4 + 3 * cfg.num_stages))
    params: Params = {}

    in_dim = cfg.z_dim + cfg.embedding_dim
    if cfg.conditioning != "none":
        params["embedding"] = L.embedding_init(next(keys), cfg.num_classes,
                                               cfg.embedding_dim)

    # Stage 0 (4x4): transpose-conv latent projection ...
    params["input"] = L.equal_conv_transpose2d_init(
        next(keys), in_dim, cfg.channels[0], kernel=4)
    # ... followed by either a conv block (legacy progression_4) or a single
    # 3x3 conv (proper fused input block, PixelNorm hardcoded on).
    if cfg.arch == "proper":
        params["blocks"] = {"4": L.single_conv_block_init(
            next(keys), cfg.channels[0], cfg.channels[0], kernel=3)}
    elif cfg.block_type == "single":
        params["blocks"] = {"4": L.single_conv_block_init(
            next(keys), cfg.channels[0], cfg.channels[0], kernel=3)}
    else:
        params["blocks"] = {"4": L.conv_block_init(
            next(keys), cfg.channels[0], cfg.channels[0])}

    for k in range(1, cfg.num_stages):
        res = str(4 * 2 ** k)
        if cfg.block_type == "single":
            params["blocks"][res] = L.single_conv_block_init(
                next(keys), cfg.channels[k - 1], cfg.channels[k], kernel=3)
        else:
            params["blocks"][res] = L.conv_block_init(
                next(keys), cfg.channels[k - 1], cfg.channels[k])

    params["to_rgb"] = {}
    first_rgb = 0 if cfg.arch == "proper" else 1  # legacy has no 4x4 head
    for k in range(first_rgb, cfg.num_stages):
        res = str(4 * 2 ** k)
        params["to_rgb"][res] = L.equal_conv2d_init(
            next(keys), cfg.channels[k], cfg.img_channels, kernel=1)
    return params


def _block(params: Params, cfg: GeneratorConfig, k: int,
           x: jnp.ndarray, upsample_first: bool = False) -> jnp.ndarray:
    res = str(4 * 2 ** k)
    p = params["blocks"][res]
    if k == 0 and cfg.arch == "proper":
        # PixelNorm hardcoded in the reference's fused 4x4 Sequential
        # (progan_modules.py:487-494), ignoring the pixel_norm flag.
        return L.single_conv_block(p, x, padding=1, use_pixel_norm=True)
    if cfg.block_type == "single":
        return L.single_conv_block(p, x, padding=1,
                                   use_pixel_norm=cfg.pixel_norm,
                                   upsample_first=upsample_first)
    return L.conv_block(p, x, use_pixel_norm=cfg.pixel_norm,
                        upsample_first=upsample_first)


def _to_rgb(params: Params, k: int, x: jnp.ndarray) -> jnp.ndarray:
    return L.equal_conv2d(params["to_rgb"][str(4 * 2 ** k)], x)


def generator_apply(params: Params, cfg: GeneratorConfig, z: jnp.ndarray,
                    labels: Optional[jnp.ndarray] = None, *, step: int,
                    alpha=1.0, fading: bool = False) -> jnp.ndarray:
    """Generate a batch of images at the resolution of ``step``.

    ``fading`` statically selects the alpha-blend graph (the reference's
    ``0 <= alpha < 1`` branch, progan_modules.py:209-217); ``alpha`` is traced.
    """
    step = min(step, cfg.max_step)
    dtype = cfg.compute_dtype
    z = z.astype(dtype)

    if cfg.conditioning != "none":
        embed = L.embedding(params["embedding"], labels,
                            equalized=cfg.equal_embed, dtype=dtype)
        if cfg.conditioning == "norm_concat":
            z = jnp.concatenate([l2_normalize(z), l2_normalize(embed)], axis=-1)
        else:
            z = jnp.concatenate([z, embed], axis=-1)

    # Stage 0: latent -> 4x4 (ConvTranspose2d(4,1,0) on 1x1 == one matmul).
    x = L.latent_to_4x4(params["input"], z)
    x = L.pixel_norm(x)  # hardcoded in both input-layer variants
    x = L.leaky_relu(x, cfg.input_lrelu_slope)
    x = _block(params, cfg, 0, x)

    out_stage = cfg.out_stage(step)
    feats = {0: x}
    for k in range(1, out_stage + 1):
        # static dispatch: fuse upsample2x into the block's 3x3 conv1 once
        # the input is large enough for the lhs_dilated form to win on TPU
        # (exact composition either way; see equal_conv2d_up2x)
        if (cfg.fuse_up_conv_min_size
                and x.shape[1] >= cfg.fuse_up_conv_min_size):
            x = _block(params, cfg, k, x, upsample_first=True)
        else:
            x = _block(params, cfg, k, upsample2x(x))
        feats[k] = x

    # Output head. Fade only when statically enabled AND the stage supports
    # a previous head (legacy step 1 has no lower head; the proper arch's
    # step==2-with-tanh quirk skips the blend, progan_modules.py:534-537).
    no_fade_quirk = (cfg.arch == "proper" and step == 2 and cfg.tanh)
    first_head = 0 if cfg.arch == "proper" else 1
    can_fade = out_stage > first_head and not no_fade_quirk
    if fading and can_fade:
        alpha = jnp.asarray(alpha, dtype)
        skip = upsample2x(_to_rgb(params, out_stage - 1, feats[out_stage - 1]))
        rgb = (1 - alpha) * skip + alpha * _to_rgb(params, out_stage, x)
    else:
        rgb = _to_rgb(params, out_stage, x)
    if cfg.tanh:
        rgb = jnp.tanh(rgb)
    return rgb
