"""Test-only helpers: use the PyTorch reference at /root/reference as a
numerical oracle.

The reference is imported (read-only) and its randomly initialized
state_dicts are transplanted into pgx parameter pytrees (layout conversion
only — no reference code is copied).  Skipped automatically when the
reference checkout is unavailable.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE_PATH = "/root/reference"


def load_reference_modules():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import progan_modules  # noqa: F401
        import mnist_pggan  # noqa: F401
    except ImportError:
        pytest.skip("reference checkout not available")
    return progan_modules, mnist_pggan


def _t(x):
    return jnp.asarray(np.ascontiguousarray(x.detach().numpy()))


def conv_from(sd, prefix):
    """EqualConv2d: torch OIHW -> pgx HWIO."""
    return {"w": _t(sd[prefix + ".conv.weight_orig"]).transpose(2, 3, 1, 0),
            "b": _t(sd[prefix + ".conv.bias"])}


def convt_from(sd, prefix):
    """EqualConvTranspose2d: torch IOHW -> pgx HWOI."""
    return {"w": _t(sd[prefix + ".conv.weight_orig"]).transpose(2, 3, 1, 0),
            "b": _t(sd[prefix + ".conv.bias"])}


def linear_from(sd, prefix):
    return {"w": _t(sd[prefix + ".linear.weight_orig"]).T,
            "b": _t(sd[prefix + ".linear.bias"])}


def embed_from(sd, prefix, equalized=False):
    key = prefix + (".embed.weight_orig" if equalized else ".weight")
    return {"w": _t(sd[key])}


def block_from(sd, prefix, pixel_norm=True, single=False):
    """ConvBlock / MnistConvBlock: Sequential conv indices depend on whether
    PixelNorm layers are interleaved."""
    if single:
        return {"conv1": conv_from(sd, prefix + ".conv.0")}
    second = 3 if pixel_norm else 2
    return {"conv1": conv_from(sd, prefix + ".conv.0"),
            "conv2": conv_from(sd, prefix + f".conv.{second}")}


def generator_params_from_torch(model, cfg):
    """Transplant any reference generator's state_dict into pgx params."""
    sd = model.state_dict()
    params = {"blocks": {}, "to_rgb": {}}
    if cfg.conditioning != "none":
        params["embedding"] = embed_from(sd, "embedding",
                                         equalized=cfg.equal_embed)
    if cfg.arch == "proper":
        params["input"] = convt_from(sd, "progression_4.0")
        params["blocks"]["4"] = {"conv1": conv_from(sd, "progression_4.3")}
    else:
        params["input"] = convt_from(sd, "input_layer.0")
        params["blocks"]["4"] = block_from(
            sd, "progression_4", pixel_norm=cfg.pixel_norm,
            single=cfg.block_type == "single")
    for k in range(1, cfg.num_stages):
        res = 4 * 2 ** k
        params["blocks"][str(res)] = block_from(
            sd, f"progression_{res}", pixel_norm=cfg.pixel_norm,
            single=cfg.block_type == "single")
    first_rgb = 0 if cfg.arch == "proper" else 1
    for k in range(first_rgb, cfg.num_stages):
        res = 4 * 2 ** k
        params["to_rgb"][str(res)] = conv_from(sd, f"to_rgb_{res}")
    return params


def discriminator_params_from_torch(model, cfg):
    """Transplant any reference discriminator's state_dict into pgx params.

    Both reference loop conventions index progression/from_rgb so that list
    index i corresponds to our stage k = num_stages - 1 - i.
    """
    sd = model.state_dict()
    n = cfg.num_stages
    params = {"blocks": {}, "from_rgb": {}}
    for k in range(n):
        i = n - 1 - k
        res = str(4 * 2 ** k)
        params["blocks"][res] = block_from(
            sd, f"progression.{i}", pixel_norm=True,
            single=(cfg.block_type == "single" and k > 0))
        params["from_rgb"][res] = conv_from(sd, f"from_rgb.{i}")
    if cfg.conditioning == "label_plane":
        params["embeddings"] = {}
        for k in range(n):
            i = n - 1 - k
            params["embeddings"][str(4 * 2 ** k)] = embed_from(
                sd, f"embeddings.{i}", equalized=cfg.equal_embed)
    elif cfg.conditioning == "projection":
        params["embedding"] = embed_from(sd, "embedding")
    params["linear"] = linear_from(sd, "linear")
    return params
