"""Export pgx checkpoints back to reference PyTorch state_dicts.

The inverse of ``pgx.checkpoint.torch_import``: pgx parameter pytrees are
re-laid-out into the exact ``state_dict`` schema the reference's 17 model
classes expect (HWIO -> OIHW conv weights, HWOI -> IOHW transposed convs,
transposed linear weights, the ``weight_orig`` equalized-LR key naming from
progan_modules.py:8-51), so a pgx-trained model loads into unmodified
reference code with ``load_state_dict`` (strict) — for torch-side sampling,
FID sweeps (fid/load_cifar_model_and_fid_it.py:93-103), or continuing
training with the reference's own resume (mnist_train.py:66-80).

Round-trip fidelity (reference sd -> import -> export == identity on every
key the models share) is pinned by tests/test_torch_export.py, which also
strict-loads every exported family into the live reference classes.

The mnist Discriminator quirk is honoured: the reference class keeps two
dead "old models had it" blocks (mnist_pggan.py:96-97) whose parameters
exist in its state_dicts but are never used in any forward; pgx does not
carry them, so the exporter emits zero-filled tensors of the right shapes
to satisfy strict loading.

torch is only needed when a ``.model`` file is actually written.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from pgx.models.config import DiscriminatorConfig, GeneratorConfig

Params = Dict[str, Any]
StateDict = Dict[str, np.ndarray]


def _a(x) -> np.ndarray:
    """Device/bf16-safe -> contiguous float32 numpy (the reference is f32)."""
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def conv_to(p: Params, prefix: str, sd: StateDict) -> None:
    """EqualConv2d: pgx HWIO -> torch OIHW (+ the EqualLR weight_orig key)."""
    sd[prefix + ".conv.weight_orig"] = _a(p["w"]).transpose(3, 2, 0, 1)
    sd[prefix + ".conv.bias"] = _a(p["b"])


def convt_to(p: Params, prefix: str, sd: StateDict) -> None:
    """EqualConvTranspose2d: pgx HWOI -> torch IOHW."""
    sd[prefix + ".conv.weight_orig"] = _a(p["w"]).transpose(3, 2, 0, 1)
    sd[prefix + ".conv.bias"] = _a(p["b"])


def linear_to(p: Params, prefix: str, sd: StateDict) -> None:
    sd[prefix + ".linear.weight_orig"] = _a(p["w"]).T
    sd[prefix + ".linear.bias"] = _a(p["b"])


def embed_to(p: Params, prefix: str, equalized: bool,
             sd: StateDict) -> None:
    key = prefix + (".embed.weight_orig" if equalized else ".weight")
    sd[key] = _a(p["w"])


def block_to(p: Params, prefix: str, pixel_norm: bool, single: bool,
             sd: StateDict) -> None:
    """Inverse of torch_import.block_from: Sequential conv indices depend on
    whether PixelNorm layers are interleaved (progan_modules.py:120-164)."""
    conv_to(p["conv1"], prefix + ".conv.0", sd)
    if not single:
        conv_to(p["conv2"], prefix + f".conv.{3 if pixel_norm else 2}", sd)


def generator_state_dict_from_params(params: Params,
                                     cfg: GeneratorConfig) -> StateDict:
    """Re-lay any pgx generator pytree as its reference state_dict."""
    sd: StateDict = {}
    if cfg.conditioning != "none":
        embed_to(params["embedding"], "embedding", cfg.equal_embed, sd)
    single = cfg.block_type == "single"
    if cfg.arch == "proper":
        convt_to(params["input"], "progression_4.0", sd)
        # the proper 4x4 block pixel-norms unconditionally
        # (progan_modules.py:487-494), hence the fixed .3 index
        conv_to(params["blocks"]["4"]["conv1"], "progression_4.3", sd)
    else:
        convt_to(params["input"], "input_layer.0", sd)
        block_to(params["blocks"]["4"], "progression_4", cfg.pixel_norm,
                 single, sd)
    for k in range(1, cfg.num_stages):
        res = 4 * 2 ** k
        block_to(params["blocks"][str(res)], f"progression_{res}",
                 cfg.pixel_norm, single, sd)
    first_rgb = 0 if cfg.arch == "proper" else 1
    for k in range(first_rgb, cfg.num_stages):
        res = 4 * 2 ** k
        conv_to(params["to_rgb"][str(res)], f"to_rgb_{res}", sd)
    return sd


def _is_mnist_discriminator(cfg: DiscriminatorConfig) -> bool:
    """The one reference D class with dead compat blocks: the grayscale
    4-stage unconditional mnist_pggan.Discriminator."""
    return (cfg.arch == "legacy" and cfg.img_channels == 1
            and cfg.conditioning == "none" and cfg.num_stages == 4)


def discriminator_state_dict_from_params(
        params: Params, cfg: DiscriminatorConfig,
        dead_mnist_blocks: Optional[bool] = None) -> StateDict:
    """Re-lay any pgx discriminator pytree as its reference state_dict.

    Both reference loop conventions index progression/from_rgb so that list
    index i corresponds to pgx stage k = num_stages - 1 - i.
    """
    n = cfg.num_stages
    sd: StateDict = {}
    for k in range(n):
        i = n - 1 - k
        res = str(4 * 2 ** k)
        block_to(params["blocks"][res], f"progression.{i}", True,
                 cfg.block_type == "single" and k > 0, sd)
        conv_to(params["from_rgb"][res], f"from_rgb.{i}", sd)
    if cfg.conditioning == "label_plane":
        for k in range(n):
            i = n - 1 - k
            embed_to(params["embeddings"][str(4 * 2 ** k)],
                     f"embeddings.{i}", cfg.equal_embed, sd)
    elif cfg.conditioning == "projection":
        embed_to(params["embedding"], "embedding", False, sd)
    linear_to(params["linear"], "linear", sd)

    if dead_mnist_blocks is None:
        dead_mnist_blocks = _is_mnist_discriminator(cfg)
    if dead_mnist_blocks:
        feat = int(cfg.stage_out[0])
        for name, ksize in (("mnist_progression_0", 3),
                            ("mnist_progression_1", 4)):
            sd[f"{name}.conv.0.conv.weight_orig"] = np.zeros(
                (feat, feat + 1, ksize, ksize), np.float32)
            sd[f"{name}.conv.0.conv.bias"] = np.zeros((feat,), np.float32)
    return sd


# ---------------------------------------------------------------------------
# pgx zoo configs -> reference model families / config-JSON schema
# ---------------------------------------------------------------------------

def infer_family(gcfg: GeneratorConfig, dcfg: DiscriminatorConfig) -> str:
    """Name the reference family (torch_import.FAMILIES key) a pgx config
    pair corresponds to — the inverse of the importer's family dispatch."""
    if gcfg.arch == "proper":
        if gcfg.conditioning == "none":
            return "proper"
        if dcfg.conditioning == "projection":
            return "conditional_proper_ada"
        return "conditional_proper"
    mnist = gcfg.img_channels == 1 and gcfg.num_stages == 4
    if gcfg.conditioning == "none":
        return "mnist" if mnist else "legacy"
    return "conditional_mnist" if mnist else "conditional_legacy"


def reference_config_from_configs(gcfg: GeneratorConfig,
                                  dcfg: DiscriminatorConfig,
                                  family: Optional[str] = None
                                  ) -> Dict[str, Any]:
    """Build the reference's ``train_config_*.json`` generator/discriminator
    sections: exactly the ctor kwargs each family's classes accept (e.g.
    mnist_train.py:100-121 saves these and prepare_training feeds them back
    as ``Generator(**config['generator'])``)."""
    family = family or infer_family(gcfg, dcfg)
    gen: Dict[str, Any] = {"input_code_dim": gcfg.z_dim,
                           "in_channel": gcfg.channels[0],
                           "pixel_norm": gcfg.pixel_norm,
                           "tanh": gcfg.tanh}
    dis: Dict[str, Any] = {"feat_dim": int(dcfg.stage_out[0])}
    if family in ("mnist", "conditional_mnist"):
        gen["use_mnist_conv_blocks"] = gcfg.block_type == "single"
        dis["use_mnist_conv_blocks"] = dcfg.block_type == "single"
    else:
        gen["max_step"] = gcfg.max_step
    if gcfg.conditioning != "none":
        gen["num_of_classes"] = gcfg.num_classes
        dis["num_of_classes"] = dcfg.num_classes
    if family == "conditional_proper":
        gen["do_equal_embed"] = gcfg.equal_embed
        dis["do_equal_embed"] = dcfg.equal_embed
    return {"generator": gen, "discriminator": dis,
            "max_step": gcfg.max_step}


def save_torch_checkpoint(sd: StateDict, path: str) -> None:
    """Write a state_dict as a reference ``.model`` file (torch.save)."""
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def export_checkpoint_pair(g_params: Optional[Params],
                           d_params: Optional[Params],
                           gcfg: GeneratorConfig, dcfg: DiscriminatorConfig,
                           g_path: Optional[str] = None,
                           d_path: Optional[str] = None) -> None:
    """Convert pgx param pytrees and write reference .model files."""
    if g_params is not None and g_path:
        save_torch_checkpoint(
            generator_state_dict_from_params(g_params, gcfg), g_path)
    if d_params is not None and d_path:
        save_torch_checkpoint(
            discriminator_state_dict_from_params(d_params, dcfg), d_path)
