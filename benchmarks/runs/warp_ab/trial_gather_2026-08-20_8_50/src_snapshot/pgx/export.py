"""StableHLO model export: freeze a trained generator into a portable,
code-free deployment artifact.

The reference's only deployment story is "keep the repo around and rebuild
the nn.Module from source" (its `persistence.persistent_class` pickles class
source for that reason, ada/torch_utils/persistence.py:35).  The TPU-era
answer is ahead-of-time compilation: `jax.export` lowers the jitted EMA
generator — parameters baked in as constants — to versioned StableHLO, which
any later JAX (or other StableHLO consumer) can run WITHOUT pgx model code,
the checkpoint, or even the same Python version.

An export is a directory:

    manifest.json          {z_dim, num_classes, resolution, step, ...}
    gen_b{N}.stablehlo     one serialized artifact per batch bucket N

`load_exported(path)` needs only this module + jax: requests are padded to
the smallest bucket (the same power-of-two bucketing as `pgx.serve`), and
oversized requests are chunked through the largest one.

    python -m pgx.cli.export_model --trial trial_x/ --out model.pgx/
    gen = pgx.export.load_exported("model.pgx/")
    images = gen.sample(100, seed=0, class_id=3)
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

FORMAT_VERSION = 1


def _bucket_sizes(batch_sizes: Sequence[int]) -> list:
    sizes = sorted(set(int(b) for b in batch_sizes))
    if not sizes or sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")
    return sizes


def export_generator(gcfg, params, *, step: int, fading: bool = False,
                     alpha: float = 1.0, output: str = "uint8",
                     batch_sizes: Sequence[int] = (1, 8, 64),
                     platforms: Optional[Sequence[str]] = None
                     ) -> Dict[int, bytes]:
    """Serialize the generator forward (params baked in) per batch bucket.

    Returns {batch_size: stablehlo_bytes}.  ``platforms`` follows
    ``jax.export.export`` (None = the current backend only; pass
    ``("cpu", "tpu")`` for a multi-platform artifact).
    """
    from pgx.train.wgan import make_eval_generate

    gen = make_eval_generate(gcfg, step=step, fading=fading, output=output)
    conditional = gcfg.conditioning != "none"
    alpha = float(alpha)

    # close over params/alpha so the artifact is self-contained: jax.export
    # embeds closure constants (the weights) into the StableHLO module
    if conditional:
        fn = lambda z, labels: gen(params, z, labels, alpha)
    else:
        fn = lambda z: gen(params, z, None, alpha)

    blobs: Dict[int, bytes] = {}
    kw = {"platforms": tuple(platforms)} if platforms else {}
    for bs in _bucket_sizes(batch_sizes):
        args = [jax.ShapeDtypeStruct((bs, gcfg.z_dim), jnp.float32)]
        if conditional:
            args.append(jax.ShapeDtypeStruct((bs,), jnp.int32))
        exp = jax_export.export(jax.jit(fn), **kw)(*args)
        blobs[bs] = bytes(exp.serialize())
    return blobs


def save_exported(out_dir: str, blobs: Dict[int, bytes],
                  manifest: dict) -> str:
    os.makedirs(out_dir, exist_ok=True)
    manifest = dict(manifest, format_version=FORMAT_VERSION,
                    batch_sizes=sorted(blobs))
    for bs, blob in blobs.items():
        with open(os.path.join(out_dir, f"gen_b{bs}.stablehlo"), "wb") as f:
            f.write(blob)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return out_dir


def export_trial(trial_dir: str, out_dir: str, *,
                 checkpoint: Optional[int] = None,
                 output: str = "uint8",
                 batch_sizes: Sequence[int] = (1, 8, 64),
                 platforms: Optional[Sequence[str]] = None) -> dict:
    """Export a trial's (EMA) generator checkpoint; returns the manifest."""
    from pgx import checkpoint as ckpt
    from pgx.train.schedule import schedule_from_dict

    cfg = ckpt.load_config(trial_dir)
    gcfg, _, _ = ckpt.configs_from_dict(cfg)
    schedule = schedule_from_dict(cfg["schedule"])

    gpath, params, iteration, st = ckpt.load_generator_state(
        trial_dir, schedule, checkpoint)

    blobs = export_generator(gcfg, params, step=st.step, fading=st.fading,
                             alpha=float(st.alpha), output=output,
                             batch_sizes=batch_sizes, platforms=platforms)

    # resolution straight from the exported output aval — family-agnostic
    exp0 = jax_export.deserialize(bytearray(next(iter(blobs.values()))))
    out_shape = exp0.out_avals[0].shape
    manifest = {
        "z_dim": int(gcfg.z_dim),
        "num_classes": int(getattr(gcfg, "num_classes", 0) or 0),
        "conditional": gcfg.conditioning != "none",
        "resolution": int(out_shape[1]),
        "channels": int(out_shape[3]),
        "output": output,
        "step": int(st.step),
        "fading": bool(st.fading),
        "alpha": float(st.alpha),
        "source_trial": os.path.abspath(trial_dir),
        "source_checkpoint": int(iteration),
        "platforms": list(platforms) if platforms else None,
    }
    save_exported(out_dir, blobs, manifest)
    return manifest


class ExportedGenerator:
    """Loaded export: pads requests to the bucket grid, chunks past it.

    Pure jax.export consumer — no pgx model code, configs, or checkpoints
    are touched after export time."""

    def __init__(self, path: str):
        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"export format {self.manifest['format_version']} is newer "
                f"than this loader ({FORMAT_VERSION})")
        self.path = path
        self._fns: Dict[int, object] = {}
        for bs in self.manifest["batch_sizes"]:
            with open(os.path.join(path, f"gen_b{bs}.stablehlo"), "rb") as f:
                self._fns[bs] = jax_export.deserialize(bytearray(f.read()))
        self.buckets = sorted(self._fns)
        self.z_dim = self.manifest["z_dim"]
        self.conditional = self.manifest["conditional"]
        self.resolution = self.manifest["resolution"]

    def _call_bucket(self, z: np.ndarray, labels) -> np.ndarray:
        n = len(z)
        bs = next((b for b in self.buckets if b >= n), self.buckets[-1])
        pad = bs - n
        if pad:
            z = np.concatenate([z, np.zeros((pad, self.z_dim), np.float32)])
            if labels is not None:
                labels = np.concatenate([labels,
                                         np.zeros((pad,), np.int32)])
        args = (z, labels) if self.conditional else (z,)
        out = np.asarray(self._fns[bs].call(*args))
        return out[:n]

    def generate(self, z: np.ndarray,
                 labels: Optional[np.ndarray] = None) -> np.ndarray:
        """Images for explicit latents (+ labels when conditional)."""
        z = np.asarray(z, np.float32)
        if z.ndim != 2 or z.shape[1] != self.z_dim:
            raise ValueError(f"z must be (n, {self.z_dim}), got {z.shape}")
        if len(z) == 0:
            raise ValueError("z must contain at least one latent")
        if self.conditional:
            if labels is None:
                raise ValueError("conditional export needs labels")
            labels = np.asarray(labels, np.int32)
        top = self.buckets[-1]
        outs = [self._call_bucket(
                    z[i:i + top],
                    labels[i:i + top] if labels is not None else None)
                for i in range(0, len(z), top)]
        return np.concatenate(outs) if len(outs) > 1 else outs[0]

    def sample(self, num: int, seed: int = 0, labels=None,
               class_id: Optional[int] = None) -> np.ndarray:
        """Sample ``num`` images from N(0, 1) latents."""
        rng = np.random.RandomState(seed)
        z = rng.randn(num, self.z_dim).astype(np.float32)
        if self.conditional:
            if labels is not None:
                labels = np.asarray(labels, np.int32)
            elif class_id is not None:
                labels = np.full((num,), class_id, np.int32)
            else:
                labels = rng.randint(
                    0, max(self.manifest["num_classes"], 1),
                    num).astype(np.int32)
        return self.generate(z, labels)


def load_exported(path: str) -> ExportedGenerator:
    return ExportedGenerator(path)
