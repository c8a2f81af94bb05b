"""Model configuration covering the reference's full G/D zoo.

One parameterized Generator/Discriminator pair replaces the reference's 17
``nn.Module`` classes (SURVEY.md section 2.2).  Configs are frozen/hashable so
they can close over jitted, stage-specialized apply functions.

Stage numbering (ours): stage ``k`` lives at resolution ``4 * 2**k``; stage 0
is the 4x4 block.  The reference's two step conventions map on as:

* ``legacy`` arch (progan_modules.Generator/Discriminator, mnist_pggan.*):
  output/entry stage at ``step`` s is stage ``s`` (res ``4*2**s``); the 4x4
  stage has no to_rgb/from-step-0 output (G) but D supports entry at stage 0.
* ``proper`` arch (Correct* classes): output/entry stage at step ``s`` is
  stage ``s-1`` (res ``4*2**(s-1)``), with a to_rgb at 4x4.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
           "float64": jnp.float64}


def resolve_dtype(name: str):
    return _DTYPES[name]


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """Unified generator config.

    channels[k] is the output channel count of stage k (stage 0 = 4x4).
    """

    z_dim: int = 128
    channels: Tuple[int, ...] = (128,) * 7
    img_channels: int = 3
    pixel_norm: bool = True
    tanh: bool = True
    max_step: int = 6
    arch: str = "legacy"              # 'legacy' | 'proper'
    block_type: str = "double"        # 'double' | 'single' (mnist blocks)
    input_lrelu_slope: float = 0.2    # mnist input layer uses 0.1
    conditioning: str = "none"        # 'none' | 'concat' | 'norm_concat'
    num_classes: int = 0
    embed_dim: int = 0                # 0 -> sensible default in init
    equal_embed: bool = False
    dtype: str = "float32"
    # fuse upsample2x into the following 3x3 conv (exact linear composition,
    # pgx/core/layers.py equal_conv2d_up2x) for stages whose low-res input
    # is at least this size; measured cutover on TPU v5e is 32 (below it the
    # lhs_dilated conv loses to the two-pass form). 0 disables.
    fuse_up_conv_min_size: int = 32

    def __post_init__(self):
        assert self.arch in ("legacy", "proper")
        assert self.block_type in ("double", "single")
        assert self.conditioning in ("none", "concat", "norm_concat")
        if self.conditioning != "none":
            assert self.num_classes > 0
        need = self.max_step + 1 if self.arch == "legacy" else self.max_step
        assert len(self.channels) >= need, (
            f"max_step={self.max_step} ({self.arch}) needs >= {need} "
            f"stages, channels has {len(self.channels)} — use "
            f"zoo.conditional_correct_grown (or grow a checkpoint) for "
            f"resolutions past a family's ceiling")

    @property
    def num_stages(self) -> int:
        return len(self.channels)

    @property
    def compute_dtype(self):
        return resolve_dtype(self.dtype)

    @property
    def embedding_dim(self) -> int:
        if self.conditioning == "none":
            return 0
        return self.embed_dim if self.embed_dim else self.z_dim

    def out_stage(self, step: int) -> int:
        """Stage index producing the image at a given step."""
        step = min(step, self.max_step)
        return step if self.arch == "legacy" else step - 1

    def resolution(self, step: int) -> int:
        return 4 * 2 ** self.out_stage(step)


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """Unified discriminator config.

    stage_in[k] / stage_out[k] are the conv-block channel counts of stage k
    (stage 0 = the final 4x4 block; its true input is stage_in[0] + 1 for the
    minibatch-stddev channel, added internally).
    """

    stage_in: Tuple[int, ...] = (128,) * 7
    stage_out: Tuple[int, ...] = (128,) * 7
    img_channels: int = 3
    arch: str = "legacy"              # entry stage: step (legacy) / step-1 (proper)
    block_type: str = "double"        # stages > 0; stage 0 is always double
    conditioning: str = "none"        # 'none' | 'label_plane' | 'projection'
    num_classes: int = 0
    equal_embed: bool = False         # EqualEmbed label planes (do_equal_embed)
    max_step: int = 6
    dtype: str = "float32"

    def __post_init__(self):
        assert len(self.stage_in) == len(self.stage_out)
        assert self.arch in ("legacy", "proper")
        assert self.block_type in ("double", "single")
        assert self.conditioning in ("none", "label_plane", "projection")
        if self.conditioning != "none":
            assert self.num_classes > 0
        need = self.max_step + 1 if self.arch == "legacy" else self.max_step
        assert len(self.stage_in) >= need, (
            f"max_step={self.max_step} ({self.arch}) needs >= {need} "
            f"stages, stage_in has {len(self.stage_in)}")
        for k in range(1, len(self.stage_in)):
            assert self.stage_out[k] == self.stage_in[k - 1], (
                f"stage {k} out={self.stage_out[k]} must feed "
                f"stage {k-1} in={self.stage_in[k-1]}")

    @property
    def num_stages(self) -> int:
        return len(self.stage_in)

    @property
    def feat_dim(self) -> int:
        return self.stage_out[0]

    @property
    def compute_dtype(self):
        return resolve_dtype(self.dtype)

    def entry_stage(self, step: int) -> int:
        step = min(step, self.max_step)
        return step if self.arch == "legacy" else step - 1
