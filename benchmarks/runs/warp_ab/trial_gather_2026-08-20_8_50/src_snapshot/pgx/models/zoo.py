"""Factory configs mirroring every model class in the reference zoo.

Each factory returns the (GeneratorConfig | DiscriminatorConfig) that makes
the unified models semantically identical to the named reference class
(SURVEY.md section 2.2); parity is enforced by tests/test_model_parity.py
against the reference run under torch.
"""

from __future__ import annotations

from pgx.models.config import DiscriminatorConfig, GeneratorConfig


# --------------------------------------------------------------------------
# progan_modules.py — legacy family (8x8 .. 256x256, no 4x4 head)
# --------------------------------------------------------------------------

def legacy_generator(z_dim: int = 128, channel: int = 128,
                     pixel_norm: bool = True, tanh: bool = True,
                     max_step: int = 6, **kw) -> GeneratorConfig:
    """progan_modules.Generator (ref :171-254)."""
    c = channel
    return GeneratorConfig(
        z_dim=z_dim, channels=(c, c, c, c, c // 2, c // 4, c // 4),
        pixel_norm=pixel_norm, tanh=tanh, max_step=max_step, arch="legacy",
        **kw)


def legacy_discriminator(feat_dim: int = 128, max_step: int = 6,
                         **kw) -> DiscriminatorConfig:
    """progan_modules.Discriminator (ref :257-311)."""
    f = feat_dim
    return DiscriminatorConfig(
        stage_in=(f, f, f, f, f // 2, f // 4, f // 4),
        stage_out=(f, f, f, f, f, f // 2, f // 4),
        arch="legacy", max_step=max_step, **kw)


def conditional_generator(z_dim: int = 128, num_classes: int = 10,
                          channel: int = 128, pixel_norm: bool = True,
                          tanh: bool = True, max_step: int = 6,
                          **kw) -> GeneratorConfig:
    """progan_modules.ConditionalGenerator (ref :314-404): label embed of
    dim == num_classes concatenated to z."""
    base = legacy_generator(z_dim, channel, pixel_norm, tanh, max_step,
                            conditioning="concat", num_classes=num_classes,
                            embed_dim=num_classes, **kw)
    return base


def conditional_discriminator_wgangp(feat_dim: int = 128,
                                     num_classes: int = 10,
                                     **kw) -> DiscriminatorConfig:
    """progan_modules.ConditionalDiscriminatorWgangp (ref :407-476):
    per-resolution spatial label planes."""
    return legacy_discriminator(feat_dim, conditioning="label_plane",
                                num_classes=num_classes, **kw)


# --------------------------------------------------------------------------
# progan_modules.py — "proper" (paper-faithful) family with 4x4 head
# --------------------------------------------------------------------------

def correct_generator(z_dim: int = 512, channel: int = 512,
                      pixel_norm: bool = True, tanh: bool = False,
                      max_step: int = 4, **kw) -> GeneratorConfig:
    """progan_modules.CorrectGenerator (ref :479-545)."""
    c = channel
    return GeneratorConfig(z_dim=z_dim, channels=(c, c, c, c),
                           pixel_norm=pixel_norm, tanh=tanh,
                           max_step=max_step, arch="proper", **kw)


def correct_discriminator(feat_dim: int = 512, max_step: int = 4,
                          **kw) -> DiscriminatorConfig:
    """progan_modules.CorrectDiscriminator (ref :548-598)."""
    f = feat_dim
    return DiscriminatorConfig(stage_in=(f, f, f, f), stage_out=(f, f, f, f),
                               arch="proper", max_step=max_step, **kw)


def conditional_correct_generator(z_dim: int = 512, num_classes: int = 10,
                                  channel: int = 512, pixel_norm: bool = True,
                                  tanh: bool = False, max_step: int = 4,
                                  do_equal_embed: bool = False,
                                  **kw) -> GeneratorConfig:
    """progan_modules.ConditionalCorrectGenerator (ref :601-694): 6 stages to
    128x128, embed dim == z_dim ("from the ADA paper", ref :610)."""
    c = channel
    return GeneratorConfig(
        z_dim=z_dim, channels=(c, c, c, c, c // 2, c // 4),
        pixel_norm=pixel_norm, tanh=tanh, max_step=max_step, arch="proper",
        conditioning="concat", num_classes=num_classes, embed_dim=z_dim,
        equal_embed=do_equal_embed, **kw)


def conditional_correct_discriminator_wgangp(
        feat_dim: int = 128, num_classes: int = 10,
        do_equal_embed: bool = False, max_step: int = 6,
        **kw) -> DiscriminatorConfig:
    """progan_modules.ConditionalCorrectDiscriminatorWgangp (ref :697-775)."""
    f = feat_dim
    return DiscriminatorConfig(
        stage_in=(f, f, f, f, f // 2, f // 4),
        stage_out=(f, f, f, f, f, f // 2),
        arch="proper", conditioning="label_plane", num_classes=num_classes,
        equal_embed=do_equal_embed, max_step=max_step, **kw)


def conditional_correct_generator_ada(z_dim: int = 512, num_classes: int = 10,
                                      channel: int = 512,
                                      pixel_norm: bool = True,
                                      tanh: bool = False, max_step: int = 4,
                                      **kw) -> GeneratorConfig:
    """progan_modules.ConditionalCorrectGeneratorAda (ref :778-854):
    L2-normalized z and embed before concat."""
    c = channel
    return GeneratorConfig(
        z_dim=z_dim, channels=(c, c, c, c), pixel_norm=pixel_norm, tanh=tanh,
        max_step=max_step, arch="proper", conditioning="norm_concat",
        num_classes=num_classes, embed_dim=z_dim, **kw)


def conditional_correct_discriminator_ada(feat_dim: int = 512,
                                          num_classes: int = 10,
                                          max_step: int = 4,
                                          **kw) -> DiscriminatorConfig:
    """progan_modules.ConditionalCorrectDiscriminatorAda (ref :857-915):
    projection-discriminator head."""
    f = feat_dim
    return DiscriminatorConfig(
        stage_in=(f, f, f, f), stage_out=(f, f, f, f), arch="proper",
        conditioning="projection", num_classes=num_classes,
        max_step=max_step, **kw)


# --------------------------------------------------------------------------
# mnist_pggan.py — grayscale family (8x8 .. 32x32, LeakyReLU(0.1) input)
# --------------------------------------------------------------------------

def mnist_generator(z_dim: int = 128, channel: int = 64,
                    pixel_norm: bool = True, tanh: bool = True,
                    use_mnist_conv_blocks: bool = True,
                    **kw) -> GeneratorConfig:
    """mnist_pggan.Generator (ref :10-79)."""
    c = channel
    return GeneratorConfig(
        z_dim=z_dim, channels=(c, c, c, c), img_channels=1,
        pixel_norm=pixel_norm, tanh=tanh, max_step=3, arch="legacy",
        block_type="single" if use_mnist_conv_blocks else "double",
        input_lrelu_slope=0.1, **kw)


def mnist_discriminator(feat_dim: int = 64,
                        use_mnist_conv_blocks: bool = True,
                        **kw) -> DiscriminatorConfig:
    """mnist_pggan.Discriminator (ref :82-137). The reference's dead
    checkpoint-compat blocks (ref :96-97) are intentionally not carried."""
    f = feat_dim
    return DiscriminatorConfig(
        stage_in=(f, f, f, f), stage_out=(f, f, f, f), img_channels=1,
        arch="legacy",
        block_type="single" if use_mnist_conv_blocks else "double",
        max_step=3, **kw)


def mnist_conditional_generator(z_dim: int = 128, num_classes: int = 10,
                                channel: int = 64, pixel_norm: bool = True,
                                tanh: bool = True,
                                use_mnist_conv_blocks: bool = True,
                                **kw) -> GeneratorConfig:
    """mnist_pggan.ConditionalGenerator (ref :140-221): normalized embed
    concat (dim == z_dim)."""
    c = channel
    return GeneratorConfig(
        z_dim=z_dim, channels=(c, c, c, c), img_channels=1,
        pixel_norm=pixel_norm, tanh=tanh, max_step=3, arch="legacy",
        block_type="single" if use_mnist_conv_blocks else "double",
        input_lrelu_slope=0.1, conditioning="norm_concat",
        num_classes=num_classes, embed_dim=z_dim, **kw)


def mnist_conditional_discriminator_wgangp(
        feat_dim: int = 64, num_classes: int = 10,
        use_mnist_conv_blocks: bool = True, **kw) -> DiscriminatorConfig:
    """mnist_pggan.ConditionalDiscriminatorWgangp (ref :224-286)."""
    return mnist_discriminator(feat_dim, use_mnist_conv_blocks,
                               conditioning="label_plane",
                               num_classes=num_classes, **kw)


def mnist_conditional_discriminator_ada(
        feat_dim: int = 64, num_classes: int = 10,
        use_mnist_conv_blocks: bool = True, **kw) -> DiscriminatorConfig:
    """mnist_pggan.ConditionalDiscriminatorAda (ref :289-348)."""
    return mnist_discriminator(feat_dim, use_mnist_conv_blocks,
                               conditioning="projection",
                               num_classes=num_classes, **kw)


# --------------------------------------------------------------------------
# Grown high-resolution configs (pgx extension past the reference zoo)
# --------------------------------------------------------------------------

def conditional_correct_grown(max_step: int, z_dim: int = 512,
                              channel: int = 512, num_classes: int = 10,
                              pixel_norm: bool = True, tanh: bool = False,
                              **kw):
    """The conditional 'proper' family grown past its reference 128px
    ceiling (ref progan_modules.py:601-775 stops at 6 stages): constant
    `channel` through 32px, then the standard PGGAN halving plan
    (256, 128, 64, 32...) out to `max_step` stages — the architecture
    `pgx.cli.grow_checkpoint` produces when extending a trained 128px
    net, and what the reference's stale `*512` grower imports aimed at
    (scripts/smaller_to_bigger_net_checkpoint_load.py:7-8).

    Returns (GeneratorConfig, DiscriminatorConfig); resolution is
    ``4 * 2**(max_step-1)`` (7 -> 256px, 8 -> 512px, 9 -> 1024px).
    """
    c = channel
    plan = [c, c, c, c] + [c // 2 ** k for k in range(1, 8)]
    g_ch = tuple(plan[:max_step])
    if g_ch and g_ch[-1] < 1:
        # the halving plan divides past 1 channel — fail at config time
        # with the actual constraint, not deep inside model init
        raise ValueError(
            f"channel={channel} is too small for max_step={max_step}: the "
            f"halving plan reaches {g_ch[-1]} channels; need channel >= "
            f"{2 ** (max_step - 4)}")
    d_out = (g_ch[0],) + g_ch[:-1]
    gcfg = GeneratorConfig(
        z_dim=z_dim, channels=g_ch, pixel_norm=pixel_norm, tanh=tanh,
        max_step=max_step, arch="proper", conditioning="concat",
        num_classes=num_classes, embed_dim=z_dim, **kw)
    dcfg = DiscriminatorConfig(
        stage_in=g_ch, stage_out=d_out, arch="proper",
        conditioning="label_plane", num_classes=num_classes,
        max_step=max_step, **kw)
    return gcfg, dcfg
