"""End-to-end numerical parity of every pgx model variant against the actual
reference models (run under torch as an oracle, weights transplanted).

Covers all 15 reference classes x multiple steps x fade on/off.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pgx.models import (
    discriminator_apply,
    generator_apply,
    zoo,
)
from tests import torch_oracle as oracle


def _np(x):
    return np.asarray(x)


def _gen_case(torch_model, cfg, steps, num_classes=0, seed=0):
    torch_model = torch_model.double()
    params = oracle.generator_params_from_torch(torch_model, cfg)
    rng = np.random.RandomState(seed)
    z = rng.randn(4, cfg.z_dim)
    labels = rng.randint(0, num_classes, size=(4,)) if num_classes else None
    torch_model.eval()
    for step in steps:
        for alpha, fading in [(1.0, False), (0.4, True)]:
            t_alpha = alpha if fading else -1
            args = (torch.from_numpy(z),)
            if num_classes:
                args = args + (torch.from_numpy(labels),)
            with torch.no_grad():
                want = torch_model(*args, step=step, alpha=t_alpha)
            want = want.permute(0, 2, 3, 1).numpy()
            got = generator_apply(
                params, cfg, jnp.asarray(z),
                jnp.asarray(labels) if num_classes else None,
                step=step, alpha=alpha, fading=fading)
            np.testing.assert_allclose(
                _np(got), want, rtol=1e-9, atol=1e-10,
                err_msg=f"step={step} alpha={alpha} fading={fading}")


def _disc_case(torch_model, cfg, steps, num_classes=0, seed=1):
    torch_model = torch_model.double()
    params = oracle.discriminator_params_from_torch(torch_model, cfg)
    rng = np.random.RandomState(seed)
    torch_model.eval()
    for step in steps:
        res = 4 * 2 ** cfg.entry_stage(step)
        x = rng.randn(4, res, res, cfg.img_channels)
        labels = rng.randint(0, num_classes, size=(4,)) if num_classes else None
        for alpha, fading in [(1.0, False), (0.3, True)]:
            t_alpha = alpha if fading else -1
            args = (torch.from_numpy(x).permute(0, 3, 1, 2),)
            if num_classes:
                args = args + (torch.from_numpy(labels),)
            with torch.no_grad():
                want = torch_model(*args, step=step, alpha=t_alpha).numpy()
            got = _np(discriminator_apply(
                params, cfg, jnp.asarray(x),
                jnp.asarray(labels) if num_classes else None,
                step=step, alpha=alpha, fading=fading))
            np.testing.assert_allclose(
                got.reshape(-1), want.reshape(-1), rtol=1e-9, atol=1e-10,
                err_msg=f"step={step} alpha={alpha} fading={fading}")


# --------------------------------------------------------------------------


def test_legacy_generator_parity():
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(0)
    m = pm.Generator(input_code_dim=8, in_channel=8, pixel_norm=True,
                     tanh=True, max_step=6)
    cfg = zoo.legacy_generator(dtype="float64", z_dim=8, channel=8)
    _gen_case(m, cfg, steps=[1, 2, 3, 6, 9])  # 9 -> clamped to max_step


def test_legacy_generator_no_pixelnorm_no_tanh():
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(1)
    m = pm.Generator(input_code_dim=8, in_channel=8, pixel_norm=False,
                     tanh=False, max_step=6)
    cfg = zoo.legacy_generator(dtype="float64", z_dim=8, channel=8, pixel_norm=False,
                               tanh=False)
    _gen_case(m, cfg, steps=[1, 3, 5])


def test_legacy_discriminator_parity():
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(2)
    m = pm.Discriminator(feat_dim=8)
    cfg = zoo.legacy_discriminator(dtype="float64", feat_dim=8)
    _disc_case(m, cfg, steps=[0, 1, 2, 6])


def test_conditional_generator_parity():
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(3)
    m = pm.ConditionalGenerator(input_code_dim=8, num_of_classes=3,
                                in_channel=8)
    cfg = zoo.conditional_generator(dtype="float64", z_dim=8, num_classes=3, channel=8)
    _gen_case(m, cfg, steps=[1, 2, 4], num_classes=3)


def test_conditional_discriminator_wgangp_parity():
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(4)
    m = pm.ConditionalDiscriminatorWgangp(feat_dim=8, num_of_classes=3)
    cfg = zoo.conditional_discriminator_wgangp(dtype="float64", feat_dim=8, num_classes=3)
    _disc_case(m, cfg, steps=[0, 2, 5], num_classes=3)


def test_correct_generator_parity():
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(5)
    m = pm.CorrectGenerator(input_code_dim=8, in_channel=8)
    cfg = zoo.correct_generator(dtype="float64", z_dim=8, channel=8)
    _gen_case(m, cfg, steps=[1, 2, 3, 4])


def test_correct_generator_tanh_step2_quirk():
    # proper arch + tanh skips the fade blend at step 2 (ref :534-537)
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(6)
    m = pm.CorrectGenerator(input_code_dim=8, in_channel=8, tanh=True)
    cfg = zoo.correct_generator(dtype="float64", z_dim=8, channel=8, tanh=True)
    _gen_case(m, cfg, steps=[1, 2, 3])


def test_correct_discriminator_parity():
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(7)
    m = pm.CorrectDiscriminator(feat_dim=8)
    cfg = zoo.correct_discriminator(dtype="float64", feat_dim=8)
    _disc_case(m, cfg, steps=[1, 2, 4])


@pytest.mark.parametrize("equal_embed", [False, True])
def test_conditional_correct_generator_parity(equal_embed):
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(8)
    m = pm.ConditionalCorrectGenerator(input_code_dim=8, num_of_classes=3,
                                       in_channel=8, max_step=6,
                                       do_equal_embed=equal_embed)
    cfg = zoo.conditional_correct_generator(dtype="float64", z_dim=8, num_classes=3, channel=8,
                                            max_step=6,
                                            do_equal_embed=equal_embed)
    _gen_case(m, cfg, steps=[1, 2, 5, 6], num_classes=3)


@pytest.mark.parametrize("equal_embed", [False, True])
def test_conditional_correct_discriminator_wgangp_parity(equal_embed):
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(9)
    m = pm.ConditionalCorrectDiscriminatorWgangp(feat_dim=8, num_of_classes=3,
                                                 do_equal_embed=equal_embed)
    cfg = zoo.conditional_correct_discriminator_wgangp(dtype="float64", 
        feat_dim=8, num_classes=3, do_equal_embed=equal_embed)
    _disc_case(m, cfg, steps=[1, 3, 6], num_classes=3)


def test_conditional_correct_generator_ada_parity():
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(10)
    m = pm.ConditionalCorrectGeneratorAda(input_code_dim=8, num_of_classes=3,
                                          in_channel=8)
    cfg = zoo.conditional_correct_generator_ada(dtype="float64", z_dim=8, num_classes=3,
                                                channel=8)
    _gen_case(m, cfg, steps=[1, 2, 4], num_classes=3)


def test_conditional_correct_discriminator_ada_parity():
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(11)
    m = pm.ConditionalCorrectDiscriminatorAda(feat_dim=8, num_of_classes=3)
    cfg = zoo.conditional_correct_discriminator_ada(dtype="float64", feat_dim=8, num_classes=3)
    _disc_case(m, cfg, steps=[1, 2, 4], num_classes=3)


# ----------------------------- mnist family -------------------------------


@pytest.mark.parametrize("mnist_blocks", [True, False])
def test_mnist_generator_parity(mnist_blocks):
    _, mm = oracle.load_reference_modules()
    torch.manual_seed(12)
    m = mm.Generator(input_code_dim=8, in_channel=8,
                     use_mnist_conv_blocks=mnist_blocks)
    cfg = zoo.mnist_generator(dtype="float64", z_dim=8, channel=8,
                              use_mnist_conv_blocks=mnist_blocks)
    _gen_case(m, cfg, steps=[1, 2, 3])


@pytest.mark.parametrize("mnist_blocks", [True, False])
def test_mnist_discriminator_parity(mnist_blocks):
    _, mm = oracle.load_reference_modules()
    torch.manual_seed(13)
    m = mm.Discriminator(feat_dim=8, use_mnist_conv_blocks=mnist_blocks)
    cfg = zoo.mnist_discriminator(dtype="float64", feat_dim=8,
                                  use_mnist_conv_blocks=mnist_blocks)
    _disc_case(m, cfg, steps=[0, 1, 3])


def test_mnist_conditional_generator_parity():
    _, mm = oracle.load_reference_modules()
    torch.manual_seed(14)
    m = mm.ConditionalGenerator(input_code_dim=8, num_of_classes=3,
                                in_channel=8)
    cfg = zoo.mnist_conditional_generator(dtype="float64", z_dim=8, num_classes=3, channel=8)
    _gen_case(m, cfg, steps=[1, 2, 3], num_classes=3)


def test_mnist_conditional_discriminator_wgangp_parity():
    _, mm = oracle.load_reference_modules()
    torch.manual_seed(15)
    m = mm.ConditionalDiscriminatorWgangp(feat_dim=8, num_of_classes=3)
    cfg = zoo.mnist_conditional_discriminator_wgangp(dtype="float64", feat_dim=8,
                                                     num_classes=3)
    _disc_case(m, cfg, steps=[0, 1, 3], num_classes=3)


def test_mnist_conditional_discriminator_ada_parity():
    _, mm = oracle.load_reference_modules()
    torch.manual_seed(16)
    m = mm.ConditionalDiscriminatorAda(feat_dim=8, num_of_classes=3)
    cfg = zoo.mnist_conditional_discriminator_ada(dtype="float64", feat_dim=8, num_classes=3)
    _disc_case(m, cfg, steps=[0, 1, 3], num_classes=3)


def test_conditional_correct_grown_extends_flagship():
    """zoo.conditional_correct_grown (pgx extension) reproduces the
    flagship channel plan at max_step=6 and extends it with the standard
    halving plan past 128px; the grown net runs forward at its top
    stage."""
    import jax
    import jax.numpy as jnp

    from pgx.models.discriminator import discriminator_apply, \
        init_discriminator
    from pgx.models.generator import generator_apply, init_generator

    g6, d6 = zoo.conditional_correct_grown(6)
    assert g6.channels == zoo.conditional_correct_generator(
        max_step=6).channels
    ref_d = zoo.conditional_correct_discriminator_wgangp(feat_dim=512,
                                                         max_step=6)
    assert d6.stage_in == ref_d.stage_in
    assert d6.stage_out == ref_d.stage_out

    g8, d8 = zoo.conditional_correct_grown(8)
    assert g8.channels == (512, 512, 512, 512, 256, 128, 64, 32)
    assert d8.stage_in == g8.channels

    # a channel count too small for the halving plan fails loudly at
    # config time (never a 0-channel conv deep inside model init)
    with pytest.raises(ValueError, match="too small"):
        zoo.conditional_correct_grown(9, channel=16)
    zoo.conditional_correct_grown(9, channel=32)   # boundary: plan ends at 1
    assert d8.stage_out == (512,) + g8.channels[:-1]
    assert g8.resolution(8) == 512

    # tiny instance trains/runs at the grown top stage
    gcfg, dcfg = zoo.conditional_correct_grown(7, z_dim=8, channel=64,
                                               num_classes=3)
    gp = init_generator(jax.random.PRNGKey(0), gcfg)
    dp = init_discriminator(jax.random.PRNGKey(1), dcfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    lab = jnp.asarray([0, 2])
    img = generator_apply(gp, gcfg, z, lab, step=7, alpha=1.0, fading=False)
    assert img.shape == (2, 256, 256, 3)
    score = discriminator_apply(dp, dcfg, img, lab, step=7, alpha=1.0,
                                fading=False)
    assert score.shape == (2, 1)  # label_plane D returns (B, 1) (ref quirk)
    assert bool(jnp.isfinite(score).all())
