"""pgx -> torch checkpoint export (pgx/checkpoint/torch_export.py).

Three contracts, checked against the LIVE reference classes:

1. Exact round-trip: reference state_dict -> torch_import -> torch_export
   is the identity on every parameter the models share (bit-exact), and the
   exported key set equals the reference's own (including the mnist D's
   dead compat blocks, mnist_pggan.py:96-97, which are zero-filled).
2. Strict load: the exported dict loads into a FRESH reference module built
   from the exported config JSON section (``Generator(**cfg['generator'])``,
   the reference's own resume/FID-sweep pattern) with strict=True.
3. End-to-end CLI: a pgx-trained trial exported with
   ``pgx.cli.export_torch_checkpoint`` reproduces the pgx generator's
   forward inside unmodified reference code.
"""

import json
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pgx.checkpoint.torch_export import (
    discriminator_state_dict_from_params,
    generator_state_dict_from_params,
    infer_family,
    reference_config_from_configs,
)
from pgx.checkpoint.torch_import import (
    discriminator_params_from_state_dict,
    generator_params_from_state_dict,
)
from pgx.models import zoo
from tests import torch_oracle as oracle

DEAD_MNIST_PREFIXES = ("mnist_progression_0.", "mnist_progression_1.")


def _cases():
    """(family, make_g, make_d, gcfg, dcfg) for every reference family."""
    pm, mm = oracle.load_reference_modules()
    return [
        ("legacy",
         lambda: pm.Generator(input_code_dim=8, in_channel=8, max_step=6),
         lambda: pm.Discriminator(feat_dim=8),
         zoo.legacy_generator(z_dim=8, channel=8),
         zoo.legacy_discriminator(feat_dim=8)),
        ("conditional_legacy",
         lambda: pm.ConditionalGenerator(input_code_dim=8, num_of_classes=3,
                                         in_channel=8),
         lambda: pm.ConditionalDiscriminatorWgangp(feat_dim=8,
                                                   num_of_classes=3),
         zoo.conditional_generator(z_dim=8, num_classes=3, channel=8),
         zoo.conditional_discriminator_wgangp(feat_dim=8, num_classes=3)),
        ("proper",
         lambda: pm.CorrectGenerator(input_code_dim=8, in_channel=8),
         lambda: pm.CorrectDiscriminator(feat_dim=8),
         zoo.correct_generator(z_dim=8, channel=8),
         zoo.correct_discriminator(feat_dim=8)),
        ("conditional_proper",
         lambda: pm.ConditionalCorrectGenerator(
             input_code_dim=8, num_of_classes=3, in_channel=8,
             do_equal_embed=True),
         lambda: pm.ConditionalCorrectDiscriminatorWgangp(
             feat_dim=8, num_of_classes=3, do_equal_embed=True),
         zoo.conditional_correct_generator(z_dim=8, num_classes=3,
                                           channel=8, do_equal_embed=True),
         zoo.conditional_correct_discriminator_wgangp(
             feat_dim=8, num_classes=3, do_equal_embed=True)),
        ("conditional_proper_ada",
         lambda: pm.ConditionalCorrectGeneratorAda(
             input_code_dim=8, num_of_classes=3, in_channel=8),
         lambda: pm.ConditionalCorrectDiscriminatorAda(feat_dim=8,
                                                       num_of_classes=3),
         zoo.conditional_correct_generator_ada(z_dim=8, num_classes=3,
                                               channel=8),
         zoo.conditional_correct_discriminator_ada(feat_dim=8,
                                                   num_classes=3)),
        ("mnist",
         lambda: mm.Generator(input_code_dim=8, in_channel=8),
         lambda: mm.Discriminator(feat_dim=8),
         zoo.mnist_generator(z_dim=8, channel=8),
         zoo.mnist_discriminator(feat_dim=8)),
        ("mnist",  # full ConvBlocks variant
         lambda: mm.Generator(input_code_dim=8, in_channel=8,
                              use_mnist_conv_blocks=False),
         lambda: mm.Discriminator(feat_dim=8, use_mnist_conv_blocks=False),
         zoo.mnist_generator(z_dim=8, channel=8,
                             use_mnist_conv_blocks=False),
         zoo.mnist_discriminator(feat_dim=8, use_mnist_conv_blocks=False)),
        ("conditional_mnist",
         lambda: mm.ConditionalGenerator(input_code_dim=8, num_of_classes=3,
                                         in_channel=8),
         lambda: mm.ConditionalDiscriminatorWgangp(feat_dim=8,
                                                   num_of_classes=3),
         zoo.mnist_conditional_generator(z_dim=8, num_classes=3, channel=8),
         zoo.mnist_conditional_discriminator_wgangp(feat_dim=8,
                                                    num_classes=3)),
    ]


def _sd_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _roundtrip_check(sd0, sd1, dead_ok=False):
    assert set(sd1) == set(sd0), (
        f"key sets differ: only-exported={sorted(set(sd1) - set(sd0))}, "
        f"only-reference={sorted(set(sd0) - set(sd1))}")
    for k, v0 in sd0.items():
        v1 = sd1[k]
        assert v1.shape == tuple(v0.shape), f"{k}: {v1.shape} vs {v0.shape}"
        if dead_ok and k.startswith(DEAD_MNIST_PREFIXES):
            continue                       # zero-filled dead compat blocks
        np.testing.assert_array_equal(v1, v0, err_msg=k)


def test_roundtrip_and_strict_load_all_families():
    torch.manual_seed(0)
    for family, make_g, make_d, gcfg, dcfg in _cases():
        g, d = make_g(), make_d()

        g_sd0 = _sd_np(g)
        g_sd1 = generator_state_dict_from_params(
            generator_params_from_state_dict(g.state_dict(), gcfg), gcfg)
        _roundtrip_check(g_sd0, g_sd1)

        d_sd0 = _sd_np(d)
        d_sd1 = discriminator_state_dict_from_params(
            discriminator_params_from_state_dict(d.state_dict(), dcfg),
            dcfg)
        _roundtrip_check(d_sd0, d_sd1, dead_ok=True)

        assert infer_family(gcfg, dcfg) == family

        # strict load into FRESH modules built from the exported config
        # section — the reference's own Generator(**config['generator'])
        # resume pattern (mnist_train.py:304-314)
        ref_cfg = reference_config_from_configs(gcfg, dcfg, family)
        g2, d2 = make_g().__class__, make_d().__class__
        g2 = g2(**ref_cfg["generator"])
        g2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in g_sd1.items()})
        d2 = d2(**ref_cfg["discriminator"])
        d2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in d_sd1.items()})


def test_exported_forward_matches_reference():
    """Export from a pgx-random init (not a torch transplant) and check the
    reference model computes the same forward: locks the value semantics of
    the layout, not just its inverse."""
    import jax

    from pgx.models import discriminator_apply, generator_apply
    from pgx.models.discriminator import init_discriminator
    from pgx.models.generator import init_generator

    pm, _ = oracle.load_reference_modules()
    gcfg = zoo.conditional_correct_generator(z_dim=8, num_classes=3,
                                             channel=8, dtype="float64")
    dcfg = zoo.conditional_correct_discriminator_wgangp(
        feat_dim=8, num_classes=3, dtype="float64")
    g_params = init_generator(jax.random.PRNGKey(3), gcfg)
    d_params = init_discriminator(jax.random.PRNGKey(4), dcfg)

    ref_cfg = reference_config_from_configs(gcfg, dcfg)
    g = pm.ConditionalCorrectGenerator(**ref_cfg["generator"]).double()
    g.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v)).double()
                       for k, v in generator_state_dict_from_params(
                           g_params, gcfg).items()})
    g.eval()
    d = pm.ConditionalCorrectDiscriminatorWgangp(
        **ref_cfg["discriminator"]).double()
    d.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v)).double()
                       for k, v in discriminator_state_dict_from_params(
                           d_params, dcfg).items()})
    d.eval()

    rng = np.random.RandomState(0)
    z = rng.randn(4, 8)
    labels = rng.randint(0, 3, size=(4,))
    g_params64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a),
                                                    jnp.float64), g_params)
    d_params64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a),
                                                    jnp.float64), d_params)
    for step, alpha, fading in [(2, 0.4, True), (3, 1.0, False)]:
        got = np.asarray(generator_apply(
            g_params64, gcfg, jnp.asarray(z), jnp.asarray(labels),
            step=step, alpha=alpha, fading=fading))
        with torch.no_grad():
            want = g(torch.from_numpy(z), torch.from_numpy(labels),
                     step=step, alpha=alpha if fading else -1)
        np.testing.assert_allclose(
            got, want.permute(0, 2, 3, 1).numpy(), rtol=1e-9, atol=1e-10)

        res = 4 * 2 ** dcfg.entry_stage(step)
        x = rng.randn(4, res, res, 3)
        got_d = np.asarray(discriminator_apply(
            d_params64, dcfg, jnp.asarray(x), jnp.asarray(labels),
            step=step, alpha=alpha, fading=fading))
        with torch.no_grad():
            want_d = d(torch.from_numpy(x).permute(0, 3, 1, 2),
                       torch.from_numpy(labels), step=step,
                       alpha=alpha if fading else -1).numpy()
        np.testing.assert_allclose(got_d.reshape(-1), want_d.reshape(-1),
                                   rtol=1e-9, atol=1e-10)


def test_export_cli_end_to_end(tmp_path):
    """Train a tiny pgx trial, export it, and drive the result with pure
    reference code: config JSON -> class ctor -> strict load -> forward
    equals the pgx EMA generator."""
    from pgx.cli.export_torch_checkpoint import main as export_main
    from pgx.data import synthetic_dataset
    from pgx.models import generator_apply
    from pgx import checkpoint as ckpt
    from pgx.train import LegacySchedule, TrainConfig
    from pgx.train.loop import LoopConfig, train_loop

    _, mm = oracle.load_reference_modules()

    gcfg = zoo.mnist_conditional_generator(z_dim=8, num_classes=3, channel=8)
    dcfg = zoo.mnist_conditional_discriminator_wgangp(feat_dim=8,
                                                      num_classes=3)
    schedule = LegacySchedule(8, 2, 1)
    dataset = synthetic_dataset(n=16, size=16, channels=1, num_classes=3,
                                seed=0)
    loop_cfg = LoopConfig(trial_name="texp", main_path=str(tmp_path),
                          batch_size=4, sample_every=100, checkpoint_every=6,
                          log_every=100, verbose=False, total_iterations=6)
    trial = train_loop(gcfg, dcfg, TrainConfig(), schedule, dataset,
                       loop_cfg)

    out = os.path.join(str(tmp_path), "torch_trial")
    export_main(["--trial", trial, "--out", out, "--latest-only"])

    with open(os.path.join(out, "train_config_exported.json")) as f:
        ref_cfg = json.load(f)
    assert ref_cfg["generator"]["num_of_classes"] == 3
    g_models = sorted(os.listdir(os.path.join(out, "checkpoint")))
    assert any(n.endswith("_g.model") for n in g_models)
    assert any(n.endswith("_d.model") for n in g_models)

    g_path = os.path.join(out, "checkpoint",
                          [n for n in g_models if n.endswith("_g.model")][-1])
    ref_g = mm.ConditionalGenerator(**ref_cfg["generator"])
    ref_g.load_state_dict(torch.load(g_path, weights_only=True))
    ref_g.eval()

    # forward parity vs the pgx EMA checkpoint the file came from (f32)
    pgx_g = ckpt.load_params(ckpt.latest_checkpoint(trial, "g"))
    rng = np.random.RandomState(1)
    z = rng.randn(4, 8).astype(np.float32)
    labels = np.array([0, 1, 2, 0])
    got = np.asarray(generator_apply(pgx_g, gcfg, jnp.asarray(z),
                                     jnp.asarray(labels), step=2,
                                     alpha=1.0, fading=False))
    with torch.no_grad():
        want = ref_g(torch.from_numpy(z), torch.from_numpy(labels),
                     step=2, alpha=-1)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-5, atol=2e-6)
