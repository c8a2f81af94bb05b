"""pgx.cli.import_checkpoint round trip: a reference-format trial (torch
state_dict .model files + reference config JSON) imports into a pgx trial
whose generator reproduces the torch model's outputs, and the imported trial
feeds the downstream tools (grow_checkpoint)."""

import json
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

try:
    import progan_modules
except ImportError:  # pragma: no cover
    progan_modules = None

from pgx import checkpoint as ckpt
from pgx.cli.import_checkpoint import main as import_main
from pgx.models import generator_apply

pytestmark = pytest.mark.skipif(progan_modules is None,
                                reason="reference not importable")


def _make_reference_trial(tmp_path, conditional=False):
    """Write a trial dir exactly the way proper_cifar_train.py does
    (:118-157: config JSON + checkpoint/{iter}_g.model)."""
    torch.manual_seed(0)
    if conditional:
        g = progan_modules.ConditionalCorrectGenerator(
            input_code_dim=16, in_channel=16, pixel_norm=True, tanh=False,
            max_step=4, num_of_classes=3)
        d = progan_modules.ConditionalCorrectDiscriminatorWgangp(
            feat_dim=16, num_of_classes=3)
    else:
        g = progan_modules.CorrectGenerator(input_code_dim=16, in_channel=16,
                                            pixel_norm=True, tanh=False,
                                            max_step=4)
        d = progan_modules.CorrectDiscriminator(feat_dim=16)
    trial = tmp_path / ("ref_trial_cond" if conditional else "ref_trial")
    (trial / "checkpoint").mkdir(parents=True)
    cfg = {
        "generator": {"in_channel": 16, "input_code_dim": 16,
                      "pixel_norm": True, "tanh": False},
        "discriminator": {"feat_dim": 16},
        "batch_size": 4, "learning_rate": 1e-3, "max_step": 4,
        "images_seen_per_mini_step": 800000, "trial_name": "t",
    }
    if conditional:
        cfg["generator"]["do_equal_embed"] = False
        cfg["discriminator"]["do_equal_embed"] = False
    with open(trial / "train_config_t.json", "w") as f:
        json.dump(cfg, f)
    for it in (2000, 4000):
        torch.save(g.state_dict(),
                   trial / "checkpoint" / f"{it}_g.model")
        torch.save(d.state_dict(),
                   trial / "checkpoint" / f"{it}_d.model")
    return trial, g, d


def test_import_round_trip_unconditional(tmp_path):
    trial, g_ref, _ = _make_reference_trial(tmp_path)
    out = tmp_path / "imported"
    import_main(["--trial", str(trial), "--family", "proper",
                 "--out", str(out)])

    paths = ckpt.list_checkpoints(str(out), "g")
    assert [ckpt.checkpoint_iteration(p) for p in paths] == [2000, 4000]
    assert ckpt.list_checkpoints(str(out), "d")

    cfg = ckpt.load_config(str(out))
    gcfg, dcfg, tc = ckpt.configs_from_dict(cfg)
    assert cfg["reference_family"] == "proper"
    assert cfg["images_seen_per_mini_step"] == 800000

    params = ckpt.load_params(paths[-1])
    z = np.random.RandomState(0).randn(2, 16).astype(np.float32)
    with torch.no_grad():
        want = g_ref(torch.from_numpy(z), step=2, alpha=0.7).numpy()
    got = np.asarray(generator_apply(
        jax.tree.map(lambda a: a.astype(jnp.float32), params), gcfg,
        jnp.asarray(z), None, step=2, alpha=jnp.float32(0.7), fading=True))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-5)


def test_import_round_trip_conditional_and_grow(tmp_path):
    trial, g_ref, _ = _make_reference_trial(tmp_path, conditional=True)
    out = tmp_path / "imported_cond"
    import_main(["--trial", str(trial), "--family", "conditional_proper",
                 "--num-classes", "3", "--out", str(out), "--latest-only"])

    cfg = ckpt.load_config(str(out))
    gcfg, dcfg, tc = ckpt.configs_from_dict(cfg)
    params = ckpt.load_params(ckpt.latest_checkpoint(str(out), "g"))

    z = np.random.RandomState(1).randn(3, 16).astype(np.float32)
    labels = np.array([0, 1, 2])
    with torch.no_grad():
        want = g_ref(torch.from_numpy(z), torch.from_numpy(labels),
                     step=1, alpha=1.0).numpy()
    got = np.asarray(generator_apply(
        jax.tree.map(lambda a: a.astype(jnp.float32), params), gcfg,
        jnp.asarray(z), jnp.asarray(labels), step=1, alpha=jnp.float32(1.0),
        fading=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-5)

    # the imported trial feeds the grower (reference scripts/smaller_to_…)
    from pgx.cli.grow_checkpoint import main as grow_main
    grown = grow_main(["--trial", str(out), "--target-channels",
                       "16,16,16,16,8,4,4", "--target-max-step", "7"])
    assert ckpt.latest_checkpoint(grown, "g")


def test_import_single_file_with_sample(tmp_path):
    trial, g_ref, _ = _make_reference_trial(tmp_path)
    out = tmp_path / "imported_single"
    gm = str(trial / "checkpoint" / "4000_g.model")
    import_main(["--g-model", gm, "--family", "proper", "--out", str(out),
                 "--sample"])
    assert os.path.exists(out / "checkpoint" / "4000_g.model")
    samples = list((out / "sample").iterdir())
    assert samples and samples[0].stat().st_size > 0
