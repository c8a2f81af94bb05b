"""StableHLO export (pgx/export.py): the artifact must reproduce the live
generator bit-for-bit, pad/chunk through the bucket grid correctly, and
reload with no pgx model code in the loop (jax.export only)."""

import json
import os

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def tiny_trial(tmp_path_factory):
    """A 12-iteration conditional mnist-family trial (2 checkpoints)."""
    from pgx.data import synthetic_dataset
    from pgx.models import zoo
    from pgx.train import LegacySchedule, TrainConfig
    from pgx.train.loop import LoopConfig, train_loop

    tmp = tmp_path_factory.mktemp("export")
    gcfg = zoo.mnist_conditional_generator(z_dim=8, num_classes=3, channel=8)
    dcfg = zoo.mnist_conditional_discriminator_wgangp(feat_dim=8,
                                                      num_classes=3)
    schedule = LegacySchedule(8, 2, 1)
    dataset = synthetic_dataset(n=24, size=16, channels=1, num_classes=3,
                                seed=0)
    loop_cfg = LoopConfig(trial_name="exptrial", main_path=str(tmp),
                          batch_size=4, sample_every=100,
                          checkpoint_every=6, log_every=100, verbose=False,
                          total_iterations=12)
    return train_loop(gcfg, dcfg, TrainConfig(), schedule, dataset,
                      loop_cfg)


@pytest.fixture(scope="module")
def exported(tiny_trial, tmp_path_factory):
    from pgx.export import export_trial
    out = str(tmp_path_factory.mktemp("artifact") / "model.pgx")
    manifest = export_trial(tiny_trial, out, batch_sizes=(1, 4),
                            output="float")
    return out, manifest


def test_manifest(exported, tiny_trial):
    out, manifest = exported
    with open(os.path.join(out, "manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk["format_version"] == 1
    assert on_disk["batch_sizes"] == [1, 4]
    assert on_disk["conditional"] is True
    assert on_disk["z_dim"] == 8
    assert on_disk["resolution"] == manifest["resolution"]
    assert os.path.exists(os.path.join(out, "gen_b1.stablehlo"))
    assert os.path.exists(os.path.join(out, "gen_b4.stablehlo"))


def test_exported_matches_live_generator(exported, tiny_trial):
    """Artifact output == make_eval_generate on the same checkpoint.

    Tolerance is tight-numerical, not bitwise: the deserialized StableHLO
    recompiles under its own fusion decisions, which legitimately differ
    from the live jit at the ~1e-7 level."""
    from pgx import checkpoint as ckpt
    from pgx.export import load_exported
    from pgx.train.schedule import schedule_from_dict
    from pgx.train.wgan import make_eval_generate

    out, _ = exported
    gen = load_exported(out)

    cfg = ckpt.load_config(tiny_trial)
    gcfg, _, _ = ckpt.configs_from_dict(cfg)
    schedule = schedule_from_dict(cfg["schedule"])
    gpath = ckpt.latest_checkpoint(tiny_trial, "g")
    params = ckpt.load_params(gpath)
    st = schedule.state_at(ckpt.checkpoint_iteration(gpath) - 1)
    live = make_eval_generate(gcfg, step=st.step, fading=st.fading,
                              output="float")

    rng = np.random.RandomState(0)
    z = rng.randn(4, 8).astype(np.float32)
    labels = np.array([0, 1, 2, 0], np.int32)
    want = np.asarray(live(params, z, labels, float(st.alpha)))
    got = gen.generate(z, labels)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_padding_and_chunking(exported):
    """n=3 pads to the 4-bucket; n=10 chunks through it — both must equal
    the exact-bucket outputs row-for-row."""
    from pgx.export import load_exported
    out, _ = exported
    gen = load_exported(out)
    rng = np.random.RandomState(1)
    z = rng.randn(10, 8).astype(np.float32)
    labels = rng.randint(0, 3, 10).astype(np.int32)

    # reference: exact-bucket calls chunk by chunk (the last pads 2 -> 4)
    full = np.concatenate([gen.generate(z[i:i + 4], labels[i:i + 4])
                           for i in (0, 4, 8)])
    got3 = gen.generate(z[:3], labels[:3])
    np.testing.assert_array_equal(got3, full[:3])
    got10 = gen.generate(z, labels)
    assert got10.shape[0] == 10
    np.testing.assert_array_equal(got10, full)


def test_uint8_output_matches_png_path(exported, tiny_trial):
    """output='uint8' export equals the host to_uint8 quantization."""
    from pgx.export import export_trial, load_exported
    from pgx.utils.png import to_uint8

    out_dir = os.path.join(os.path.dirname(exported[0]), "model_u8.pgx")
    export_trial(tiny_trial, out_dir, batch_sizes=(4,), output="uint8")
    gen_u8 = load_exported(out_dir)
    gen_f = load_exported(exported[0])

    rng = np.random.RandomState(2)
    z = rng.randn(4, 8).astype(np.float32)
    labels = np.array([0, 1, 2, 1], np.int32)
    f = gen_f.generate(z, labels)
    u8 = gen_u8.generate(z, labels)
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8, to_uint8(f))


def test_empty_z_rejected(exported):
    from pgx.export import load_exported
    gen = load_exported(exported[0])
    with pytest.raises(ValueError, match="at least one"):
        gen.generate(np.zeros((0, gen.z_dim), np.float32))


def test_sample_api(exported):
    from pgx.export import load_exported
    gen = load_exported(exported[0])
    a = gen.sample(5, seed=3, class_id=1)
    b = gen.sample(5, seed=3, class_id=1)
    np.testing.assert_array_equal(a, b)
    c = gen.sample(5, seed=3, class_id=2)
    assert not np.array_equal(a, c)
    assert a.shape == (5, gen.resolution, gen.resolution, 1)


def test_unconditional_export(tmp_path):
    """Unconditional models export with a z-only signature."""
    from pgx.export import export_generator, save_exported, load_exported
    from pgx.models import init_generator, zoo
    from pgx.train.wgan import make_eval_generate

    gcfg = zoo.correct_generator(z_dim=8, channel=8, max_step=2)
    params = init_generator(jax.random.PRNGKey(0), gcfg)
    blobs = export_generator(gcfg, params, step=2, output="float",
                             batch_sizes=(2,))
    out = str(tmp_path / "uncond.pgx")
    save_exported(out, blobs, {"z_dim": 8, "num_classes": 0,
                               "conditional": False, "resolution": 8,
                               "output": "float"})
    gen = load_exported(out)
    z = np.random.RandomState(0).randn(2, 8).astype(np.float32)
    live = make_eval_generate(gcfg, step=2, output="float")
    np.testing.assert_allclose(gen.generate(z),
                               np.asarray(live(params, z, None, 1.0)),
                               rtol=2e-5, atol=1e-6)


def test_cli_smoke(tiny_trial, tmp_path, capsys):
    from pgx.cli.export_model import main
    out = str(tmp_path / "cli.pgx")
    main(["--trial", tiny_trial, "--out", out, "--batch-sizes", "2",
          "--output", "uint8", "--verify"])
    captured = capsys.readouterr().out
    assert "verify: sampled" in captured
    assert os.path.exists(os.path.join(out, "manifest.json"))
