"""Tools: gif builder, grower CLI, data prep, augmentation demo."""

import os
import zipfile

import numpy as np
import pytest

from pgx.data import prep


def _fake_trial(tmp_path, with_samples=True):
    """Train a micro trial to produce real artifacts."""
    from pgx.data import synthetic_dataset
    from pgx.models import zoo
    from pgx.train import LegacySchedule, TrainConfig
    from pgx.train.loop import LoopConfig, train_loop

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    schedule = LegacySchedule(8, 2, 1)
    dataset = synthetic_dataset(n=32, size=16, channels=1, seed=0)
    loop_cfg = LoopConfig(trial_name="tools", main_path=str(tmp_path),
                          batch_size=4, sample_every=4, checkpoint_every=6,
                          log_every=100, verbose=False, total_iterations=12)
    trial = train_loop(gcfg, dcfg, TrainConfig(), schedule, dataset,
                       loop_cfg)
    return trial, schedule


def test_gif_builder(tmp_path):
    from pgx.utils.gif import build_training_gif

    trial, schedule = _fake_trial(tmp_path)
    out = build_training_gif(trial, schedule, rows=5, cols=10, cell_size=24)
    assert os.path.exists(out)
    from PIL import Image
    im = Image.open(out)
    assert im.format == "GIF"
    im.seek(1)  # at least two frames


def test_grow_checkpoint_cli(tmp_path):
    from pgx.cli.grow_checkpoint import main

    trial, _ = _fake_trial(tmp_path)
    out = main(["--trial", trial, "--target-channels", "8,8,8,8,8",
                "--target-max-step", "4", "--check-step", "1"])
    from pgx import checkpoint as ckpt
    grown = ckpt.latest_checkpoint(out, "g")
    assert grown is not None
    params = ckpt.load_params(grown)
    assert "64" in params["blocks"]  # the new 64px stage exists


def test_grow_checkpoint_cli_conditional(tmp_path):
    """Growing a conditional trial: the label-plane D gains fresh embeddings
    for the new resolutions while every trained plane copies over, and both
    G images and D scores stay identical at the shared step (the CLI runs
    the reference's dual image+score equivalence assert)."""
    from pgx.data import synthetic_dataset
    from pgx.models import zoo
    from pgx.train import LegacySchedule, TrainConfig
    from pgx.train.loop import LoopConfig, train_loop
    from pgx.cli.grow_checkpoint import main
    from pgx import checkpoint as ckpt

    gcfg = zoo.conditional_generator(z_dim=8, channel=8, num_classes=3,
                                     max_step=2)
    dcfg = zoo.conditional_discriminator_wgangp(feat_dim=8, num_classes=3,
                                                max_step=2)
    schedule = LegacySchedule(8, 2, 1)
    dataset = synthetic_dataset(n=32, size=16, channels=3, seed=0,
                                num_classes=3)
    loop_cfg = LoopConfig(trial_name="condgrow", main_path=str(tmp_path),
                          batch_size=4, sample_every=100, checkpoint_every=6,
                          log_every=100, verbose=False, total_iterations=8)
    trial = train_loop(gcfg, dcfg, TrainConfig(), schedule, dataset,
                       loop_cfg)

    # legacy-family growth keeps the full channel plan and raises max_step
    out = main(["--trial", trial, "--target-channels", "8,8,8,8,4,2,2",
                "--target-max-step", "4", "--check-step", "1"])
    big_d = ckpt.load_params(ckpt.latest_checkpoint(out, "d"))
    small_d = ckpt.load_params(ckpt.latest_checkpoint(trial, "d"))
    # trained planes copied, new-resolution plane freshly present
    assert "64" in big_d["embeddings"]
    np.testing.assert_array_equal(big_d["embeddings"]["8"]["w"],
                                  small_d["embeddings"]["8"]["w"])

    # grow-then-continue-training: resuming the grown trial must train the
    # GROWN architecture even when the caller passes the (stale) small
    # configs — reference resume semantics reload the trial's config JSON
    # (proper_cifar_train.py:55-69)
    import pytest as _pytest
    loop_cfg2 = LoopConfig(**{**loop_cfg.__dict__, "total_iterations": 10})
    with _pytest.warns(RuntimeWarning, match="saved configs"):
        trial2 = train_loop(gcfg, dcfg, TrainConfig(),
                            LegacySchedule(12, 4, 1), dataset, loop_cfg2,
                            resume_dir=out)
    grown_after = ckpt.load_params(ckpt.latest_checkpoint(trial2, "g"))
    assert "64" in grown_after["blocks"]  # still the grown net


def test_generate_cli(tmp_path):
    """Standalone sampling from a trial checkpoint: schedule-derived
    (step, alpha), PNG grid + npz output."""
    from pgx.cli.generate import main

    trial, schedule = _fake_trial(tmp_path)
    out = main(["--trial", trial, "--num", "12",
                "--npz", str(tmp_path / "s.npz")])
    assert os.path.exists(out)
    data = np.load(tmp_path / "s.npz")
    it = 12  # _fake_trial trains 12 iterations
    st = schedule.state_at(it - 1)
    assert data["images"].shape == (12, st.resolution, st.resolution, 1)
    assert np.isfinite(data["images"]).all()


def test_cut_to_square_prefers_salient_region():
    img = np.zeros((40, 120, 3), np.uint8)
    img[:, 90:110] = 255  # high-gradient block on the right
    crop = prep.cut_to_square(img)
    assert crop.shape == (40, 40, 3)
    assert crop.max() == 255  # window landed on the salient region


def test_cut_based_on_point_clamps():
    img = np.arange(30 * 50 * 3, dtype=np.uint8).reshape(30, 50, 3)
    crop = prep.cut_based_on_point(img, cx=2, cy=2)
    assert crop.shape == (30, 30, 3)
    np.testing.assert_array_equal(crop, img[:, :30])


def test_cut_face_with_stub_detector():
    """Pluggable detector interface (face_detection_tests.py:27-64): any
    ``img -> (cx, cy) | None`` callable drives the face-centered crop; a
    None result (or no detector installed) falls back to the content-aware
    crop."""
    img = np.zeros((40, 120, 3), np.uint8)
    img[:, 90:110] = 255

    # stub "detector" finds a face at x=20 -> crop is the left window
    crop = prep.cut_face(img, detector=lambda im: (20, 20))
    assert crop.shape == (40, 40, 3)
    np.testing.assert_array_equal(crop, img[:, :40])

    # detector finds nothing -> content-aware fallback (salient right side)
    crop = prep.cut_face(img, detector=lambda im: None)
    assert crop.max() == 255

    # no detector LIBRARY in this image: the default resolves to pgx's
    # own numpy Viola-Jones engine, which finds no face in this bar
    # pattern -> content-aware fallback still yields a valid square
    crop = prep.cut_face(img)
    assert crop.shape == (40, 40, 3)


def test_cv2_haar_detector_wiring(monkeypatch):
    """The cv2 Haar cascade path (reference detector fallback;
    face_detection_tests.py uses MTCNN, cv2 ships the only detector a bare
    opencv wheel can provide).  This image's headless cv2 has no
    CascadeClassifier, so the wiring is exercised with a stub module
    implementing the cv2 surface the code consumes: default_face_detector
    must pick the LARGEST box and cut_face must center on it."""
    import sys
    import types

    class FakeCascade:
        def __init__(self, path):
            self.path = path

        def empty(self):
            return False

        def detectMultiScale(self, gray, scale, neighbors):
            assert gray.ndim == 2
            # (x, y, w, h) boxes; the second is larger and must win
            return [(5, 5, 4, 4), (80, 10, 20, 20)]

    fake = types.ModuleType("cv2")
    fake.CascadeClassifier = FakeCascade
    fake.data = types.SimpleNamespace(haarcascades="/stub/")
    fake.cvtColor = lambda img, code: img.mean(axis=-1).astype(np.uint8)
    fake.COLOR_RGB2GRAY = 7
    monkeypatch.setitem(sys.modules, "cv2", fake)
    prep.default_face_detector.cache_clear()
    try:
        det = prep.default_face_detector()
        assert det is not None
        img = np.zeros((60, 120, 3), np.uint8)
        assert det(img) == (90, 20)          # center of the larger box
        crop = prep.cut_face(img, detector=det)
        assert crop.shape == (60, 60, 3)

        # an empty/corrupt cascade skips the cv2 leg — the chain falls
        # through to pgx's own numpy Viola-Jones engine over the vendored
        # cascade (which actually works in this image)
        from pgx.data.haar import detect_face_center
        monkeypatch.setattr(FakeCascade, "empty", lambda self: True)
        prep.default_face_detector.cache_clear()
        assert prep.default_face_detector() is detect_face_center
    finally:
        prep.default_face_detector.cache_clear()


def test_load_image_pyvips_first_link(monkeypatch, tmp_path):
    """The loader chain is reference-complete (pyvips -> PIL -> cv2,
    data/utils.py:10-21): when pyvips is importable its sequential-access
    decode is used FIRST, including gray->RGB expansion and alpha drop."""
    import sys
    import types

    decoded = np.arange(6 * 4, dtype=np.uint8).reshape(6, 4, 1)

    class FakeVipsImage:
        height, width, bands = 6, 4, 1

        @staticmethod
        def new_from_file(path, access=None):
            assert access == "sequential"      # the reference's mode
            return FakeVipsImage()

        def write_to_memory(self):
            return decoded.tobytes()

    fake = types.ModuleType("pyvips")
    fake.Image = FakeVipsImage
    monkeypatch.setitem(sys.modules, "pyvips", fake)

    out = prep.load_image(str(tmp_path / "does_not_exist.png"))
    assert out.shape == (6, 4, 3)              # gray expanded to RGB
    np.testing.assert_array_equal(out[..., 0], decoded[..., 0])
    np.testing.assert_array_equal(out[..., 2], decoded[..., 0])

    # without pyvips the chain still decodes real files via PIL
    monkeypatch.delitem(sys.modules, "pyvips")
    from PIL import Image
    ref = np.zeros((5, 7, 3), np.uint8)
    ref[2, 3] = (9, 8, 7)
    p = tmp_path / "real.png"
    Image.fromarray(ref).save(p)
    np.testing.assert_array_equal(prep.load_image(str(p)), ref)


def test_metadata_and_rename(tmp_path):
    from PIL import Image

    root = tmp_path / "imgs"
    for cat, size in [("a", 20), ("b", 36)]:
        os.makedirs(root / cat)
        Image.new("RGB", (size, size + 4)).save(root / cat / "x&y#1.png")
    n = prep.rename_images(str(root))
    assert n == 2
    assert os.path.exists(root / "a" / "xy1.png")
    rows = prep.create_metadata(str(root), str(tmp_path / "info.csv"))
    assert rows == 2
    text = open(tmp_path / "info.csv").read()
    assert "a/xy1.png,a,20" in text.replace("\\", "/")


def test_unload_checkpoints(tmp_path):
    arch = tmp_path / "arch"
    os.makedirs(arch)
    with zipfile.ZipFile(arch / "ckpt.zip", "w") as zf:
        zf.writestr("some/dir/010_g.model", b"weights")
        zf.writestr("some/dir/log.txt", b"junk")
    n = prep.unload_checkpoints(str(arch), str(tmp_path / "out"))
    assert n == 1
    assert os.path.exists(tmp_path / "out" / "checkpoint" / "010_g.model")


def test_augmentation_demo_cli(tmp_path):
    from pgx.cli.augmentation_demo import main

    out = str(tmp_path / "aug.png")
    main(["--synthetic", "--out", out, "--rows", "3", "--cols", "3",
          "--size", "16"])
    assert os.path.exists(out)


def test_rename_collision_keeps_both_files(tmp_path):
    """Sanitizing 'img1&.png' must not silently REPLACE an existing
    'img1.png' (os.rename overwrites on POSIX)."""
    from PIL import Image

    root = tmp_path / "imgs"
    os.makedirs(root)
    Image.new("RGB", (8, 8), (255, 0, 0)).save(root / "img1.png")
    Image.new("RGB", (8, 8), (0, 255, 0)).save(root / "img1&.png")
    n = prep.rename_images(str(root))
    assert n == 1
    names = sorted(os.listdir(root))
    assert names == ["img1.png", "img1_1.png"]
    # the original file's content is untouched
    assert np.asarray(Image.open(root / "img1.png"))[0, 0, 0] == 255
