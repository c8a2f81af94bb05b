"""FID machinery tests: frechet-distance golden values, preprocessing-quirk
parity with the reference, Inception architecture sanity, and an end-to-end
sweep over a real trial directory."""

import json
import os

import numpy as np
import pytest

import jax

from pgx.eval import (
    calculate_frechet_distance,
    get_activations,
    inception_pool3,
    init_inception,
    make_extractor,
    preprocess,
    sweep_trial,
    to_uint8_quirk,
)


def test_frechet_distance_identical_is_zero():
    rng = np.random.RandomState(0)
    acts = rng.randn(200, 16)
    mu, sigma = acts.mean(0), np.cov(acts, rowvar=False)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_mean_shift_golden():
    # equal covariances: d^2 = ||mu1 - mu2||^2
    d = 8
    sigma = np.eye(d)
    mu1 = np.zeros(d)
    mu2 = np.full(d, 0.5)
    got = calculate_frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(got, 0.25 * d, atol=1e-8)


def test_frechet_distance_diagonal_golden():
    # diagonal covariances: Tr(C1 + C2 - 2 sqrt(C1 C2))
    s1 = np.diag([1.0, 4.0])
    s2 = np.diag([9.0, 16.0])
    want = (1 + 9 - 2 * 3) + (4 + 16 - 2 * 8)
    got = calculate_frechet_distance(np.zeros(2), s1, np.zeros(2), s2)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_uint8_quirk_matches_reference_formula():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 4, 3).astype(np.float32)
    got = to_uint8_quirk(x)
    want = ((np.tanh(x) + 1) * 127.5).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    u8 = (rng.rand(4, 4, 3) * 255).astype(np.uint8)
    np.testing.assert_array_equal(to_uint8_quirk(u8), u8)


def test_preprocess_matches_torch_chain():
    """Full preprocessing parity with the reference chain: MyDataset squash
    -> torchvision Resize(299)/ToTensor/Normalize -> wrapper 2x-1."""
    import torch
    from PIL import Image

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)  # reference feeds NCHW

    want = []
    for item in x:
        t = ((np.tanh(item) + 1) * 127.5).astype(np.uint8)
        t = np.transpose(t, (1, 2, 0))
        im = Image.fromarray(t).convert("RGB").resize((299, 299),
                                                      Image.BILINEAR)
        arr = np.asarray(im, np.float32) / 255.0
        arr = (arr - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225])
        want.append(arr * 2 - 1)
    want = np.stack(want).astype(np.float32)

    got = preprocess(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_inception_output_shape_and_determinism():
    params = init_inception(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(2, 299, 299, 3).astype(np.float32)
    feats = np.asarray(inception_pool3(params, x))
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()
    feats2 = np.asarray(inception_pool3(params, x))
    np.testing.assert_array_equal(feats, feats2)


def test_activations_batching_consistent():
    extractor = make_extractor(key=jax.random.PRNGKey(1))
    data = (np.random.RandomState(3).rand(7, 16, 16, 3) * 255).astype(
        np.uint8)
    a = get_activations(data, extractor, batch_size=3)
    b = get_activations(data, extractor, batch_size=7)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_extractor_data_parallel_matches_single():
    """make_extractor(mesh=...) shards each Inception batch over the
    device mesh; features must match the single-device extractor bit-close,
    including a batch NOT divisible by the mesh (padding + slice-back)."""
    from pgx.eval.inception import init_inception
    from pgx.parallel import make_mesh

    params = init_inception(jax.random.PRNGKey(2))
    mesh = make_mesh(jax.devices()[:4])
    single = make_extractor(params=params)
    sharded = make_extractor(params=params, mesh=mesh)
    # 299x299 Inception forwards are slow on CPU: use tiny images and few
    # samples (the pool3 head global-pools, so any size flows through)
    x = np.random.RandomState(5).rand(6, 32, 32, 3).astype(np.float32)
    np.testing.assert_allclose(sharded(x), single(x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(sharded(x[:5]), single(x[:5]),
                               rtol=1e-5, atol=1e-5)


def test_inception_pool3_matches_torch_oracle(tmp_path):
    """The #1 verification gap from round 2: the JAX InceptionV3 port vs an
    INDEPENDENT torch implementation of pytorch_fid's FID variant
    (tests/torch_fid_inception.py), weights transplanted through
    ``load_torch_weights``'s state_dict naming.  f64, full 299x299 input.
    Locks the port's math so a real pt_inception-2015-12-05 weights file
    immediately yields reference-comparable FID (musem_fid.py:90-123)."""
    import torch

    from pgx.eval.inception import load_torch_weights
    from tests.torch_fid_inception import FIDInceptionV3, randomize_

    model = randomize_(FIDInceptionV3(), seed=0).double().eval()
    sd_path = os.path.join(str(tmp_path), "rand_inception.pt")
    torch.save(model.state_dict(), sd_path)

    params = load_torch_weights(sd_path)
    # naming completeness both directions: the loader consumed every conv
    # the torch net has, and fills every slot the JAX init creates
    assert set(params.keys()) == set(init_inception(jax.random.PRNGKey(0)))

    rng = np.random.RandomState(1)
    x = (rng.rand(2, 299, 299, 3) * 2.0 - 1.0).astype(np.float64)
    p64 = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    feats_jax = np.asarray(inception_pool3(p64, x))
    with torch.no_grad():
        feats_t = model(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    assert feats_jax.shape == feats_t.shape == (2, 2048)
    np.testing.assert_allclose(feats_jax, feats_t, rtol=1e-6, atol=1e-6)


def test_load_torch_weights_torchvision_layout(tmp_path):
    """The drop-in weights procedure (docs/MIGRATING.md) accepts BOTH
    supported checkpoint layouts: pytorch_fid's pt_inception-2015-12-05
    state_dict and a stock torchvision ``inception_v3`` state_dict.  The
    torchvision layout carries extra heads the FID path never uses
    (``AuxLogits.*``, ``fc.*``) and the same backbone keys — the loader
    must ignore the extras and produce identical params."""
    import torch

    from pgx.eval.inception import load_torch_weights
    from tests.torch_fid_inception import FIDInceptionV3, randomize_

    model = randomize_(FIDInceptionV3(), seed=7).eval()
    base_sd = model.state_dict()

    # pt_inception-2015-12-05 layout: backbone + 1008-class fc head
    fid_sd = dict(base_sd)
    fid_sd["fc.weight"] = torch.zeros(1008, 2048)
    fid_sd["fc.bias"] = torch.zeros(1008)
    fid_path = os.path.join(str(tmp_path), "pt_inception.pt")
    torch.save(fid_sd, fid_path)

    # torchvision inception_v3 layout: backbone + AuxLogits + 1000-class fc
    tv_sd = dict(base_sd)
    for name, shape in [("AuxLogits.conv0.conv.weight", (128, 768, 1, 1)),
                        ("AuxLogits.conv0.bn.weight", (128,)),
                        ("AuxLogits.conv0.bn.bias", (128,)),
                        ("AuxLogits.conv0.bn.running_mean", (128,)),
                        ("AuxLogits.conv0.bn.running_var", (128,)),
                        ("AuxLogits.conv1.conv.weight", (768, 128, 5, 5)),
                        ("AuxLogits.conv1.bn.weight", (768,)),
                        ("AuxLogits.conv1.bn.bias", (768,)),
                        ("AuxLogits.conv1.bn.running_mean", (768,)),
                        ("AuxLogits.conv1.bn.running_var", (768,)),
                        ("AuxLogits.fc.weight", (1000, 768)),
                        ("AuxLogits.fc.bias", (1000,)),
                        ("fc.weight", (1000, 2048)),
                        ("fc.bias", (1000,))]:
        tv_sd[name] = torch.zeros(*shape)
    tv_path = os.path.join(str(tmp_path), "torchvision_inception_v3.pt")
    torch.save(tv_sd, tv_path)

    p_fid = load_torch_weights(fid_path)
    p_tv = load_torch_weights(tv_path)
    assert set(p_tv.keys()) == set(p_fid.keys()) \
        == set(init_inception(jax.random.PRNGKey(0)))
    for name in p_fid:
        for leaf in p_fid[name]:
            np.testing.assert_array_equal(np.asarray(p_fid[name][leaf]),
                                          np.asarray(p_tv[name][leaf]))


def test_fid_end_to_end_matches_torch_stack(tmp_path):
    """End-to-end FID equality of the two stacks (preprocess -> pool3 ->
    statistics -> Frechet) on synthetic data, f32 — the configuration the
    sweep drivers actually run."""
    import torch

    from pgx.eval import calculate_fid_given_data
    from pgx.eval.inception import load_torch_weights
    from tests.torch_fid_inception import FIDInceptionV3, randomize_

    model = randomize_(FIDInceptionV3(), seed=3).eval()
    sd_path = os.path.join(str(tmp_path), "rand_inception.pt")
    torch.save(model.state_dict(), sd_path)
    params = load_torch_weights(sd_path)

    def torch_extractor(batch_nhwc):
        with torch.no_grad():
            t = torch.from_numpy(
                np.ascontiguousarray(batch_nhwc.transpose(0, 3, 1, 2)))
            return model(t).numpy()

    rng = np.random.RandomState(4)
    a = (rng.rand(8, 16, 16, 3) * 255).astype(np.uint8)
    b = (rng.rand(8, 16, 16, 3) * 255).astype(np.uint8)
    fid_jax = calculate_fid_given_data(a, b, make_extractor(params),
                                       batch_size=4)
    fid_torch = calculate_fid_given_data(a, b, torch_extractor, batch_size=4)
    assert np.isfinite(fid_jax) and fid_jax > 0
    assert abs(fid_jax - fid_torch) <= 1e-3 * max(abs(fid_torch), 1.0)


def test_generate_samples_labels_class_balanced(monkeypatch):
    """Conditional sweeps must draw class-BALANCED labels (shuffled
    round-robin) to match the real-side statistics, which are computed over
    class-balanced subsets (datasets._balanced_subset_indices) — not
    uniform-random labels."""
    import pgx.eval.sweep as sweep_mod
    from pgx.models import zoo

    captured = []

    def fake_make_eval_generate(gcfg, *, step, fading):
        def gen(params, z, labels, alpha):
            captured.append(np.asarray(labels))
            return np.zeros((z.shape[0], 4, 4, 1), np.float32)
        return gen

    monkeypatch.setattr(sweep_mod, "make_eval_generate",
                        fake_make_eval_generate)
    gcfg = zoo.mnist_conditional_generator(z_dim=8, channel=8)
    out = sweep_mod.generate_samples(
        None, gcfg, step=0, alpha=1.0, fading=False, num_samples=25,
        batch_size=8, seed=0, num_classes=10)
    assert out.shape[0] == 25
    labels = np.concatenate(captured)
    counts = np.bincount(labels, minlength=10)
    # 25 samples over 10 classes -> every class 2 or 3 times
    assert counts.min() >= 2 and counts.max() <= 3
    # shuffled, not sorted round-robin blocks
    assert not np.array_equal(labels[:10], np.arange(10))


@pytest.mark.slow
def test_sweep_trial_end_to_end(tmp_path):
    """Train a tiny run, then sweep its checkpoints with a random-weight
    extractor; fid_score.json is written incrementally and skips re-scores."""
    from pgx.data import synthetic_dataset
    from pgx.models import zoo
    from pgx.train import LegacySchedule, TrainConfig
    from pgx.train.loop import LoopConfig, train_loop

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    schedule = LegacySchedule(8, 2, 1)
    dataset = synthetic_dataset(n=32, size=16, channels=1, seed=0)
    loop_cfg = LoopConfig(trial_name="fidsweep", main_path=str(tmp_path),
                          batch_size=4, sample_every=100,
                          checkpoint_every=6, log_every=100, verbose=False,
                          total_iterations=12)
    trial = train_loop(gcfg, dcfg, TrainConfig(), schedule, dataset,
                       loop_cfg)

    extractor = make_extractor(key=jax.random.PRNGKey(2))
    real = dataset.at_resolution(16)[:32]
    scores = sweep_trial(trial, schedule, real, num_samples=16,
                         batch_size=8, extractor=extractor, verbose=False)
    assert scores
    with open(os.path.join(trial, "fid_score.json")) as f:
        saved = json.load(f)
    assert saved == scores
    assert all(np.isfinite(v) for v in saved.values())

    # idempotent: second sweep rescans but scores nothing new
    scores2 = sweep_trial(trial, schedule, real, num_samples=16,
                          batch_size=8, extractor=extractor, verbose=False)
    assert scores2 == scores


def test_precompute_real_statistics_balanced(tmp_path, monkeypatch):
    """Per-resolution real-stat precompute must draw a class-BALANCED
    subset when labels exist — the generated side draws balanced labels
    (generate_samples), so an imbalanced real baseline would bias the
    metric — and the npz round-trip must restore (mu, sigma)."""
    from pgx.data import synthetic_dataset
    from pgx.data.datasets import _balanced_subset_indices
    from pgx.eval import sweep as sweep_mod

    # imbalanced: 24 of class 0, 8 of class 1
    ds = synthetic_dataset(n=32, size=16, channels=1, num_classes=2, seed=0)
    ds.labels = np.array([0] * 24 + [1] * 8)

    seen = {}
    real_stats = sweep_mod.calculate_activation_statistics

    def spy(images, extractor, batch_size):
        seen["images"] = images
        return real_stats(images, extractor, batch_size)

    monkeypatch.setattr(sweep_mod, "calculate_activation_statistics", spy)
    extractor = make_extractor(key=jax.random.PRNGKey(0))
    sweep_mod.precompute_real_statistics(
        ds, [16], str(tmp_path), samples_per_size=16,
        extractor=extractor, batch_size=8, seed=3)

    idx = _balanced_subset_indices(ds.labels, 2, 16, 3, total=32)
    np.testing.assert_array_equal(seen["images"],
                                  ds.at_resolution(16)[idx])
    # round-robin balance: the minority class contributes all 8
    assert (ds.labels[idx] == 1).sum() == 8

    mu, sigma = sweep_mod.load_real_statistics(str(tmp_path), 16)
    assert mu.shape == (2048,) and sigma.shape == (2048, 2048)


def test_preprocess_any_float_dtype_and_empty_activations():
    """float64 (numpy default) must take the same tanh-uint8 path as
    float32 instead of crashing inside PIL; zero images is a clear error
    before any extractor work."""
    rng = np.random.RandomState(0)
    imgs64 = rng.randn(2, 16, 16, 3)
    out64 = preprocess(imgs64)
    assert out64.shape == (2, 299, 299, 3) and out64.dtype == np.float32
    np.testing.assert_allclose(
        out64, preprocess(imgs64.astype(np.float32)), atol=1e-6)
    with pytest.raises(ValueError, match="no images"):
        get_activations(np.zeros((0, 8, 8, 3), np.uint8), lambda b: b)
