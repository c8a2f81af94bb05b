"""Gold test: one fused pgx train step reproduces the reference's full
iteration (3 D-forwards + double-backward GP + Adam x2 + EMA) bit-close.

The torch side executes the documented per-iteration recipe
(SURVEY.md section 2.3) on the actual reference models in float64, with
weights transplanted and identical z/eps draws.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pgx.models import zoo
from pgx.train import TrainConfig, init_train_state, make_train_step
from tests import torch_oracle as oracle


def _torch_reference_iteration(G, D, g_ema, opt_g, opt_d, real, z, eps,
                               step, alpha, update_g=True):
    """One training iteration exactly as the reference loop performs it
    (proper_cifar_train.py:191-238).  ``update_g=False`` reproduces a
    D-only iteration of the n_critic cadence (train.py:157: the G branch
    runs only when ``(i+1) % n_critic == 0``; EMA advances only there)."""
    D.zero_grad()
    real_predict = D(real, step=step, alpha=alpha)
    real_predict = real_predict.mean() - 0.001 * (real_predict ** 2).mean()
    (-real_predict).backward()

    fake = G(z, step=step, alpha=alpha)
    fake_predict = D(fake.detach(), step=step, alpha=alpha).mean()
    fake_predict.backward()

    x_hat = (eps * real.data + (1 - eps) * fake.detach().data)
    x_hat.requires_grad_(True)
    hat_predict = D(x_hat, step=step, alpha=alpha)
    grad_x_hat = torch.autograd.grad(hat_predict.sum(), x_hat,
                                     create_graph=True)[0]
    grad_penalty = 10 * ((grad_x_hat.reshape(grad_x_hat.size(0), -1)
                          .norm(2, dim=1) - 1) ** 2).mean()
    grad_penalty.backward()
    opt_d.step()

    g_loss = None
    if update_g:
        G.zero_grad()
        D.zero_grad()
        predict = D(fake, step=step, alpha=alpha)
        g_loss = -predict.mean()
        g_loss.backward()
        opt_g.step()

        with torch.no_grad():
            for pe, pg in zip(g_ema.parameters(), G.parameters()):
                pe.mul_(0.999).add_(pg, alpha=0.001)

    return {
        "d_loss": (real_predict - fake_predict).item(),
        "grad_penalty": grad_penalty.item(),
        "g_loss": g_loss.item() if g_loss is not None else 0.0,
    }


def test_train_step_matches_reference_iteration():
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(42)
    G = pm.CorrectGenerator(input_code_dim=8, in_channel=8).double()
    D = pm.CorrectDiscriminator(feat_dim=8).double()
    g_ema = pm.CorrectGenerator(input_code_dim=8, in_channel=8).double()
    g_ema.load_state_dict(G.state_dict())

    gcfg = zoo.correct_generator(z_dim=8, channel=8, dtype="float64")
    dcfg = zoo.correct_discriminator(feat_dim=8, dtype="float64")
    tc = TrainConfig()

    key = jax.random.PRNGKey(7)
    state = init_train_state(key, gcfg, dcfg, tc)
    # overwrite random init with the torch weights
    state["g"] = oracle.generator_params_from_torch(G, gcfg)
    state["d"] = oracle.discriminator_params_from_torch(D, dcfg)
    state["g_ema"] = jax.tree.map(jnp.copy, state["g"])
    opt = __import__("pgx.train.wgan", fromlist=["make_optimizer"])
    state["opt_g"] = opt.make_optimizer(tc).init(state["g"])
    state["opt_d"] = opt.make_optimizer(tc).init(state["d"])

    step, alpha, fading = 3, 0.6, True
    res = 4 * 2 ** (step - 1)
    rng_np = np.random.RandomState(0)
    real = rng_np.randn(4, res, res, 3)

    # replicate the train step's internal randomness for the torch side
    _, kz, keps = jax.random.split(state["rng"], 3)
    z = np.asarray(jax.random.normal(kz, (4, gcfg.z_dim), jnp.float32),
                   dtype=np.float64)
    eps = np.asarray(jax.random.uniform(keps, (4, 1, 1, 1), jnp.float64))

    train_step = make_train_step(gcfg, dcfg, tc, step=step, fading=fading,
                                 donate=False)
    new_state, metrics = train_step(state, jnp.asarray(real), None,
                                    jnp.asarray(alpha, jnp.float64))

    opt_g = torch.optim.Adam(G.parameters(), lr=1e-3, betas=(0.0, 0.99))
    opt_d = torch.optim.Adam(D.parameters(), lr=1e-3, betas=(0.0, 0.99))
    want = _torch_reference_iteration(
        G, D, g_ema, opt_g, opt_d,
        torch.from_numpy(real).permute(0, 3, 1, 2),
        torch.from_numpy(z), torch.from_numpy(eps), step, alpha)

    # metrics match
    np.testing.assert_allclose(float(metrics["d_loss"]), want["d_loss"],
                               rtol=1e-8)
    np.testing.assert_allclose(float(metrics["grad_penalty"]),
                               want["grad_penalty"], rtol=1e-8)
    np.testing.assert_allclose(float(metrics["g_loss"]), want["g_loss"],
                               rtol=1e-8)

    # updated parameters match (spot-check via re-transplant of torch nets)
    want_g = oracle.generator_params_from_torch(G, gcfg)
    want_d = oracle.discriminator_params_from_torch(D, dcfg)
    want_ema = oracle.generator_params_from_torch(g_ema, gcfg)
    for name, ours, theirs in [("g", new_state["g"], want_g),
                               ("d", new_state["d"], want_d),
                               ("g_ema", new_state["g_ema"], want_ema)]:
        flat_a = jax.tree.leaves(ours)
        flat_b = jax.tree.leaves(theirs)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-7, atol=1e-10,
                                       err_msg=f"mismatch in {name}")


def test_train_step_runs_sharded_and_f32():
    """The production path: f32, batch sharded over the 8-device CPU mesh."""
    from pgx.parallel import make_mesh, replicate, shard_batch

    gcfg = zoo.mnist_generator(z_dim=16, channel=16)
    dcfg = zoo.mnist_discriminator(feat_dim=16)
    tc = TrainConfig()
    state = init_train_state(jax.random.PRNGKey(0), gcfg, dcfg, tc)

    mesh = make_mesh()
    state = replicate(mesh, state)
    real = np.random.RandomState(0).randn(16, 16, 16, 1).astype(np.float32)
    real = shard_batch(mesh, real)

    train_step = make_train_step(gcfg, dcfg, tc, step=2, fading=True)
    state, metrics = train_step(state, real, None, jnp.float32(0.3))
    state, metrics = train_step(state, real, None, jnp.float32(0.35))
    assert np.isfinite(float(metrics["d_total"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert int(state["iteration"]) == 2


def test_conditional_train_step_runs():
    gcfg = zoo.mnist_conditional_generator(z_dim=8, channel=8, num_classes=5)
    dcfg = zoo.mnist_conditional_discriminator_wgangp(feat_dim=8,
                                                      num_classes=5)
    tc = TrainConfig()
    state = init_train_state(jax.random.PRNGKey(1), gcfg, dcfg, tc)
    real = np.random.RandomState(1).randn(4, 8, 8, 1).astype(np.float32)
    labels = np.array([0, 1, 2, 3])
    train_step = make_train_step(gcfg, dcfg, tc, step=1, fading=False)
    state, metrics = train_step(state, jnp.asarray(real),
                                jnp.asarray(labels), jnp.float32(1.0))
    assert np.isfinite(float(metrics["d_total"]))


def test_ada_augmented_train_step():
    """Full WGAN-GP step with the ADA pipeline + p-controller wired in."""
    from pgx.augment import AdaConfig, bgc_config

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = TrainConfig()
    state = init_train_state(jax.random.PRNGKey(3), gcfg, dcfg, tc)
    real = np.random.RandomState(2).randn(8, 8, 8, 1).astype(np.float32)

    train_step = make_train_step(
        gcfg, dcfg, tc, step=1, fading=False,
        augment_cfg=bgc_config(), ada_cfg=AdaConfig(ada_length=100))
    p_vals = []
    for _ in range(5):
        state, metrics = train_step(state, jnp.asarray(real), None,
                                    jnp.float32(1.0))
        assert np.isfinite(float(metrics["d_total"]))
        assert np.isfinite(float(metrics["g_loss"]))
        p_vals.append(float(metrics["ada_p"]))
    # the controller ran and kept p in range (with random-init D the sign
    # statistic is negative, so p clamps at 0 — same as the reference)
    assert all(0.0 <= v <= 1.0 for v in p_vals)
    assert float(state["ada"]["count"]) < 4 * 8  # accumulator reset fired


def test_gp_gradient_matches_finite_differences():
    """SURVEY section 4(c): the nested-grad gradient-norm matches central
    finite differences of D, and d(gp)/d(params) is consistent with a
    directional finite difference — validating the double-backward."""
    gcfg = zoo.mnist_generator(z_dim=8, channel=8, dtype="float64")
    dcfg = zoo.mnist_discriminator(feat_dim=8, dtype="float64")
    dp = __import__("pgx.models", fromlist=["init_discriminator"])
    params = dp.init_discriminator(jax.random.PRNGKey(0), dcfg)

    from pgx.models import discriminator_apply

    def d_sum(p, x):
        return jnp.sum(discriminator_apply(p, dcfg, x, step=1, alpha=1.0))

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1),
                          jnp.float64)

    # inner gradient vs central differences on a few coordinates
    g = jax.grad(lambda xx: d_sum(params, xx))(x)
    eps = 1e-6
    rng = np.random.RandomState(0)
    for _ in range(5):
        i = tuple(rng.randint(0, s) for s in x.shape)
        basis = jnp.zeros_like(x).at[i].set(eps)
        fd = (d_sum(params, x + basis) - d_sum(params, x - basis)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4,
                                   atol=1e-6)

    # outer gradient (through the inner grad) vs a directional difference
    def gp(p):
        gx = jax.grad(lambda xx: d_sum(p, xx))(x)
        norms = jnp.sqrt(jnp.sum(gx ** 2, axis=(1, 2, 3)))
        return jnp.mean((norms - 1.0) ** 2)

    ggp = jax.grad(gp)(params)
    direction = jax.tree.map(
        lambda a: jnp.asarray(np.random.RandomState(1).randn(*a.shape)),
        params)
    directional = sum(float(jnp.sum(a * b)) for a, b in
                      zip(jax.tree.leaves(ggp), jax.tree.leaves(direction)))
    h = 1e-6
    p_plus = jax.tree.map(lambda a, d: a + h * d, params, direction)
    p_minus = jax.tree.map(lambda a, d: a - h * d, params, direction)
    fd = (float(gp(p_plus)) - float(gp(p_minus))) / (2 * h)
    np.testing.assert_allclose(directional, fd, rtol=1e-4, atol=1e-8)


def test_sharded_step_matches_single_device():
    """GSPMD data parallelism is semantics-preserving: the same train step
    on an 8-device mesh (batch sharded) produces the same updated params as
    a single-device run — losses, gradients, and minibatch-stddev reduce
    over the global batch either way (SURVEY section 2.8)."""
    from pgx.parallel import make_mesh, replicate, shard_batch

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = TrainConfig()
    state = init_train_state(jax.random.PRNGKey(5), gcfg, dcfg, tc)
    real = np.random.RandomState(4).randn(16, 8, 8, 1).astype(np.float32)

    fn = make_train_step(gcfg, dcfg, tc, step=1, fading=False, donate=False)

    s_single, m_single = fn(state, jnp.asarray(real), None, jnp.float32(1.0))
    s_single, m_single = fn(s_single, jnp.asarray(real), None,
                            jnp.float32(1.0))

    mesh = make_mesh()
    s_shard = replicate(mesh, state)
    real_sh = shard_batch(mesh, real)
    s_shard, m_shard = fn(s_shard, real_sh, None, jnp.float32(1.0))
    s_shard, m_shard = fn(s_shard, real_sh, None, jnp.float32(1.0))

    np.testing.assert_allclose(float(m_single["d_total"]),
                               float(m_shard["d_total"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_single["g"]),
                    jax.tree.leaves(s_shard["g"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
    for a, b in zip(jax.tree.leaves(s_single["d"]),
                    jax.tree.leaves(s_shard["d"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_sharded_production_recipe_matches_single_device():
    """The recommended production recipe — bf16 compute + ADA controller +
    lazy GP (gp_every=4) + remat — is ALSO semantics-preserving under GSPMD
    data parallelism, not just the plain f32 configuration (VERDICT r2 weak
    #2: the ADA controller reduction and the augment pipe under partitioning
    are exactly what breaks only multi-device).  Runs one full gp_every
    cycle (4 iterations) sharded vs single-device and compares params,
    ADA state, and metrics."""
    import dataclasses

    from pgx.augment import AdaConfig, bgc_config
    from pgx.parallel import make_mesh, replicate, shard_batch

    gcfg = zoo.mnist_generator(z_dim=8, channel=8, dtype="bfloat16")
    dcfg = zoo.mnist_discriminator(feat_dim=8, dtype="bfloat16")
    tc = dataclasses.replace(TrainConfig(), gp_every=4, remat=True)
    state0 = init_train_state(jax.random.PRNGKey(11), gcfg, dcfg, tc)
    real = np.random.RandomState(8).randn(16, 8, 8, 1).astype(np.float32)

    fns = {gp: make_train_step(gcfg, dcfg, tc, step=1, fading=False,
                               apply_gp=gp, augment_cfg=bgc_config(),
                               ada_cfg=AdaConfig(ada_length=100),
                               donate=False)
           for gp in (True, False)}

    def run(state, real_arr):
        metrics = None
        for i in range(4):
            state, metrics = fns[i % tc.gp_every == 0](
                state, real_arr, None, jnp.float32(1.0))
        return jax.device_get(state), jax.device_get(metrics)

    s_single, m_single = run(state0, jnp.asarray(real))
    mesh = make_mesh()
    s_shard, m_shard = run(replicate(mesh, state0),
                           shard_batch(mesh, real))

    assert int(s_shard["iteration"]) == 4
    # loss metrics are bf16-valued: one ulp at O(1) magnitude is ~0.004
    for k in ("d_total", "g_loss", "grad_penalty", "ada_p", "ada_r"):
        np.testing.assert_allclose(float(m_single[k]), float(m_shard[k]),
                                   rtol=1e-2, atol=1e-3, err_msg=k)
    np.testing.assert_allclose(float(s_single["ada"]["p"]),
                               float(s_shard["ada"]["p"]), atol=1e-6)
    # params: f32 masters updated through bf16 compute; sharded reductions
    # reassociate partial sums, Adam's rsqrt amplifies the difference
    for name in ("g", "d", "g_ema"):
        for a, b in zip(jax.tree.leaves(s_single[name]),
                        jax.tree.leaves(s_shard[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3,
                                       err_msg=f"mismatch in {name}")


def test_fixed_p_augmentation_without_controller():
    """augment_cfg without ada_cfg uses the fixed augment_p (not the
    controller's zero-initialized p, which would be a silent no-op)."""
    from pgx.augment import bgc_config

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = TrainConfig()
    state = init_train_state(jax.random.PRNGKey(9), gcfg, dcfg, tc)
    real = np.random.RandomState(9).randn(4, 8, 8, 1).astype(np.float32)

    fn = make_train_step(gcfg, dcfg, tc, step=1, fading=False,
                         augment_cfg=bgc_config(), augment_p=0.9,
                         donate=False)
    fn0 = make_train_step(gcfg, dcfg, tc, step=1, fading=False,
                          augment_cfg=bgc_config(), augment_p=0.0,
                          donate=False)
    _, m = fn(state, jnp.asarray(real), None, jnp.float32(1.0))
    _, m0 = fn0(state, jnp.asarray(real), None, jnp.float32(1.0))
    assert np.isfinite(float(m["d_total"]))
    # p=0.9 actually augments: D sees different images than the p=0 run
    assert abs(float(m["real_score"]) - float(m0["real_score"])) > 1e-6
    # and the log reports the APPLIED probability, not the unused
    # controller state (which stays 0.0 without an ada_cfg)
    assert float(m["ada_p"]) == pytest.approx(0.9)
    assert float(m0["ada_p"]) == pytest.approx(0.0)


def test_train_config_validates_fields():
    """Programmatic construction must reject unknown modes instead of
    silently selecting the reverse/other branch at trace time."""
    with pytest.raises(ValueError, match="gp_mode"):
        TrainConfig(gp_mode="forward")
    with pytest.raises(ValueError, match="remat_policy"):
        TrainConfig(remat_policy="none")
    with pytest.raises(ValueError, match="gp_every"):
        TrainConfig(gp_every=0)


def test_g_step_redraws_augmentation(monkeypatch):
    """StyleGAN2-ADA semantics: the G update must see a fresh augmentation
    draw, not the transform the D step's fake pass happened to use
    (VERDICT r1 weak #5)."""
    import jax
    import jax.numpy as jnp

    import pgx.train.wgan as wgan
    from pgx.augment.pipe import AugmentConfig
    from pgx.models import zoo

    seen_keys = []
    real_pipe = wgan.augment_pipe

    def spy_pipe(key, images, cfg, p, **kw):
        seen_keys.append(np.asarray(jax.random.key_data(key)))
        return real_pipe(key, images, cfg, p, **kw)

    monkeypatch.setattr(wgan, "augment_pipe", spy_pipe)

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = wgan.TrainConfig()
    state = wgan.init_train_state(jax.random.PRNGKey(0), gcfg, dcfg, tc)
    acfg = AugmentConfig(xflip=1, brightness=1)

    with jax.disable_jit():
        fn = wgan.make_train_step(gcfg, dcfg, tc, step=1, fading=False,
                                  augment_cfg=acfg, augment_p=0.8,
                                  donate=False)
        real = jnp.zeros((4, 8, 8, 1), jnp.float32)
        fn(state, real, None, jnp.float32(1.0))

    # one call for the reals, one for the D-step fakes, one for the G step
    assert len(seen_keys) == 3
    uniq = {k.tobytes() for k in seen_keys}
    assert len(uniq) == 3, "augmentation keys must all be distinct"


def test_remat_matches_plain_step():
    """TrainConfig(remat=True) rematerializes activations but must produce
    identical updates (jax.checkpoint changes memory, not math)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pgx.models import zoo
    from pgx.train import TrainConfig, init_train_state, make_train_step

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    real = jnp.asarray(
        np.random.RandomState(0).randn(4, 16, 16, 1).astype(np.float32))

    outs = {}
    for key, kwargs in [("plain", dict(remat=False)),
                        ("full", dict(remat=True)),
                        ("convs", dict(remat=True, remat_policy="convs")),
                        ("d_only", dict(remat=True, remat_policy="d_only"))]:
        tc = dataclasses.replace(TrainConfig(), **kwargs)
        state = init_train_state(jax.random.PRNGKey(0), gcfg, dcfg, tc)
        fn = make_train_step(gcfg, dcfg, tc, step=2, fading=True,
                             donate=False)
        s, m = fn(state, real, None, jnp.float32(0.5))
        outs[key] = (jax.device_get(s), jax.device_get(m))

    # recompute reassociates f32 reductions; Adam's rsqrt amplifies the
    # noise slightly (measured max ~5e-5 on CPU)
    for key in ("full", "convs", "d_only"):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=2e-4,
                                                    rtol=1e-4),
            outs["plain"], outs[key])


def test_weights_cast_once_matches_site():
    """weights_cast='once' (one barrier'd bf16 copy of the masters per
    forward) is a memory-traffic layout change: in f32 it is an exact
    no-op, and in bf16 it differs from the per-site scale+cast only in
    whether the equalized-LR scale is applied before or after rounding."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pgx.models import zoo
    from pgx.train import TrainConfig, init_train_state, make_train_step

    real = jnp.asarray(
        np.random.RandomState(0).randn(4, 16, 16, 1).astype(np.float32))

    # bf16: a one-ulp (~0.4% relative) weight perturbation moves the GP by
    # ~10% at init ((|grad|-1)^2 is locally chaotic in the weights), so the
    # bf16 leg is a same-precision-class sanity bound, not a parity pin
    for dtype, atol in [("float32", 0.0), ("bfloat16", 0.25)]:
        gcfg = zoo.mnist_generator(z_dim=8, channel=8, dtype=dtype)
        dcfg = zoo.mnist_discriminator(feat_dim=8, dtype=dtype)
        outs = {}
        for mode in ("site", "once"):
            tc = dataclasses.replace(TrainConfig(), weights_cast=mode)
            state = init_train_state(jax.random.PRNGKey(0), gcfg, dcfg, tc)
            fn = make_train_step(gcfg, dcfg, tc, step=2, fading=True,
                                 donate=False)
            s, m = fn(state, real, None, jnp.float32(0.5))
            outs[mode] = jax.device_get(m)
        for k in ("d_total", "g_loss", "grad_penalty"):
            a = np.float64(outs["site"][k])
            b = np.float64(outs["once"][k])
            assert np.isfinite(b), (dtype, k, b)
            np.testing.assert_allclose(
                a, b, atol=atol, rtol=atol,
                err_msg=f"{dtype} {k}")


def test_sharded_jvp_gp_matches_single_device():
    """gp_mode='jvp' is also semantics-preserving under GSPMD data
    parallelism: the coefficient vector u is per-sample and the surrogate
    reduces with jnp.mean over the *global* batch (bsz = global batch
    size), so an 8-device sharded step must match the single-device one —
    the same guarantee test_sharded_step_matches_single_device gives the
    reverse-mode GP."""
    import dataclasses

    from pgx.parallel import make_mesh, replicate, shard_batch

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = dataclasses.replace(TrainConfig(), gp_mode="jvp")
    state = init_train_state(jax.random.PRNGKey(5), gcfg, dcfg, tc)
    real = np.random.RandomState(4).randn(16, 8, 8, 1).astype(np.float32)

    fn = make_train_step(gcfg, dcfg, tc, step=1, fading=False, donate=False)

    s_single, m_single = fn(state, jnp.asarray(real), None, jnp.float32(1.0))
    s_single, m_single = fn(s_single, jnp.asarray(real), None,
                            jnp.float32(1.0))

    mesh = make_mesh()
    s_shard = replicate(mesh, state)
    real_sh = shard_batch(mesh, real)
    s_shard, m_shard = fn(s_shard, real_sh, None, jnp.float32(1.0))
    s_shard, m_shard = fn(s_shard, real_sh, None, jnp.float32(1.0))

    np.testing.assert_allclose(float(m_single["grad_penalty"]),
                               float(m_shard["grad_penalty"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_single["d_total"]),
                               float(m_shard["d_total"]), rtol=1e-5)
    for name in ("g", "d"):
        for a, b in zip(jax.tree.leaves(s_single[name]),
                        jax.tree.leaves(s_shard[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"mismatch in {name}")


def test_jvp_gp_mode_matches_reverse_exactly():
    """gp_mode='jvp' restructures the GP's parameter gradient as
    grad(<stop_grad(u), grad_x D>) via a JVP (pgx/train/wgan.py).  The
    surrogate is mathematically identical (quadratic trick) — at f64 on the
    proper family it matches the nested-grad form to 1 ULP, fade phase and
    minibatch-stddev included."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pgx.models import zoo
    from pgx.train import TrainConfig, init_train_state, make_train_step

    gcfg = zoo.correct_generator(z_dim=8, channel=8, dtype="float64")
    dcfg = zoo.correct_discriminator(feat_dim=8, dtype="float64")
    real = jnp.asarray(np.random.RandomState(0).randn(4, 16, 16, 3))
    alpha = jnp.asarray(0.6, jnp.float64)

    outs = {}
    for mode in ("reverse", "jvp"):
        tc = dataclasses.replace(TrainConfig(), gp_mode=mode)
        state = init_train_state(jax.random.PRNGKey(7), gcfg, dcfg, tc)
        fn = make_train_step(gcfg, dcfg, tc, step=3, fading=True,
                             donate=False)
        s, m = fn(state, real, None, alpha)
        outs[mode] = (jax.device_get(s), jax.device_get(m))

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-12, atol=0),
        outs["reverse"], outs["jvp"])


def _run_singles(gcfg, dcfg, tc, state, reals, labels, alphas, *,
                 step, fading):
    steps = {}
    for j in range(len(reals)):
        apply_gp = j % tc.gp_every == 0
        if apply_gp not in steps:
            steps[apply_gp] = make_train_step(
                gcfg, dcfg, tc, step=step, fading=fading,
                apply_gp=apply_gp, donate=False)
        state, m = steps[apply_gp](
            state, reals[j],
            labels[j] if labels is not None else None,
            jnp.float32(alphas[j]))
    return state, m


def test_multi_step_scan_matches_singles():
    """k scanned iterations == k single dispatches: same params (the scan
    body IS the single-step body; RNG threads through state identically),
    summed metrics consistent."""
    from pgx.train import make_train_multi_step

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = TrainConfig()
    k = 4
    state0 = init_train_state(jax.random.PRNGKey(3), gcfg, dcfg, tc)
    rs = np.random.RandomState(0)
    reals = tuple(jnp.asarray(rs.randn(4, 8, 8, 1).astype(np.float32))
                  for _ in range(k))
    alphas = np.linspace(0.2, 0.8, k).astype(np.float32)

    ref_state, _ = _run_singles(gcfg, dcfg, tc,
                                jax.tree.map(jnp.copy, state0), reals,
                                None, alphas, step=1, fading=True)
    multi = make_train_multi_step(gcfg, dcfg, tc, step=1, fading=True,
                                  k=k, donate=False)
    out_state, msum = multi(state0, reals, None, jnp.asarray(alphas))

    assert int(out_state["iteration"]) == k
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7),
        jax.device_get({"g": ref_state["g"], "d": ref_state["d"],
                        "g_ema": ref_state["g_ema"]}),
        jax.device_get({"g": out_state["g"], "d": out_state["d"],
                        "g_ema": out_state["g_ema"]}))
    for key in ("d_loss", "g_loss", "grad_penalty"):
        assert np.isfinite(float(msum[key]))


@pytest.mark.slow
def test_multi_step_scan_conditional_gp_every_ada():
    """The production recipe scanned: conditional + ADA + gp_every=2 —
    the window groups one GP step + one plain step per scan element and
    still matches the single-step stream."""
    from pgx.augment import AdaConfig, bgc_config
    from pgx.train import make_train_multi_step

    gcfg = zoo.mnist_conditional_generator(z_dim=8, channel=8,
                                           num_classes=3)
    dcfg = zoo.mnist_conditional_discriminator_wgangp(feat_dim=8,
                                                      num_classes=3)
    tc = TrainConfig(gp_every=2)
    aug, ada = bgc_config(), AdaConfig(ada_length=2000)
    k = 4
    state0 = init_train_state(jax.random.PRNGKey(5), gcfg, dcfg, tc)
    rs = np.random.RandomState(1)
    reals = tuple(jnp.asarray(rs.randn(4, 8, 8, 1).astype(np.float32))
                  for _ in range(k))
    labels = tuple(jnp.asarray(rs.randint(0, 3, 4)) for _ in range(k))
    alphas = np.ones(k, np.float32)

    steps = {}
    ref_state = jax.tree.map(jnp.copy, state0)
    for j in range(k):
        apply_gp = j % 2 == 0
        if apply_gp not in steps:
            steps[apply_gp] = make_train_step(
                gcfg, dcfg, tc, step=1, fading=False, apply_gp=apply_gp,
                augment_cfg=aug, ada_cfg=ada, donate=False)
        ref_state, _ = steps[apply_gp](ref_state, reals[j], labels[j],
                                       jnp.float32(1.0))

    multi = make_train_multi_step(gcfg, dcfg, tc, step=1, fading=False,
                                  k=k, augment_cfg=aug, ada_cfg=ada,
                                  donate=False)
    out_state, msum = multi(state0, reals, labels, jnp.asarray(alphas))
    np.testing.assert_allclose(np.asarray(out_state["ada"]["p"]),
                               np.asarray(ref_state["ada"]["p"]),
                               rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7),
        jax.device_get(ref_state["g"]), jax.device_get(out_state["g"]))
    assert int(out_state["iteration"]) == k

    # constraint validation
    with pytest.raises(ValueError):
        make_train_multi_step(gcfg, dcfg, tc, step=1, fading=False, k=3)
    with pytest.raises(ValueError):
        make_train_multi_step(gcfg, dcfg, TrainConfig(n_critic=2),
                              step=1, fading=False, k=2)


@pytest.mark.slow
def test_sharded_multi_step_scan_matches_single_device():
    """The scanned dispatch under GSPMD data parallelism: a k-window on the
    8-device mesh (each batch sharded, state replicated) matches the same
    window on one device — the loop allows steps_per_call with use_mesh."""
    from pgx.parallel import make_mesh, replicate, shard_batch
    from pgx.train import make_train_multi_step

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = TrainConfig()
    k = 3
    state = init_train_state(jax.random.PRNGKey(7), gcfg, dcfg, tc)
    rs = np.random.RandomState(2)
    reals_np = [rs.randn(16, 8, 8, 1).astype(np.float32) for _ in range(k)]
    alphas = jnp.ones((k,), jnp.float32)

    mfn = make_train_multi_step(gcfg, dcfg, tc, step=1, fading=False,
                                k=k, donate=False)
    s_single, m_single = mfn(state, tuple(map(jnp.asarray, reals_np)),
                             None, alphas)

    mesh = make_mesh()
    s_shard = replicate(mesh, state)
    reals_sh = tuple(shard_batch(mesh, r) for r in reals_np)
    s_shard, m_shard = mfn(s_shard, reals_sh, None, alphas)

    np.testing.assert_allclose(float(m_single["d_total"]),
                               float(m_shard["d_total"]), rtol=1e-5)
    for part in ("g", "d", "g_ema"):
        for a, b in zip(jax.tree.leaves(s_single[part]),
                        jax.tree.leaves(s_shard[part])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_fused_g_matches_joint_gradient_identity():
    """TrainConfig.fused_g (FusedProp, arXiv:2004.03335): the D update must
    be identical to the alternating step (the fake term's value and pd
    gradient don't change when fake carries G-gradients), and the G update
    must equal Adam applied to grad of -mean(D_old(G(z))) — i.e. the
    alternating G step evaluated against the PRE-update D."""
    import dataclasses

    import optax

    from pgx.models.discriminator import discriminator_apply
    from pgx.models.generator import generator_apply
    from pgx.train.wgan import make_optimizer

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = TrainConfig()
    tc_fused = dataclasses.replace(tc, fused_g=True)
    state = init_train_state(jax.random.PRNGKey(7), gcfg, dcfg, tc)
    real = jnp.asarray(
        np.random.RandomState(3).randn(8, 8, 8, 1).astype(np.float32))

    fn_alt = make_train_step(gcfg, dcfg, tc, step=1, fading=False,
                             donate=False)
    fn_fus = make_train_step(gcfg, dcfg, tc_fused, step=1, fading=False,
                             donate=False)
    s_alt, m_alt = fn_alt(state, real, None, jnp.float32(1.0))
    s_fus, m_fus = fn_fus(state, real, None, jnp.float32(1.0))

    # D path identical (losses and updated params)
    np.testing.assert_allclose(float(m_alt["d_total"]),
                               float(m_fus["d_total"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_alt["d"]), jax.tree.leaves(s_fus["d"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # G update: reproduce the step's own z draw (white-box: the step splits
    # its rng 6 ways and takes the second key for z)
    _, kz, *_ = jax.random.split(state["rng"], 6)
    z = jax.random.normal(kz, (8, gcfg.z_dim), jnp.float32)
    alpha = jnp.float32(1.0)

    def g_loss_fn(pg):
        imgs = generator_apply(pg, gcfg, z, None, step=1, alpha=alpha,
                               fading=False)
        return -jnp.mean(discriminator_apply(
            state["d"], dcfg, imgs, None, step=1, alpha=alpha,
            fading=False).reshape(-1))

    g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state["g"])
    opt = make_optimizer(tc)
    upd, _ = opt.update(g_grads, state["opt_g"], state["g"])
    want_g = optax.apply_updates(state["g"], upd)

    np.testing.assert_allclose(float(m_fus["g_loss"]), float(g_loss),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(want_g), jax.tree.leaves(s_fus["g"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    # and it differs from the alternating G (which uses the updated D)
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree.leaves(s_alt["g"]),
                             jax.tree.leaves(s_fus["g"]))]
    assert max(diffs) > 0.0


def test_fused_g_sharded_matches_single_device():
    """fused_g under GSPMD data parallelism: the joint two-network gradient
    reduces over the global batch the same way the separate passes do."""
    import dataclasses

    from pgx.parallel import make_mesh, replicate, shard_batch

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = dataclasses.replace(TrainConfig(), fused_g=True)
    state = init_train_state(jax.random.PRNGKey(9), gcfg, dcfg, tc)
    real = np.random.RandomState(6).randn(16, 8, 8, 1).astype(np.float32)

    fn = make_train_step(gcfg, dcfg, tc, step=1, fading=False, donate=False)
    s_single, m_single = fn(state, jnp.asarray(real), None, jnp.float32(1.0))

    mesh = make_mesh()
    s_shard, m_shard = fn(replicate(mesh, state), shard_batch(mesh, real),
                          None, jnp.float32(1.0))

    np.testing.assert_allclose(float(m_single["d_total"]),
                               float(m_shard["d_total"]), rtol=1e-5)
    for part in ("g", "d", "g_ema"):
        for a, b in zip(jax.tree.leaves(s_single[part]),
                        jax.tree.leaves(s_shard[part])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_slice_stddev_equals_separate_calls():
    """The d_concat premise: a 3B concatenated D forward with per-slice
    minibatch stddev (stddev_groups=3) scores each B-slice EXACTLY as
    three separate B-batch forwards — per-slice stddev is the only
    cross-sample op, so there is no cross-slice coupling.  f64 to within
    reassociation noise: XLA tiles the 3B conv differently than the B
    conv, so identical math lands within an ulp, not bitwise."""
    from pgx.models import init_discriminator
    from pgx.models.discriminator import discriminator_apply

    dcfg = zoo.correct_discriminator(feat_dim=8, dtype="float64")
    params = init_discriminator(jax.random.PRNGKey(2), dcfg)
    rng = np.random.RandomState(0)
    slices = [jnp.asarray(rng.randn(4, 16, 16, 3)) for _ in range(3)]
    alpha = jnp.asarray(0.6, jnp.float64)

    sep = jnp.concatenate([
        discriminator_apply(params, dcfg, s, step=3, alpha=alpha,
                            fading=True).reshape(-1) for s in slices])
    cat = discriminator_apply(params, dcfg, jnp.concatenate(slices),
                              step=3, alpha=alpha, fading=True,
                              stddev_groups=3).reshape(-1)
    np.testing.assert_allclose(np.asarray(sep), np.asarray(cat),
                               rtol=1e-12, atol=1e-14)


def test_d_concat_step_matches_plain_step():
    """TrainConfig.d_concat (batched 3B D dispatch) is a dispatch-shape
    change, not a math change: the full train step matches the separate
    three-call form at f64 — fade phase, conditional labels, and the
    lazy-GP 2B variant included."""
    import dataclasses

    gcfg = zoo.mnist_conditional_generator(z_dim=8, channel=8,
                                           num_classes=3, dtype="float64")
    dcfg = zoo.mnist_conditional_discriminator_wgangp(
        feat_dim=8, num_classes=3, dtype="float64")
    real = jnp.asarray(np.random.RandomState(1).randn(6, 16, 16, 1))
    labels = jnp.asarray(np.arange(6) % 3)
    alpha = jnp.asarray(0.7, jnp.float64)

    state0 = init_train_state(
        jax.random.PRNGKey(3), gcfg, dcfg, TrainConfig())
    outs = {}
    for key, dcat in [("plain", False), ("concat", True)]:
        tc = dataclasses.replace(TrainConfig(), gp_every=2, d_concat=dcat)
        for gp in (True, False):     # GP iteration (3B) + lazy skip (2B)
            fn = make_train_step(gcfg, dcfg, tc, step=2, fading=True,
                                 apply_gp=gp, donate=False)
            # both variants step from the SAME state0: one-step parity,
            # not two-step chaos amplification
            s, m = fn(jax.tree.map(jnp.copy, state0), real, labels, alpha)
            outs[(key, gp)] = (jax.device_get(s), jax.device_get(m))

    # identical math: the bitwise-level guarantee lives in
    # test_slice_stddev_equals_separate_calls; here the differently-tiled
    # 3B convs reassociate, and the resulting (sub-1e-6-absolute) gradient
    # ulps land raw in the first-step Adam moments (mu = g at beta1=0), so
    # the tree comparison is atol-dominated for the near-zero moment leaves
    for gp in (True, False):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b, np.float64),
                rtol=1e-5, atol=1e-6),
            outs[("plain", gp)], outs[("concat", gp)])

    with pytest.raises(ValueError, match="d_concat"):
        TrainConfig(d_concat=True, gp_mode="jvp")
    with pytest.raises(ValueError, match="d_concat"):
        TrainConfig(d_concat=True, fused_g=True)


def test_n_critic_2_matches_reference_two_iteration_sequence():
    """n_critic=2 oracle (VERDICT r4 next #2): a two-iteration sequence —
    iteration 1 D-only (no G update, no EMA advance), iteration 2 D+G+EMA —
    matches the torch reference loop's cadence (train.py:157-169) at the
    existing rtol, and the D-only step provably leaves g / g_ema
    bit-identical."""
    pm, _ = oracle.load_reference_modules()
    torch.manual_seed(11)
    G = pm.CorrectGenerator(input_code_dim=8, in_channel=8).double()
    D = pm.CorrectDiscriminator(feat_dim=8).double()
    g_ema = pm.CorrectGenerator(input_code_dim=8, in_channel=8).double()
    g_ema.load_state_dict(G.state_dict())

    gcfg = zoo.correct_generator(z_dim=8, channel=8, dtype="float64")
    dcfg = zoo.correct_discriminator(feat_dim=8, dtype="float64")
    tc = TrainConfig(n_critic=2)

    state = init_train_state(jax.random.PRNGKey(21), gcfg, dcfg, tc)
    state["g"] = oracle.generator_params_from_torch(G, gcfg)
    state["d"] = oracle.discriminator_params_from_torch(D, dcfg)
    state["g_ema"] = jax.tree.map(jnp.copy, state["g"])
    from pgx.train.wgan import make_optimizer
    state["opt_g"] = make_optimizer(tc).init(state["g"])
    state["opt_d"] = make_optimizer(tc).init(state["d"])

    step, alpha, fading = 2, 0.7, True
    res = 4 * 2 ** (step - 1)
    rng_np = np.random.RandomState(13)
    reals = [rng_np.randn(4, res, res, 3) for _ in range(2)]

    # replicate the step's internal rng stream across both iterations
    # (each step splits its rng 6 ways; the first output threads forward)
    rng1, kz0, keps0, *_ = jax.random.split(state["rng"], 6)
    _, kz1, keps1, *_ = jax.random.split(rng1, 6)
    zs = [np.asarray(jax.random.normal(k, (4, gcfg.z_dim), jnp.float32),
                     dtype=np.float64) for k in (kz0, kz1)]
    epss = [np.asarray(jax.random.uniform(k, (4, 1, 1, 1), jnp.float64))
            for k in (keps0, keps1)]

    step_d = make_train_step(gcfg, dcfg, tc, step=step, fading=fading,
                             update_g=False, donate=False)
    step_gd = make_train_step(gcfg, dcfg, tc, step=step, fading=fading,
                              update_g=True, donate=False)

    alpha_j = jnp.asarray(alpha, jnp.float64)
    s1, m1 = step_d(state, jnp.asarray(reals[0]), None, alpha_j)
    # the D-only iteration must leave G, EMA, and opt_g untouched — bitwise
    for part in ("g", "g_ema", "opt_g"):
        for a, b in zip(jax.tree.leaves(state[part]),
                        jax.tree.leaves(s1[part])):
            assert np.array_equal(np.asarray(a), np.asarray(b)), part
    assert float(m1["g_loss"]) == 0.0
    assert int(s1["iteration"]) == 1

    s2, m2 = step_gd(s1, jnp.asarray(reals[1]), None, alpha_j)

    opt_g = torch.optim.Adam(G.parameters(), lr=1e-3, betas=(0.0, 0.99))
    opt_d = torch.optim.Adam(D.parameters(), lr=1e-3, betas=(0.0, 0.99))
    wants = []
    for j, update_g in enumerate([False, True]):
        wants.append(_torch_reference_iteration(
            G, D, g_ema, opt_g, opt_d,
            torch.from_numpy(reals[j]).permute(0, 3, 1, 2),
            torch.from_numpy(zs[j]), torch.from_numpy(epss[j]),
            step, alpha, update_g=update_g))

    for m, want in [(m1, wants[0]), (m2, wants[1])]:
        np.testing.assert_allclose(float(m["d_loss"]), want["d_loss"],
                                   rtol=1e-8)
        np.testing.assert_allclose(float(m["grad_penalty"]),
                                   want["grad_penalty"], rtol=1e-8)
        np.testing.assert_allclose(float(m["g_loss"]), want["g_loss"],
                                   rtol=1e-8)

    want_g = oracle.generator_params_from_torch(G, gcfg)
    want_d = oracle.discriminator_params_from_torch(D, dcfg)
    want_ema = oracle.generator_params_from_torch(g_ema, gcfg)
    for name, ours, theirs in [("g", s2["g"], want_g),
                               ("d", s2["d"], want_d),
                               ("g_ema", s2["g_ema"], want_ema)]:
        for a, b in zip(jax.tree.leaves(ours), jax.tree.leaves(theirs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-7, atol=1e-10,
                                       err_msg=f"mismatch in {name}")


def test_n_critic_cadence_through_train_loop(tmp_path):
    """e2e: train_loop with n_critic=2 drives the D-only/D+G alternation —
    g_loss is exactly 0 on D-only iterations (i+1 odd) and the EMA tree
    advances only on G iterations (train.py:157-169 cadence)."""
    from pgx.data import synthetic_dataset
    from pgx.train import LegacySchedule
    from pgx.train.loop import LoopConfig, train_loop

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = TrainConfig(n_critic=2)
    schedule = LegacySchedule(8, 1, 1)
    dataset = synthetic_dataset(n=32, size=8, channels=1, seed=0)
    loop_cfg = LoopConfig(trial_name="ncritic", main_path=str(tmp_path),
                          batch_size=8, sample_every=100,
                          checkpoint_every=100, log_every=2,
                          total_iterations=4, verbose=False)

    seen = []

    def on_iteration(i, st, state, metrics):
        seen.append((i, float(metrics["g_loss"]),
                     [np.asarray(a).copy()
                      for a in jax.tree.leaves(state["g_ema"])]))

    trial_dir = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg,
                           hooks={"on_iteration": on_iteration})

    # run-recipe artifacts (ADVICE r4): the trial config records the
    # augmentation recipe (None here) and timing.json logs wall clock
    import json
    from pgx import checkpoint as ckpt
    cfg_json = ckpt.load_config(trial_dir)
    assert "augment" in cfg_json and cfg_json["augment"] is None
    with open(os.path.join(trial_dir, "timing.json")) as f:
        timing = json.load(f)
    assert timing and all(v["elapsed_s"] >= 0 and v["img_s"] > 0
                          for v in timing.values())

    assert [i for i, _, _ in seen] == [0, 1, 2, 3]
    g_losses = [gl for _, gl, _ in seen]
    assert g_losses[0] == 0.0 and g_losses[2] == 0.0   # D-only iterations
    assert g_losses[1] != 0.0 and g_losses[3] != 0.0   # G updated
    emas = [e for _, _, e in seen]
    # EMA advances at i=1 and i=3 only: snapshot after the D-only i=2
    # iteration is bit-identical to the one after i=1
    assert all(np.array_equal(a, b) for a, b in zip(emas[1], emas[2]))
    assert not all(np.array_equal(a, b) for a, b in zip(emas[0], emas[1]))
    assert not all(np.array_equal(a, b) for a, b in zip(emas[2], emas[3]))


def test_resume_augment_recipe_drift_warning(tmp_path):
    """The saved augmentation recipe comes back from JSON with tuples as
    lists; resuming with IDENTICAL settings must not warn (observed false
    positive: bgc_config's imgfilter_bands tuple vs the loaded list),
    while genuinely dropping the augmentation must."""
    import dataclasses
    import warnings

    from pgx.augment import AdaConfig, bgc_config
    from pgx.data import synthetic_dataset
    from pgx.train import LegacySchedule
    from pgx.train.loop import LoopConfig, train_loop

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = TrainConfig()
    schedule = LegacySchedule(8, 1, 1)
    dataset = synthetic_dataset(n=32, size=8, channels=1, seed=0)
    aug, ada = bgc_config(), AdaConfig(ada_length=100)
    lc = LoopConfig(trial_name="adarec", main_path=str(tmp_path),
                    batch_size=8, sample_every=100, checkpoint_every=2,
                    log_every=100, total_iterations=2, verbose=False)

    trial = train_loop(gcfg, dcfg, tc, schedule, dataset, lc,
                       augment_cfg=aug, ada_cfg=ada)

    # identical recipe -> silent resume
    lc2 = dataclasses.replace(lc, total_iterations=4)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        train_loop(gcfg, dcfg, tc, schedule, dataset, lc2,
                   resume_dir=trial, augment_cfg=aug, ada_cfg=ada)

    # dropping augmentation on resume -> loud drift warning
    lc3 = dataclasses.replace(lc, total_iterations=6)
    with pytest.warns(RuntimeWarning, match="augmentation settings"):
        train_loop(gcfg, dcfg, tc, schedule, dataset, lc3,
                   resume_dir=trial)


def test_fused_g_multi_step_scan_matches_singles():
    """fused_g composes with the scanned dispatch: k scanned fused
    iterations == k single fused dispatches (with ADA + gp_every to cover
    the full production surface)."""
    import dataclasses

    from pgx.augment import AdaConfig, bgc_config
    from pgx.train import make_train_multi_step

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = dataclasses.replace(TrainConfig(), fused_g=True, gp_every=2)
    k = 4
    acfg, ada = bgc_config(), AdaConfig(ada_length=100)
    state0 = init_train_state(jax.random.PRNGKey(4), gcfg, dcfg, tc)
    rs = np.random.RandomState(1)
    reals = tuple(jnp.asarray(rs.randn(4, 8, 8, 1).astype(np.float32))
                  for _ in range(k))
    alphas = jnp.ones((k,), jnp.float32)

    fns = {gp: make_train_step(gcfg, dcfg, tc, step=1, fading=False,
                               apply_gp=gp, augment_cfg=acfg, ada_cfg=ada,
                               donate=False)
           for gp in (True, False)}
    ref = jax.tree.map(jnp.copy, state0)
    for i in range(k):
        ref, _ = fns[i % tc.gp_every == 0](ref, reals[i], None, alphas[i])

    multi = make_train_multi_step(gcfg, dcfg, tc, step=1, fading=False,
                                  k=k, augment_cfg=acfg, ada_cfg=ada,
                                  donate=False)
    out, msum = multi(state0, reals, None, alphas)

    assert int(out["iteration"]) == k
    for part in ("g", "d", "g_ema"):
        for a, b in zip(jax.tree.leaves(ref[part]),
                        jax.tree.leaves(out[part])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=1e-7,
                                       err_msg=part)
    np.testing.assert_allclose(float(ref["ada"]["p"]),
                               float(out["ada"]["p"]), atol=1e-7)
