"""Model-axis parallelism (pgx/parallel/tp.py): tensor-parallel channel
sharding and spatial (H) sharding on a 2-D (data, model) mesh.

The contract under test is the same one the data-parallel tests pin
(SURVEY.md section 2.8): GSPMD sharding is SEMANTICS-PRESERVING — a
channel- or spatially-sharded train step produces the same updated params
and metrics as the single-device run, to dtype tolerance.  These runs use
the full production recipe (bf16 + ADA controller + lazy GP + remat), the
configuration that exercises the augment pipe, the controller's batch
reduction, and the GP double-backward under partitioning.
"""

import dataclasses
import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgx.models import zoo
from pgx.parallel import (make_mesh_2d, make_mesh_2d_for_batch, replicate,
                          shard_batch, shard_state, spatial_batch_sharding,
                          state_shardings)
from pgx.train import TrainConfig, init_train_state, make_train_step


def _production_setup(key=11, channel=16):
    gcfg = zoo.mnist_conditional_generator(z_dim=16, channel=channel,
                                           num_classes=4, dtype="bfloat16")
    dcfg = zoo.mnist_conditional_discriminator_wgangp(feat_dim=channel,
                                                      num_classes=4,
                                                      dtype="bfloat16")
    tc = dataclasses.replace(TrainConfig(), gp_every=2, remat=True)
    state = init_train_state(jax.random.PRNGKey(key), gcfg, dcfg, tc)
    real = np.random.RandomState(3).randn(16, 16, 16, 1).astype(np.float32)
    labels = (np.arange(16) % 4).astype(np.int64)
    return gcfg, dcfg, tc, state, real, labels


def _run_cycle(gcfg, dcfg, tc, state, real, labels, alpha=0.5):
    from pgx.augment import AdaConfig, bgc_config
    fns = {gp: make_train_step(gcfg, dcfg, tc, step=2, fading=True,
                               apply_gp=gp, augment_cfg=bgc_config(),
                               ada_cfg=AdaConfig(ada_length=100),
                               donate=False)
           for gp in (True, False)}
    metrics = None
    for i in range(2):
        state, metrics = fns[i % tc.gp_every == 0](
            state, real, labels, jnp.float32(alpha))
    return state, metrics


def _assert_state_close(sharded, single, rtol=1e-2, atol=1e-2):
    # bf16 params: one ulp at O(1) is ~0.008; reductions reorder under
    # partitioning, so exact bit-parity is not the contract
    for key in ("g", "d", "g_ema"):
        for a, b in zip(jax.tree.leaves(sharded[key]),
                        jax.tree.leaves(single[key])):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=rtol, atol=atol)
    np.testing.assert_allclose(float(sharded["ada"]["p"]),
                               float(single["ada"]["p"]), atol=1e-6)


@pytest.mark.slow
def test_tp_channels_production_recipe_matches_single_device():
    """Tensor parallelism (params channel-sharded over a 2x4 data x model
    mesh) is semantics-preserving on the full production recipe."""
    gcfg, dcfg, tc, state0, real, labels = _production_setup()

    s_single, m_single = _run_cycle(gcfg, dcfg, tc, state0, jnp.asarray(real),
                                    jnp.asarray(labels))

    mesh = make_mesh_2d(2, 4)
    s_tp = shard_state(mesh, state0)
    real_sh, labels_sh = shard_batch(mesh, real, labels)
    s_tp, m_tp = _run_cycle(gcfg, dcfg, tc, s_tp, real_sh, labels_sh)

    for k in ("d_total", "g_loss", "grad_penalty", "ada_r"):
        np.testing.assert_allclose(float(m_tp[k]), float(m_single[k]),
                                   rtol=1e-2, atol=1e-2)
    _assert_state_close(s_tp, s_single)


@pytest.mark.slow
def test_spatial_production_recipe_matches_single_device():
    """Spatial mode (images H-sharded, params replicated; GSPMD
    halo-exchange convs) is semantics-preserving on the same recipe."""
    gcfg, dcfg, tc, state0, real, labels = _production_setup(key=12)

    s_single, m_single = _run_cycle(gcfg, dcfg, tc, state0, jnp.asarray(real),
                                    jnp.asarray(labels))

    mesh = make_mesh_2d(4, 2)
    s_sp = replicate(mesh, state0)
    real_sh = jax.device_put(real, spatial_batch_sharding(mesh))
    labels_sh = shard_batch(mesh, labels)
    s_sp, m_sp = _run_cycle(gcfg, dcfg, tc, s_sp, real_sh, labels_sh)

    for k in ("d_total", "g_loss", "grad_penalty", "ada_r"):
        np.testing.assert_allclose(float(m_sp[k]), float(m_single[k]),
                                   rtol=1e-2, atol=1e-2)
    _assert_state_close(s_sp, s_single)


def test_state_shardings_rules():
    """Channel rule: float leaves with a model-divisible trailing dim shard
    on it; RNG keys, counters, scalars and indivisible dims replicate —
    and the placed shards actually have 1/n_model of the trailing dim."""
    gcfg, dcfg, tc, state, _, _ = _production_setup(channel=16)
    mesh = make_mesh_2d(2, 4)
    shs = state_shardings(state, mesh)

    def spec(path):
        node = shs
        for k in path:
            node = node[k]
        return node.spec

    # conv HWIO kernel + bias: sharded on C_out
    assert spec(("g", "blocks", "8", "conv1", "w"))[-1] == "model"
    assert spec(("g", "blocks", "8", "conv1", "b"))[-1] == "model"
    # to_rgb head: C_out == img_channels == 1, indivisible -> replicated
    assert all(s is None for s in spec(("g", "to_rgb", "8", "w")))
    # integer leaves replicated
    assert shs["rng"].spec == jax.sharding.PartitionSpec()
    assert shs["iteration"].spec == jax.sharding.PartitionSpec()

    placed = shard_state(mesh, state)
    w = placed["g"]["blocks"]["8"]["conv1"]["w"]
    assert w.addressable_shards[0].data.shape[-1] == w.shape[-1] // 4
    assert placed["rng"].addressable_shards[0].data.shape == \
        state["rng"].shape

    # Adam moments follow their params (same shapes, same rule)
    mu_w = jax.tree.leaves(
        state_shardings(state["opt_g"], mesh),
        is_leaf=lambda x: hasattr(x, "spec"))
    assert any(getattr(s, "spec", None)
               and s.spec and s.spec[-1] == "model" for s in mu_w)


def test_make_mesh_2d_for_batch():
    mesh = make_mesh_2d_for_batch(16, 2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 2}

    # batch 3 with 4 devices per model shard -> data drops to 3 (largest
    # divisor of the batch), 2 devices idle, warns
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh = make_mesh_2d_for_batch(3, 2)
    assert mesh.devices.shape == (3, 2)
    assert any("not divisible" in str(x.message) for x in w)

    with pytest.raises(ValueError, match="does not divide"):
        make_mesh_2d_for_batch(8, 3)


def test_make_mesh_2d_for_batch_multihost_refuses_drop(monkeypatch):
    """Dropping devices to fit the batch is a single-host convenience only:
    in a multi-host run it can exclude another host's chips entirely and
    every process must enter every jitted step, so it must raise."""
    import pgx.parallel.tp as tp
    monkeypatch.setattr(tp.jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="multi-host"):
        make_mesh_2d_for_batch(3, 2)
    # exact fits are still fine
    mesh = make_mesh_2d_for_batch(16, 2)
    assert mesh.devices.shape == (4, 2)


@pytest.mark.slow
def test_train_loop_model_parallel_e2e(tmp_path):
    """End-to-end: train_loop with --model-parallel 2 (channels) runs the
    loop machinery — 2-D mesh, sharded state, prefetcher, sample grid,
    checkpoint save of the sharded state — and the saved params round-trip
    to host intact."""
    from pgx import checkpoint as ckpt
    from pgx.data import synthetic_dataset
    from pgx.train import LegacySchedule
    from pgx.train.loop import LoopConfig, train_loop

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = TrainConfig()
    schedule = LegacySchedule(6, 1, 1)
    ds = synthetic_dataset(n=32, size=16, channels=1, seed=0)
    loop_cfg = LoopConfig(trial_name="tp_e2e", main_path=str(tmp_path),
                          batch_size=8, sample_every=100, log_every=100,
                          checkpoint_every=100, total_iterations=6,
                          model_parallel=2, snapshot_sources=False,
                          verbose=False)
    trial_dir = train_loop(gcfg, dcfg, tc, schedule, ds, loop_cfg)

    gpath = ckpt.latest_checkpoint(trial_dir, "g")
    assert gpath is not None
    params = ckpt.load_params(gpath)
    host = init_train_state(jax.random.PRNGKey(0), gcfg, dcfg, tc)["g"]
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(host)):
        assert np.asarray(a).shape == np.asarray(b).shape
        assert np.all(np.isfinite(np.asarray(a, np.float32)))

    # resume the sharded trial: restore -> re-shard -> 6 more iterations
    loop_cfg2 = dataclasses.replace(loop_cfg, total_iterations=12)
    trial2 = train_loop(gcfg, dcfg, tc, schedule, ds, loop_cfg2,
                        resume_dir=trial_dir)
    assert trial2 == trial_dir
    g2 = ckpt.latest_checkpoint(trial_dir, "g")
    assert ckpt.checkpoint_iteration(g2) == 12


@pytest.mark.slow
def test_train_loop_spatial_e2e(tmp_path):
    """End-to-end: spatial mode through the loop — the prefetcher's
    H-sharded image placement across a stage switch, and the low-res
    fallback (H smaller than the model axis shards batch-only instead of
    crashing device_put)."""
    from pgx import checkpoint as ckpt
    from pgx.data import synthetic_dataset
    from pgx.train import LegacySchedule
    from pgx.train.loop import LoopConfig, train_loop

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = TrainConfig()
    schedule = LegacySchedule(12, 2, 1)   # 8px -> 16px stage switch
    ds = synthetic_dataset(n=32, size=16, channels=1, seed=0)
    loop_cfg = LoopConfig(trial_name="sp_e2e", main_path=str(tmp_path),
                          batch_size=8, sample_every=100, log_every=100,
                          checkpoint_every=100, total_iterations=12,
                          model_parallel=2, model_parallel_mode="spatial",
                          snapshot_sources=False, verbose=False)
    trial_dir = train_loop(gcfg, dcfg, tc, schedule, ds, loop_cfg)
    gpath = ckpt.latest_checkpoint(trial_dir, "g")
    assert ckpt.checkpoint_iteration(gpath) == 12


def test_use_spatial_sharding_gate():
    """The loop's per-stage spatial gate: stages shorter than the model
    axis fall back to batch-only sharding (4px with 8 model shards would
    otherwise crash device_put)."""
    from pgx.parallel.tp import use_spatial_sharding
    assert use_spatial_sharding(8, 2)
    assert use_spatial_sharding(1024, 8)
    assert not use_spatial_sharding(4, 8)
    assert not use_spatial_sharding(4, 16)


def test_make_mesh_for_batch_multihost_refuses_drop(monkeypatch):
    """Same contract as the 2-D mesh: a multi-host run must not silently
    shrink the mesh to a device prefix (uneven per-host device counts
    break per-host batch assembly)."""
    import pgx.parallel.mesh as mesh_mod
    from pgx.parallel import make_mesh_for_batch

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="multi-host"):
        make_mesh_for_batch(12)          # 8 virtual devices, 12 % 8 != 0
    assert make_mesh_for_batch(16).devices.size == 8
