"""Serving subsystem: dynamic batching, HTTP endpoints, hot reload.

The reference has no serving path (sampling only inside train.py's loop);
pgx.serve is the deployment front end over make_eval_generate.  These
tests drive it end-to-end on a tiny trained trial: request coalescing,
PNG/npz HTTP responses, checkpoint hot-swap, and determinism.
"""

import http.client
import json
import os
import threading

import numpy as np
import pytest

from pgx.serve import GeneratorService, make_http_server, _bucket


@pytest.fixture(scope="module")
def tiny_trial(tmp_path_factory):
    """A 12-iteration conditional mnist-family trial (2 checkpoints)."""
    from pgx.data import synthetic_dataset
    from pgx.models import zoo
    from pgx.train import LegacySchedule, TrainConfig
    from pgx.train.loop import LoopConfig, train_loop

    tmp = tmp_path_factory.mktemp("serve")
    gcfg = zoo.mnist_conditional_generator(z_dim=8, num_classes=3, channel=8)
    dcfg = zoo.mnist_conditional_discriminator_wgangp(feat_dim=8,
                                                      num_classes=3)
    schedule = LegacySchedule(8, 2, 1)
    dataset = synthetic_dataset(n=24, size=16, channels=1, num_classes=3,
                                seed=0)
    loop_cfg = LoopConfig(trial_name="servetrial", main_path=str(tmp),
                          batch_size=4, sample_every=100,
                          checkpoint_every=6, log_every=100, verbose=False,
                          total_iterations=12)
    return train_loop(gcfg, dcfg, TrainConfig(), schedule, dataset,
                      loop_cfg)


def test_bucket():
    assert [_bucket(n, 64) for n in (1, 2, 3, 5, 33, 64)] == \
        [1, 2, 4, 8, 64, 64]
    # oversized direct submits still land on power-of-two buckets, never
    # an exact ragged size (bounded executable set)
    assert [_bucket(n, 64) for n in (65, 100, 128, 129)] == \
        [128, 128, 128, 256]


def test_generate_deterministic_and_shaped(tiny_trial):
    svc = GeneratorService(tiny_trial, max_batch=8, max_wait_ms=1.0)
    try:
        a = svc.generate_images(5, seed=7)
        b = svc.generate_images(5, seed=7)
        res = svc.stats()["resolution"]
        assert a.shape == (5, res, res, 1)
        np.testing.assert_array_equal(a, b)
        # explicit per-sample labels and a fixed class both work
        c = svc.generate_images(3, labels=[0, 1, 2], seed=1)
        d = svc.generate_images(3, class_id=2, seed=1)
        assert c.shape == d.shape == (3, res, res, 1)
        # same z, different labels -> different images
        assert not np.array_equal(c, d)
    finally:
        svc.close()


def test_padding_does_not_change_results(tiny_trial):
    """A lone batch-3 request runs padded to the 4-bucket; results must
    equal an exact-bucket run image-for-image."""
    svc = GeneratorService(tiny_trial, max_batch=4, max_wait_ms=1.0)
    try:
        rng = np.random.RandomState(0)
        z = rng.randn(4, 8).astype(np.float32)
        labels = np.array([0, 1, 2, 0], np.int32)
        full = svc.submit(z, labels).result(timeout=60)
        part = svc.submit(z[:3], labels[:3]).result(timeout=60)
        np.testing.assert_array_equal(part, full[:3])
    finally:
        svc.close()


def test_on_device_uint8_matches_host_quantization(tiny_trial):
    """The serving default (output='uint8', quantized on device) must be
    bit-identical to fetching floats and quantizing with png.to_uint8."""
    from pgx.utils.png import to_uint8
    svc_u8 = GeneratorService(tiny_trial, max_batch=4, max_wait_ms=1.0)
    svc_f = GeneratorService(tiny_trial, max_batch=4, max_wait_ms=1.0,
                             output="float")
    try:
        a = svc_u8.generate_images(4, class_id=1, seed=11)
        b = svc_f.generate_images(4, class_id=1, seed=11)
        assert a.dtype == np.uint8 and b.dtype == np.float32
        np.testing.assert_array_equal(a, to_uint8(b))
    finally:
        svc_u8.close()
        svc_f.close()


def test_dynamic_batching_coalesces(tiny_trial):
    svc = GeneratorService(tiny_trial, max_batch=16, max_wait_ms=200.0)
    try:
        svc.warmup(sizes=(8,))
        base = svc.stats()
        futs = [svc.submit(np.random.RandomState(i).randn(1, 8),
                           np.array([i % 3]))
                for i in range(8)]
        outs = [f.result(timeout=60) for f in futs]
        assert all(o.shape[0] == 1 for o in outs)
        s = svc.stats()
        # 8 single-image requests coalesced into far fewer device batches
        assert s["batches"] - base["batches"] < 8
        assert s["requests"] - base["requests"] == 8
        assert s["images"] - base["images"] == 8
    finally:
        svc.close()


def test_conditional_requires_labels(tiny_trial):
    svc = GeneratorService(tiny_trial, max_batch=4, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError):
            svc.submit(np.zeros((2, 8), np.float32))
        with pytest.raises(ValueError):
            svc.generate_images(2, labels=[0])   # wrong length
        with pytest.raises(ValueError):
            svc.generate_images(0)               # clean error, not concat
    finally:
        svc.close()


def test_submit_validates_request_shapes(tiny_trial):
    """A malformed request must fail at submit() — alone — not ride into a
    coalesced batch where its trace-time error would fail every concurrent
    client's future (and odd z widths would mint executables outside the
    power-of-two bucket set)."""
    svc = GeneratorService(tiny_trial, max_batch=4, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="z must"):
            svc.submit(np.zeros((2, 5), np.float32), np.array([0, 1]))
        with pytest.raises(ValueError, match="z must"):
            svc.submit(np.zeros((8,), np.float32), np.array([0]))
        with pytest.raises(ValueError, match="at least one"):
            svc.submit(np.zeros((0, 8), np.float32),
                       np.zeros(0, np.int32))
        with pytest.raises(ValueError, match="labels"):
            svc.submit(np.zeros((2, 8), np.float32), np.array([0]))
        with pytest.raises(ValueError, match="labels"):
            svc.submit(np.zeros((2, 8), np.float32), np.array([0, 99]))
        # a well-formed request still succeeds after the rejects
        out = svc.submit(np.zeros((2, 8), np.float32),
                         np.array([0, 1])).result(timeout=120)
        assert out.shape[0] == 2
    finally:
        svc.close()


def test_batcher_never_exceeds_max_batch(tiny_trial):
    """Coalescing stops BEFORE overflowing max_batch: two size-3 requests
    with max_batch=4 must run as two device batches (a batch of 6 would
    compile a fresh ragged executable and can exceed the memory ceiling
    max_batch was chosen for)."""
    svc = GeneratorService(tiny_trial, max_batch=4, max_wait_ms=150.0)
    try:
        svc.warmup(sizes=(4,))
        base = svc.stats()["batches"]
        futs = [svc.submit(np.random.RandomState(i).randn(3, 8),
                           np.array([0, 1, 2])) for i in range(2)]
        outs = [f.result(timeout=60) for f in futs]
        assert all(o.shape[0] == 3 for o in outs)
        assert svc.stats()["batches"] - base == 2
    finally:
        svc.close()


def test_submit_after_close_fails_fast(tiny_trial):
    svc = GeneratorService(tiny_trial, max_batch=4, max_wait_ms=1.0)
    svc.generate_images(1, class_id=0, seed=0)
    svc.close()
    with pytest.raises(RuntimeError, match="closed"):
        svc.submit(np.zeros((1, 8), np.float32), np.array([0]))


def test_batch_resolves_inline_after_resolver_shutdown(tiny_trial):
    """If close() abandons the batcher join (first-use compiles routinely
    exceed the 10s timeout) and shuts the fetch pool, a batch the batcher
    dispatches afterwards must still resolve — inline — instead of dying
    on 'cannot schedule new futures' and hanging its clients forever."""
    svc = GeneratorService(tiny_trial, max_batch=4, max_wait_ms=1.0)
    try:
        svc.warmup(sizes=(1,))
        svc._resolver.shutdown(wait=True)   # simulate the close() race
        out = svc.submit(np.zeros((1, 8), np.float32),
                         np.array([0])).result(timeout=120)
        assert out.shape[0] == 1
    finally:
        svc.close()


def test_hot_reload(tiny_trial):
    svc = GeneratorService(tiny_trial, max_batch=4, max_wait_ms=1.0)
    try:
        assert svc.maybe_reload() is False      # already at latest
        it0 = svc.iteration
        before = svc.generate_images(2, class_id=0, seed=3)

        # fabricate a newer checkpoint with perturbed params
        from pgx import checkpoint as ckpt
        import jax
        params = jax.tree_util.tree_map(lambda x: x + 0.05, svc.params)
        path = os.path.join(tiny_trial, "checkpoint",
                            ckpt.checkpoint_name(it0 + 6, "g"))
        ckpt.save_params(path, params)

        try:
            assert svc.maybe_reload() is True
            assert svc.iteration == it0 + 6
            after = svc.generate_images(2, class_id=0, seed=3)
            assert not np.array_equal(before, after)
            assert svc.stats()["reloads"] == 1
        finally:
            os.remove(path)       # keep the module-scoped trial pristine
    finally:
        svc.close()


def test_pinned_checkpoint_never_reloads(tiny_trial):
    svc = GeneratorService(tiny_trial, checkpoint=6, max_batch=4,
                           max_wait_ms=1.0)
    try:
        assert svc.iteration == 6
        assert svc.maybe_reload() is False
    finally:
        svc.close()


@pytest.fixture()
def http_service(tiny_trial):
    svc = GeneratorService(tiny_trial, max_batch=8, max_wait_ms=1.0)
    server = make_http_server(svc, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server.server_port, svc
    server.shutdown()
    server.server_close()
    svc.close()


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", path)
    r = conn.getresponse()
    body = r.read()
    conn.close()
    return r.status, r.getheader("Content-Type"), body


def test_http_endpoints(http_service):
    port, svc = http_service

    status, ctype, body = _get(port, "/healthz")
    health = json.loads(body)
    assert status == 200 and health["ok"] and health["resolution"] == 16

    status, ctype, body = _get(port, "/generate?num=4&seed=0&class=1")
    assert status == 200 and ctype == "image/png"
    assert body.startswith(b"\x89PNG\r\n\x1a\n")

    # POST with explicit labels, npz format: raw samples round-trip
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/generate",
                 json.dumps({"num": 3, "labels": [0, 1, 2], "seed": 5,
                             "format": "npz"}),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 200
    import io
    with np.load(io.BytesIO(r.read())) as npz:
        assert npz["images"].shape == (3, 16, 16, 1)
        np.testing.assert_array_equal(npz["labels"], [0, 1, 2])
    conn.close()

    # npz must carry the labels the SERVICE chose (class= and random),
    # not just client-supplied ones — the classes of the returned
    # conditional samples are otherwise unrecoverable
    status, ctype, body = _get(port, "/generate?num=4&class=2&format=npz")
    assert status == 200
    with np.load(io.BytesIO(body)) as npz:
        np.testing.assert_array_equal(npz["labels"], [2, 2, 2, 2])
    status, ctype, body = _get(port, "/generate?num=4&seed=9&format=npz")
    assert status == 200
    with np.load(io.BytesIO(body)) as npz:
        assert npz["labels"].shape == (4,)
        assert npz["labels"].min() >= 0 and npz["labels"].max() < 3

    status, _, body = _get(port, "/stats")
    s = json.loads(body)
    assert s["requests"] >= 2 and s["images"] >= 7

    status, _, body = _get(port, "/generate?num=0")
    assert status == 400 and b"error" in body
    status, _, _ = _get(port, "/nope")
    assert status == 404


def test_http_bad_inputs_return_400(http_service):
    """Malformed client input must come back as a JSON 400, never an
    unhandled handler exception (which closes the connection with no
    HTTP response at all)."""
    port, _ = http_service
    for path in ("/generate?num=2&nrow=abc",
                 "/generate?num=2&nrow=0",
                 "/generate?num=2&format=bmp",
                 "/generate?num=2&seed=notanint",
                 "/generate?num=notanint"):
        status, _, body = _get(port, path)
        assert status == 400 and b"error" in body, path

    # POST body that parses as JSON but isn't an object
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/generate", json.dumps([1, 2]),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    body = r.read()
    conn.close()
    assert r.status == 400 and b"error" in body


def test_http_concurrent_requests_batch(http_service):
    port, svc = http_service
    base = svc.stats()
    errs = []

    def hit(i):
        try:
            status, ctype, body = _get(port, f"/generate?num=1&seed={i}")
            assert status == 200 and body.startswith(b"\x89PNG")
        except Exception as e:    # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    s = svc.stats()
    assert s["requests"] - base["requests"] == 6
    assert s["batches"] - base["batches"] <= 6


def test_from_params_and_pipelined_resolution(tiny_trial):
    """from_params serves in-memory params (no trial dir); streaming many
    batches through the dispatch/fetch pipeline resolves every future with
    correct per-request slices."""
    from pgx import checkpoint as ckpt
    from pgx.checkpoint import configs_from_dict, load_config

    cfg = load_config(tiny_trial)
    gcfg, _, _ = configs_from_dict(cfg)
    params = ckpt.load_params(ckpt.latest_checkpoint(tiny_trial, "g"))
    svc = GeneratorService.from_params(gcfg, params, step=3,
                                       max_batch=4, max_wait_ms=0.5,
                                       fetch_threads=2)
    try:
        assert svc.maybe_reload() is False
        rng = np.random.RandomState(0)
        zs = [rng.randn(4, 8).astype(np.float32) for _ in range(6)]
        labs = [np.arange(4) % 3 for _ in range(6)]
        futs = [svc.submit(z, l) for z, l in zip(zs, labs)]
        outs = [f.result(timeout=120) for f in futs]
        res = svc.stats()["resolution"]
        assert all(o.shape == (4, res, res, 1) for o in outs)
        # each future got ITS OWN request's images: resubmitting the same z
        # must reproduce them exactly
        again = svc.submit(zs[2], labs[2]).result(timeout=120)
        np.testing.assert_array_equal(again, outs[2])
        assert svc.stats()["batches"] >= 6
    finally:
        svc.close()


def test_warmup_all_buckets(tiny_trial):
    svc = GeneratorService(tiny_trial, max_batch=8, max_wait_ms=0.5)
    try:
        base = svc.stats()["batches"]
        svc.warmup("all")               # buckets 1, 2, 4, 8
        assert svc.stats()["batches"] - base == 4
        out = svc.generate_images(3, class_id=0, seed=0)   # hits the 4-bucket
        assert out.shape[0] == 3
    finally:
        svc.close()


def test_data_parallel_serving_matches_single(tiny_trial):
    """--data-parallel N: the batch is GSPMD-sharded over N devices with
    replicated params; per-image results must be bit-identical to the
    single-device service (per-sample math only in G)."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    svc1 = GeneratorService(tiny_trial, max_batch=8, max_wait_ms=0.5)
    svc4 = GeneratorService(tiny_trial, max_batch=8, max_wait_ms=0.5,
                            data_parallel=4)
    try:
        labels = (np.arange(8) % 3).astype(np.int32)
        a = svc1.generate_images(8, labels=labels, seed=5)
        b = svc4.generate_images(8, labels=labels, seed=5)
        np.testing.assert_array_equal(a, b)
        # ragged request: 5 images pads to a mesh-divisible bucket
        c = svc1.generate_images(5, class_id=1, seed=2)
        d = svc4.generate_images(5, class_id=1, seed=2)
        np.testing.assert_array_equal(c, d)
    finally:
        svc1.close()
        svc4.close()


def test_hot_reload_under_concurrent_load(tiny_trial):
    """Checkpoint swaps while requests stream: every future resolves (old
    or new params, never an error), and the reload takes effect."""
    from pgx import checkpoint as ckpt
    import jax

    svc = GeneratorService(tiny_trial, max_batch=8, max_wait_ms=1.0,
                           fetch_threads=2)
    try:
        it0 = svc.iteration
        rng = np.random.RandomState(0)
        futs = []
        for i in range(12):
            futs.append(svc.submit(rng.randn(2, 8).astype(np.float32),
                                   np.array([i % 3, (i + 1) % 3])))
            if i == 5:   # swap params mid-stream
                params = jax.tree_util.tree_map(lambda x: x + 0.1,
                                                svc.params)
                ckpt.save_params(
                    os.path.join(tiny_trial, "checkpoint",
                                 ckpt.checkpoint_name(it0 + 6, "g")),
                    params)
                assert svc.maybe_reload() is True
        outs = [f.result(timeout=120) for f in futs]
        assert all(o.shape[0] == 2 for o in outs)
        assert svc.iteration == it0 + 6
    finally:
        svc.close()
        # restore the trial for other tests: drop the fabricated checkpoint
        os.remove(os.path.join(tiny_trial, "checkpoint",
                               ckpt.checkpoint_name(it0 + 6, "g")))


@pytest.mark.slow
def test_serve_while_training(tmp_path):
    """The --watch workflow end-to-end IN ONE PROCESS: a service attached
    to a trial that is still training hot-swaps newer checkpoints as the
    loop writes them (the serve-during-training deployment story)."""
    import glob
    import time

    from pgx import checkpoint as ckpt
    from pgx.data import synthetic_dataset
    from pgx.models import zoo
    from pgx.train import LegacySchedule, TrainConfig
    from pgx.train.loop import LoopConfig, train_loop

    gcfg = zoo.mnist_conditional_generator(z_dim=8, num_classes=3, channel=8)
    dcfg = zoo.mnist_conditional_discriminator_wgangp(feat_dim=8,
                                                      num_classes=3)
    schedule = LegacySchedule(120, 2, 1)
    dataset = synthetic_dataset(n=24, size=16, channels=1, num_classes=3,
                                seed=0)
    loop_cfg = LoopConfig(trial_name="servelive", main_path=str(tmp_path),
                          batch_size=4, sample_every=10_000,
                          checkpoint_every=30, log_every=10_000,
                          verbose=False, total_iterations=120)
    trainer = threading.Thread(
        target=lambda: train_loop(gcfg, dcfg, TrainConfig(), schedule,
                                  dataset, loop_cfg),
        daemon=True)
    trainer.start()

    # attach as soon as the trial has a config + first checkpoint
    trial = None
    deadline = time.time() + 300
    while time.time() < deadline and trial is None:
        for d in glob.glob(os.path.join(str(tmp_path), "trial_servelive*")):
            try:
                ckpt.load_config(d)
            except FileNotFoundError:
                continue
            if ckpt.latest_checkpoint(d, "g"):
                trial = d
                break
        time.sleep(0.2)
    assert trial, "training never produced a checkpoint"

    svc = GeneratorService(trial, max_batch=4, max_wait_ms=1.0,
                           watch_interval_s=0.2)
    try:
        first_it = svc.iteration
        # serve while the trainer is still writing
        mid = svc.generate_images(3, class_id=1, seed=0)
        assert mid.shape[0] == 3
        trainer.join(timeout=600)
        assert not trainer.is_alive()
        final_it = ckpt.checkpoint_iteration(
            ckpt.latest_checkpoint(trial, "g"))
        deadline = time.time() + 60
        while time.time() < deadline and svc.iteration < final_it:
            time.sleep(0.2)
        assert svc.iteration == final_it > first_it
        assert svc.stats()["reloads"] >= 1
        post = svc.generate_images(3, class_id=1, seed=0)
        assert post.shape[0] == 3
    finally:
        svc.close()
