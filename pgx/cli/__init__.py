"""CLI entry points mirroring the reference's training/eval scripts."""

import os as _os

# Platform override for every pgx.cli.* entry point: PGX_PLATFORM=cpu
# forces the host backend even where a site wrapper pins another platform
# via an env var JAX ignores post-init (this image pins JAX_PLATFORMS=axon
# in sitecustomize; forcing CPU must happen through jax.config before
# first device use).  Useful when the remote-compile tunnel is slow
# (eval tools like fid_sweep/fid_selftest should always run CPU — the
# 299px Inception compile through the tunnel takes >9 min) and for
# deterministic CPU smokes:
#   PGX_PLATFORM=cpu PGX_HOST_DEVICES=8 python -m pgx.cli.mnist_train ...
_plat = _os.environ.get("PGX_PLATFORM")
if _plat:
    _n = _os.environ.get("PGX_HOST_DEVICES")
    if _n and ("xla_force_host_platform_device_count"
               not in _os.environ.get("XLA_FLAGS", "")):
        _os.environ["XLA_FLAGS"] = (
            _os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={_n}").strip()
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass   # backend already initialized by the embedding process
