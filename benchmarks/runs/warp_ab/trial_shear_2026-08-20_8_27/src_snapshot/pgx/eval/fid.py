"""FID computation (fork-parity with fid/musem_fid.py).

Reproduces the reference's exact measurement chain, including its quirks:

* float32 generator outputs are squashed ``tanh(x) + 1`` then scaled by
  127.5 to uint8 (musem_fid.py:41-43) — reproduced bit-for-bit, since
  comparable scores require identical preprocessing (SURVEY.md section 7
  hard-part #8);
* PIL bilinear resize to 299x299 + ImageNet normalization (musem_fid.py:
  90-94), after which pytorch_fid's wrapper applies 2x-1 on top — both
  reproduced;
* InceptionV3 pool3 activations (2048-d), batched (musem_fid.py:71-123);
* Frechet distance with scipy sqrtm and the eps-diagonal singular fallback
  (musem_fid.py:126-177).

The feature extractor is pluggable: the JAX InceptionV3 port with official
weights when a weights file is available, random-init otherwise (pipeline
tests), or any callable ``(N, 299, 299, 3) NHWC -> (N, D)``.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pgx.eval.inception import inception_pool3, init_inception

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def to_uint8_quirk(x: np.ndarray) -> np.ndarray:
    """The reference's float->uint8 squash: tanh(x)+1 then *127.5
    (musem_fid.py:41-43).  The reference only ever sees float32; other
    float dtypes (e.g. numpy-default float64) take the same path rather
    than crashing later inside PIL."""
    if x.dtype.kind == "f":
        x = np.tanh(np.asarray(x, np.float32)) + 1.0
        x = x * 127.5
        return x.astype(np.uint8)
    return x


def preprocess(images: np.ndarray) -> np.ndarray:
    """uint8/float NHWC (or NCHW float, as the reference feeds) ->
    float32 NHWC 299x299 ready for the Inception forward.

    Chain: uint8-quirk -> PIL RGB -> bilinear 299 resize -> /255 ->
    ImageNet normalize -> 2x-1 (pytorch_fid wrapper normalize_input).
    """
    from PIL import Image

    out = np.empty((len(images), 299, 299, 3), np.float32)
    for i, x in enumerate(images):
        x = to_uint8_quirk(x)
        if x.ndim == 3 and x.shape[0] in (1, 3) and x.shape[-1] not in (1, 3):
            x = np.transpose(x, (1, 2, 0))        # NCHW item -> HWC
        if x.ndim == 2:
            x = x[:, :, None]
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        im = Image.fromarray(x).convert("RGB").resize((299, 299),
                                                      Image.BILINEAR)
        out[i] = np.asarray(im, np.float32) / 255.0
    out = (out - IMAGENET_MEAN) / IMAGENET_STD
    return out * 2.0 - 1.0   # pytorch_fid wrapper's normalize_input


def make_extractor(params=None,
                   key: Optional[jax.Array] = None,
                   mesh=None) -> Callable:
    """Jitted pool3 feature extractor; random-init params if none given.

    With ``mesh`` (a 1-D ``('data',)`` mesh from ``pgx.parallel.make_mesh``)
    the Inception forward runs data-parallel: params replicated, each batch
    sharded over the mesh's devices under GSPMD — the eval-side counterpart
    of the training/serving batch sharding.  Ragged final batches are
    padded to a device multiple and sliced back, so features are identical
    to the single-device extractor for any batch size (pinned by
    tests/test_fid.py).
    """
    if params is None:
        params = init_inception(key if key is not None
                                else jax.random.PRNGKey(0))
    if mesh is None:
        fwd = jax.jit(lambda x: inception_pool3(params, x))
        return lambda batch: np.asarray(fwd(jnp.asarray(batch)))

    from pgx.parallel import batch_sharding, replicate

    pi = jax.process_index()
    if any(d.process_index != pi for d in mesh.devices.flat):
        # run() feeds host-local numpy and gathers features back with
        # np.asarray — neither is defined over non-addressable devices.
        # Evaluation is a host-side tool; refuse loudly (the convention
        # of make_mesh_for_batch) rather than erroring at the first batch.
        # A mesh of this process's own devices is fine even multi-host.
        raise ValueError(
            "make_extractor(mesh=...) needs a fully-addressable mesh: "
            "build it from this process's jax.local_devices() and run "
            "the sweep on one host")
    n_dev = int(np.prod(mesh.devices.shape))
    params_r = replicate(mesh, params)
    in_sh = batch_sharding(mesh)
    fwd = jax.jit(inception_pool3)

    def run(batch):
        b = len(batch)
        pad = (-b) % n_dev
        if pad:
            batch = np.concatenate(
                [batch, np.repeat(np.asarray(batch[-1:]), pad, axis=0)])
        x = jax.device_put(jnp.asarray(batch), in_sh)
        return np.asarray(fwd(params_r, x))[:b]

    return run


def get_activations(data: np.ndarray, extractor: Callable,
                    batch_size: int = 50) -> np.ndarray:
    """Batched pool3 activations (musem_fid.py:71-123)."""
    n = len(data)
    if n == 0:
        raise ValueError("no images to extract activations from")
    out = None
    for start in range(0, n, batch_size):
        batch = preprocess(data[start:start + batch_size])
        acts = extractor(batch)
        if out is None:
            out = np.empty((n, acts.shape[-1]), np.float64)
        out[start:start + len(acts)] = acts
    return out


def calculate_activation_statistics(
        data: np.ndarray, extractor: Callable,
        batch_size: int = 50) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of pool3 activations (musem_fid.py:180-201)."""
    act = get_activations(data, extractor, batch_size)
    return np.mean(act, axis=0), np.cov(act, rowvar=False)


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2,
                               eps: float = 1e-6) -> float:
    """Frechet distance with the reference's singular-matrix fallback
    (musem_fid.py:126-177)."""
    from scipy import linalg

    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"Imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real

    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def calculate_fid_given_data(data_1: np.ndarray, data_2: np.ndarray,
                             extractor: Optional[Callable] = None,
                             batch_size: int = 50) -> float:
    """FID of two in-memory data sources (musem_fid.py:204-216)."""
    if extractor is None:
        extractor = make_extractor()
    m1, s1 = calculate_activation_statistics(data_1, extractor, batch_size)
    m2, s2 = calculate_activation_statistics(data_2, extractor, batch_size)
    return calculate_frechet_distance(m1, s1, m2, s2)
