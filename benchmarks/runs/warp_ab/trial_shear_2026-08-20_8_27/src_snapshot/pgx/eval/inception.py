"""InceptionV3 (pytorch_fid FID variant) in JAX.

The reference scores FID with pytorch_fid's InceptionV3 pool3 features
(fid/musem_fid.py:17,206-208).  This is a faithful port of that network —
torchvision inception_v3 with the FID modifications (count_include_pad=False
average pools in the A/C/E blocks and a max pool in the final E block) — as
pure functions over a parameter pytree keyed by the torchvision state_dict
names, so official weights transplant directly via ``load_torch_weights``.

The container has no network egress, so weights must be provided as a local
file (pt_inception-2015-12-05 state_dict or torchvision inception_v3);
without weights the architecture still runs (random init) for pipeline tests.

All tensors NHWC; BatchNorm is inference-mode (folded running stats).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]

POOL3_DIM = 2048


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def _conv(x, w, stride=1, padding=(0, 0)):
    if isinstance(padding, int):
        padding = (padding, padding)
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def basic_conv2d(p: Params, x, stride=1, padding=(0, 0)):
    """Conv(bias=False) + folded BatchNorm(eps=0.001) + ReLU."""
    x = _conv(x, p["w"].astype(x.dtype), stride, padding)
    scale = p["gamma"] * lax.rsqrt(p["var"] + 1e-3)
    shift = p["beta"] - p["mean"] * scale
    return jax.nn.relu(x * scale.astype(x.dtype) + shift.astype(x.dtype))


def max_pool3x3s2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1), "VALID")


def max_pool3x3s1p1(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))


def avg_pool3x3s1p1_nip(x):
    """3x3 stride-1 avg pool, count_include_pad=False (the pytorch_fid
    patch to the A/C/E blocks)."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                          ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = lax.reduce_window(ones, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                            ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / cnt


# ---------------------------------------------------------------------------
# Architecture spec: (name, in_ch, out_ch, (kh, kw), stride, (ph, pw))
# ---------------------------------------------------------------------------

def _stem_spec() -> List[Tuple]:
    return [
        ("Conv2d_1a_3x3", 3, 32, (3, 3), 2, (0, 0)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3), 1, (0, 0)),
        ("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1)),
        ("Conv2d_3b_1x1", 64, 80, (1, 1), 1, (0, 0)),
        ("Conv2d_4a_3x3", 80, 192, (3, 3), 1, (0, 0)),
    ]


def _block_specs() -> Dict[str, List[Tuple]]:
    """Per mixed block: list of (branch_conv_name, in, out, k, s, p)."""
    def a(in_ch, pool):
        return [
            ("branch1x1", in_ch, 64, (1, 1), 1, (0, 0)),
            ("branch5x5_1", in_ch, 48, (1, 1), 1, (0, 0)),
            ("branch5x5_2", 48, 64, (5, 5), 1, (2, 2)),
            ("branch3x3dbl_1", in_ch, 64, (1, 1), 1, (0, 0)),
            ("branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
            ("branch3x3dbl_3", 96, 96, (3, 3), 1, (1, 1)),
            ("branch_pool", in_ch, pool, (1, 1), 1, (0, 0)),
        ]

    def b(in_ch):
        return [
            ("branch3x3", in_ch, 384, (3, 3), 2, (0, 0)),
            ("branch3x3dbl_1", in_ch, 64, (1, 1), 1, (0, 0)),
            ("branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
            ("branch3x3dbl_3", 96, 96, (3, 3), 2, (0, 0)),
        ]

    def c(in_ch, c7):
        return [
            ("branch1x1", in_ch, 192, (1, 1), 1, (0, 0)),
            ("branch7x7_1", in_ch, c7, (1, 1), 1, (0, 0)),
            ("branch7x7_2", c7, c7, (1, 7), 1, (0, 3)),
            ("branch7x7_3", c7, 192, (7, 1), 1, (3, 0)),
            ("branch7x7dbl_1", in_ch, c7, (1, 1), 1, (0, 0)),
            ("branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0)),
            ("branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3)),
            ("branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0)),
            ("branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3)),
            ("branch_pool", in_ch, 192, (1, 1), 1, (0, 0)),
        ]

    def d(in_ch):
        return [
            ("branch3x3_1", in_ch, 192, (1, 1), 1, (0, 0)),
            ("branch3x3_2", 192, 320, (3, 3), 2, (0, 0)),
            ("branch7x7x3_1", in_ch, 192, (1, 1), 1, (0, 0)),
            ("branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3)),
            ("branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0)),
            ("branch7x7x3_4", 192, 192, (3, 3), 2, (0, 0)),
        ]

    def e(in_ch):
        return [
            ("branch1x1", in_ch, 320, (1, 1), 1, (0, 0)),
            ("branch3x3_1", in_ch, 384, (1, 1), 1, (0, 0)),
            ("branch3x3_2a", 384, 384, (1, 3), 1, (0, 1)),
            ("branch3x3_2b", 384, 384, (3, 1), 1, (1, 0)),
            ("branch3x3dbl_1", in_ch, 448, (1, 1), 1, (0, 0)),
            ("branch3x3dbl_2", 448, 384, (3, 3), 1, (1, 1)),
            ("branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1)),
            ("branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0)),
            ("branch_pool", in_ch, 192, (1, 1), 1, (0, 0)),
        ]

    return {
        "Mixed_5b": a(192, 32), "Mixed_5c": a(256, 64), "Mixed_5d": a(288, 64),
        "Mixed_6a": b(288),
        "Mixed_6b": c(768, 128), "Mixed_6c": c(768, 160),
        "Mixed_6d": c(768, 160), "Mixed_6e": c(768, 192),
        "Mixed_7a": d(768),
        "Mixed_7b": e(1280), "Mixed_7c": e(2048),
    }


def init_inception(key: jax.Array) -> Params:
    """Random-init parameters with the full torchvision naming structure."""
    params: Params = {}
    specs = list(_stem_spec())
    for block, convs in _block_specs().items():
        for (branch, i, o, k, s, p) in convs:
            specs.append((f"{block}.{branch}", i, o, k, s, p))
    keys = jax.random.split(key, len(specs))
    for kk, (name, i, o, (kh, kw), _, _) in zip(keys, specs):
        params[name] = {
            "w": jax.random.normal(kk, (kh, kw, i, o), jnp.float32)
            * float(np.sqrt(1.0 / (i * kh * kw))),
            "gamma": jnp.ones((o,), jnp.float32),
            "beta": jnp.zeros((o,), jnp.float32),
            "mean": jnp.zeros((o,), jnp.float32),
            "var": jnp.ones((o,), jnp.float32),
        }
    return params


def load_torch_weights(path: str) -> Params:
    """Build params from a torch state_dict file (pytorch_fid's
    pt_inception-2015-12-05 checkpoint or torchvision inception_v3)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params: Params = {}
    names = [s[0] for s in _stem_spec()]
    for block, convs in _block_specs().items():
        names += [f"{block}.{b}" for (b, *_rest) in convs]
    for name in names:
        w = sd[f"{name}.conv.weight"].numpy()          # OIHW
        params[name] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "gamma": jnp.asarray(sd[f"{name}.bn.weight"].numpy()),
            "beta": jnp.asarray(sd[f"{name}.bn.bias"].numpy()),
            "mean": jnp.asarray(sd[f"{name}.bn.running_mean"].numpy()),
            "var": jnp.asarray(sd[f"{name}.bn.running_var"].numpy()),
        }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _bc(params, name, spec_map):
    _, _, _, k, s, p = spec_map[name]
    return lambda x: basic_conv2d(params[name], x, stride=s, padding=p)


def inception_pool3(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Pool3 (2048-d) features for NHWC input at 299x299.

    Input convention matches pytorch_fid's wrapper after the reference's
    preprocessing; see pgx.eval.fid.preprocess for the exact chain.
    """
    spec_map = {}
    for (name, i, o, k, s, p) in _stem_spec():
        spec_map[name] = (name, i, o, k, s, p)
    blocks = _block_specs()
    for block, convs in blocks.items():
        for (branch, i, o, k, s, p) in convs:
            spec_map[f"{block}.{branch}"] = (branch, i, o, k, s, p)

    def bc(name):
        return _bc(params, name, spec_map)

    x = bc("Conv2d_1a_3x3")(x)
    x = bc("Conv2d_2a_3x3")(x)
    x = bc("Conv2d_2b_3x3")(x)
    x = max_pool3x3s2(x)
    x = bc("Conv2d_3b_1x1")(x)
    x = bc("Conv2d_4a_3x3")(x)
    x = max_pool3x3s2(x)

    def block_a(x, b):
        br1 = bc(f"{b}.branch1x1")(x)
        br5 = bc(f"{b}.branch5x5_2")(bc(f"{b}.branch5x5_1")(x))
        br3 = bc(f"{b}.branch3x3dbl_3")(
            bc(f"{b}.branch3x3dbl_2")(bc(f"{b}.branch3x3dbl_1")(x)))
        brp = bc(f"{b}.branch_pool")(avg_pool3x3s1p1_nip(x))
        return jnp.concatenate([br1, br5, br3, brp], axis=-1)

    def block_b(x, b):
        br3 = bc(f"{b}.branch3x3")(x)
        brd = bc(f"{b}.branch3x3dbl_3")(
            bc(f"{b}.branch3x3dbl_2")(bc(f"{b}.branch3x3dbl_1")(x)))
        return jnp.concatenate([br3, brd, max_pool3x3s2(x)], axis=-1)

    def block_c(x, b):
        br1 = bc(f"{b}.branch1x1")(x)
        br7 = bc(f"{b}.branch7x7_3")(
            bc(f"{b}.branch7x7_2")(bc(f"{b}.branch7x7_1")(x)))
        brd = x
        for i in range(1, 6):
            brd = bc(f"{b}.branch7x7dbl_{i}")(brd)
        brp = bc(f"{b}.branch_pool")(avg_pool3x3s1p1_nip(x))
        return jnp.concatenate([br1, br7, brd, brp], axis=-1)

    def block_d(x, b):
        br3 = bc(f"{b}.branch3x3_2")(bc(f"{b}.branch3x3_1")(x))
        br7 = x
        for i in range(1, 5):
            br7 = bc(f"{b}.branch7x7x3_{i}")(br7)
        return jnp.concatenate([br3, br7, max_pool3x3s2(x)], axis=-1)

    def block_e(x, b, final_maxpool):
        br1 = bc(f"{b}.branch1x1")(x)
        b3 = bc(f"{b}.branch3x3_1")(x)
        br3 = jnp.concatenate([bc(f"{b}.branch3x3_2a")(b3),
                               bc(f"{b}.branch3x3_2b")(b3)], axis=-1)
        bd = bc(f"{b}.branch3x3dbl_2")(bc(f"{b}.branch3x3dbl_1")(x))
        brd = jnp.concatenate([bc(f"{b}.branch3x3dbl_3a")(bd),
                               bc(f"{b}.branch3x3dbl_3b")(bd)], axis=-1)
        pool = (max_pool3x3s1p1(x) if final_maxpool
                else avg_pool3x3s1p1_nip(x))
        brp = bc(f"{b}.branch_pool")(pool)
        return jnp.concatenate([br1, br3, brd, brp], axis=-1)

    x = block_a(x, "Mixed_5b")
    x = block_a(x, "Mixed_5c")
    x = block_a(x, "Mixed_5d")
    x = block_b(x, "Mixed_6a")
    for b in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = block_c(x, b)
    x = block_d(x, "Mixed_7a")
    # pytorch_fid: FIDInceptionE_1 (avg, no pad count) then E_2 (max pool)
    x = block_e(x, "Mixed_7b", final_maxpool=False)
    x = block_e(x, "Mixed_7c", final_maxpool=True)

    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)
