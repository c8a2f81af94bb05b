"""Microbench: fused Pallas conv3x3+epilogue vs the XLA composition.

The two dominant 128px-flagship shapes (512-ch 3x3 SAME convs at 16^2 and
32^2, batch 32) — VERDICT r2 next-step #2 asked for an honest per-shape
attempt at fusing the bias/pixel-norm/lrelu epilogue INTO the conv kernel.

Timing: N chained calls (output feeds the next input — ci == co makes the
chain well-typed) ended by a host fetch; block_until_ready returns early on
the axon relay.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def chain_time(fn, x, n, *args):
    y = fn(x, *args)          # compile+warm
    y = fn(y, *args)
    float(jnp.sum(y[0] if isinstance(y, (tuple, list)) else y))
    t0 = time.perf_counter()
    y = x
    for _ in range(n):
        y = fn(y, *args)
        if isinstance(y, (tuple, list)):
            y = y[0]
    float(jnp.sum(y))
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--channels", type=int, default=512)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--grad", action="store_true",
                   help="also bench the VJP (train-step configuration)")
    args = p.parse_args()

    from pgx.ops.pallas.conv_epilogue import (conv3x3_epilogue_fwd,
                                              conv3x3_epilogue_ref,
                                              make_conv3x3_epilogue)

    dt = jnp.dtype(args.dtype)
    c = args.channels
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32)
                    * np.sqrt(2.0 / (9 * c)))
    b = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)

    for res in (16, 32):
        x = jnp.asarray(rng.randn(args.batch, res, res, c), dt)

        xla = jax.jit(lambda xx: conv3x3_epilogue_ref(xx, w, b))
        pal = jax.jit(lambda xx: conv3x3_epilogue_fwd(xx, w, b))
        t_xla = chain_time(xla, x, args.steps)
        t_pal = chain_time(pal, x, args.steps)
        print(f"res {res:3d} fwd : xla {t_xla*1e3:7.3f} ms   "
              f"pallas {t_pal*1e3:7.3f} ms   ({t_xla/t_pal:.2f}x)",
              flush=True)

        if args.grad:
            op = make_conv3x3_epilogue()

            def vjp_of(f):
                def step(xx):
                    y, pull = jax.vjp(lambda q: f(q), xx)
                    (dx,) = pull(y)
                    return dx
                return jax.jit(step)

            t_xla_g = chain_time(vjp_of(lambda q: conv3x3_epilogue_ref(
                q, w, b)), x, args.steps)
            t_pal_g = chain_time(vjp_of(lambda q: op(q, w, b)), x,
                                 args.steps)
            print(f"res {res:3d} f+b : xla {t_xla_g*1e3:7.3f} ms   "
                  f"pallas {t_pal_g*1e3:7.3f} ms   "
                  f"({t_xla_g/t_pal_g:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
