"""Measure the PyTorch reference's training throughput for the headline
128x128 workload and record it in BASELINE_MEASURED.json.

The reference publishes no numbers (BASELINE.md), so the baseline must be
established empirically by running the reference's own models and training
iteration.  The reference supports CPU or a single CUDA GPU; this container
has CPU-only torch, so the measurement runs there (recorded in the
metadata).  Its 128x128-capable family is the conditional 'proper' pair
(ConditionalCorrectGenerator / ConditionalCorrectDiscriminatorWgangp,
progan_modules.py:601-775) with the reference-default batch size 4
(conditional_proper_wikiart.py:374-390).

Usage:  python tools/measure_reference_baseline.py [--iters 3] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402
from torch import optim  # noqa: E402
from torch.autograd import grad  # noqa: E402


def reference_iteration(G, D, g_ema, opt_g, opt_d, real, label, z, eps,
                        step, alpha):
    """One full reference training iteration (proper_cifar_train.py:191-238
    structure, conditional variant)."""
    D.zero_grad()
    real_predict = D(real, label, step=step, alpha=alpha)
    real_predict = real_predict.mean() - 0.001 * (real_predict ** 2).mean()
    (-real_predict).backward()

    fake = G(z, label, step=step, alpha=alpha)
    fake_predict = D(fake.detach(), label, step=step, alpha=alpha).mean()
    fake_predict.backward()

    x_hat = (eps * real.data + (1 - eps) * fake.detach().data)
    x_hat.requires_grad_(True)
    hat_predict = D(x_hat, label, step=step, alpha=alpha)
    grad_x_hat = grad(hat_predict.sum(), x_hat, create_graph=True)[0]
    gp = 10 * ((grad_x_hat.reshape(grad_x_hat.size(0), -1)
                .norm(2, dim=1) - 1) ** 2).mean()
    gp.backward()
    opt_d.step()

    G.zero_grad()
    D.zero_grad()
    (-D(fake, label, step=step, alpha=alpha).mean()).backward()
    opt_g.step()
    with torch.no_grad():
        for pe, pg in zip(g_ema.parameters(), G.parameters()):
            pe.mul_(0.999).add_(pg, alpha=0.001)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--batches", default="4,16",
                   help="comma-separated batch sizes; the BEST images/sec "
                        "across them becomes the recorded baseline (the "
                        "reference default is 4, but a larger batch "
                        "amortizes Python/dispatch overhead — give the "
                        "reference its best case)")
    p.add_argument("--channels", type=int, default=512)
    args = p.parse_args()

    # use every core the host exposes (torch defaults to this, but pin it
    # explicitly so the recorded number is unambiguous)
    torch.set_num_threads(os.cpu_count())

    from progan_modules import (ConditionalCorrectDiscriminatorWgangp,
                                ConditionalCorrectGenerator)

    torch.manual_seed(0)
    G = ConditionalCorrectGenerator(input_code_dim=512, num_of_classes=10,
                                    in_channel=args.channels, max_step=6)
    D = ConditionalCorrectDiscriminatorWgangp(feat_dim=args.channels,
                                              num_of_classes=10)
    g_ema = ConditionalCorrectGenerator(input_code_dim=512,
                                        num_of_classes=10,
                                        in_channel=args.channels, max_step=6)
    g_ema.load_state_dict(G.state_dict())
    opt_g = optim.Adam(G.parameters(), lr=1e-3, betas=(0.0, 0.99))
    opt_d = optim.Adam(D.parameters(), lr=1e-3, betas=(0.0, 0.99))

    rng = np.random.RandomState(0)
    per_batch = {}
    for b in [int(s) for s in args.batches.split(",")]:
        real = torch.from_numpy(rng.randn(b, 3, 128, 128).astype(np.float32))
        label = torch.from_numpy(rng.randint(0, 10, b))
        z = torch.from_numpy(rng.randn(b, 512).astype(np.float32))
        eps = torch.from_numpy(rng.rand(b, 1, 1, 1).astype(np.float32))

        # warmup
        reference_iteration(G, D, g_ema, opt_g, opt_d, real, label, z, eps,
                            6, 1.0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            reference_iteration(G, D, g_ema, opt_g, opt_d, real, label, z,
                                eps, 6, 1.0)
        dt = time.perf_counter() - t0
        per_batch[b] = {
            "images_per_sec": round(b * args.iters / dt, 3),
            "seconds_per_iteration": round(dt / args.iters, 2),
        }
        print(f"bs={b}: {per_batch[b]}", flush=True)

    best_b = max(per_batch, key=lambda b: per_batch[b]["images_per_sec"])
    out = {
        "reference_images_per_sec": per_batch[best_b]["images_per_sec"],
        "seconds_per_iteration": per_batch[best_b]["seconds_per_iteration"],
        "best_batch_size": best_b,
        "per_batch": per_batch,
        "workload": ("conditional proper 128px G+D WGAN-GP iteration, "
                     f"z=512 ch={args.channels} classes=10; best of "
                     f"batch sizes {sorted(per_batch)}"),
        "hardware": (f"torch-cpu, {torch.get_num_threads()} thread(s) = ALL "
                     f"of this host's {os.cpu_count()} core(s); the "
                     "reference has no TPU path, so the cross-hardware "
                     "multiplier mostly reflects TPU-vs-1-CPU-core — the "
                     "defensible pgx headline is MFU (benchmarks/README.md)"),
        "source": "progan_modules.ConditionalCorrectGenerator/"
                  "ConditionalCorrectDiscriminatorWgangp @ step=6",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
