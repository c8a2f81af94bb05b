"""Measure the reference's MNIST-workload iteration rate on torch-CPU (its
only supported backend here) — the per-stage counterpart of
``measure_reference_baseline.py`` for the 190k-iteration MNIST workload
(mnist_train.py:274-302 config: z=128, ch=8, bs=4; 90k iterations split
over 3 stages + 100k tail at 32px, mnist_train.py:88-90).

Runs the documented training iteration (SURVEY.md section 2.3) on the
actual reference ``mnist_pggan`` models at each stage resolution and
integrates the stage rates over the schedule:

    python tools/measure_reference_mnist.py

pgx comparison: the same workload end-to-end (real data, all compiles)
via ``python -m pgx.cli.mnist_train --path sklearn-digits --total-iter
90000 --tail-iterations 100000 --batch-size 4 --channels 8
--steps-per-call 16`` — see benchmarks/README.md.
"""

import json
import sys
import time

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

torch.manual_seed(0)

import mnist_pggan  # noqa: E402


def stage_rate(step: int, size: int, n: int = 150) -> float:
    G = mnist_pggan.Generator(input_code_dim=128, in_channel=8,
                              pixel_norm=True, tanh=False)
    D = mnist_pggan.Discriminator(feat_dim=8)
    g_running = mnist_pggan.Generator(input_code_dim=128, in_channel=8,
                                      pixel_norm=True, tanh=False)
    opt_g = torch.optim.Adam(G.parameters(), lr=1e-3, betas=(0.0, 0.99))
    opt_d = torch.optim.Adam(D.parameters(), lr=1e-3, betas=(0.0, 0.99))
    bs = 4
    real = torch.randn(bs, 1, size, size)

    def iteration():
        D.zero_grad()
        rp = D(real, step=step, alpha=1.0)
        rp = rp.mean() - 0.001 * (rp ** 2).mean()
        (-rp).backward()
        z = torch.randn(bs, 128)
        fake = G(z, step=step, alpha=1.0)
        D(fake.detach(), step=step, alpha=1.0).mean().backward()
        eps = torch.rand(bs, 1, 1, 1)
        x_hat = (eps * real.data
                 + (1 - eps) * fake.detach().data).requires_grad_(True)
        grad = torch.autograd.grad(D(x_hat, step=step, alpha=1.0).sum(),
                                   x_hat, create_graph=True)[0]
        gp = 10 * ((grad.reshape(bs, -1).norm(2, dim=1) - 1) ** 2).mean()
        gp.backward()
        opt_d.step()
        G.zero_grad()
        D.zero_grad()
        (-D(fake, step=step, alpha=1.0).mean()).backward()
        opt_g.step()
        with torch.no_grad():
            for pe, pg in zip(g_running.parameters(), G.parameters()):
                pe.mul_(0.999).add_(pg, alpha=0.001)

    for _ in range(10):
        iteration()
    t0 = time.perf_counter()
    for _ in range(n):
        iteration()
    return n / (time.perf_counter() - t0)


def main():
    rates = {8: stage_rate(1, 8), 16: stage_rate(2, 16),
             32: stage_rate(3, 32)}
    # legacy split: 90k/3 iterations per stage, 100k tail at final res
    seconds = 30000 / rates[8] + 30000 / rates[16] + 130000 / rates[32]
    print(json.dumps({
        "per_stage_it_per_s": {str(k): round(v, 1)
                               for k, v in rates.items()},
        "workload_iterations": 190000,
        "estimated_hours": round(seconds / 3600, 2),
    }))


if __name__ == "__main__":
    main()
