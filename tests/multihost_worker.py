"""Subprocess worker for the multi-host training test: forces a 4-device CPU
backend, then runs a real training CLI with --multihost (mnist_train by
default; ``--cli proper`` selects the proper_cifar entry).  Launched twice
(process 0/1) by tests/test_multihost.py -> a 2-process x 4-device global
mesh exercising jax.distributed init, per-host batch slicing, global-batch
assembly, and main-host-only IO."""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

if __name__ == "__main__":
    argv = sys.argv[1:]
    cli = "mnist"
    if "--cli" in argv:
        at = argv.index("--cli")
        cli = argv[at + 1]
        argv = argv[:at] + argv[at + 2:]
    if cli == "proper":
        from pgx.cli.proper_cifar_train import main
    else:
        from pgx.cli.mnist_train import main
    trial = main(argv)
    # every process reports the replicated final D loss-scale invariants by
    # printing OK; the launcher asserts both workers got here
    print(f"MULTIHOST_OK process={jax.process_index()} trial={trial}",
          flush=True)
