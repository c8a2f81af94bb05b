"""Every training CLI runs a micro end-to-end pass on synthetic data.

These are argv-level drives of the public script surface — they catch
argument-wiring bugs (e.g. duplicate kwargs) that library tests miss.
"""

import os

import pytest

pytestmark = pytest.mark.slow

TINY = ["--synthetic", "--batch-size", "4", "--log-every", "100",
        "--sample-every", "100", "--checkpoint-every", "100",
        "--no-mesh", "--channels", "8", "--z-dim", "8"]


def _run(main, tmp_path, extra):
    trial = main(TINY + ["--output", str(tmp_path)] + extra)
    assert os.path.isdir(trial)
    assert os.listdir(os.path.join(trial, "checkpoint"))
    return trial


def test_cli_train(tmp_path):
    from pgx.cli.train import main
    _run(main, tmp_path, ["--total-iter", "4", "--max-step", "2"])


def test_cli_mnist_train(tmp_path):
    from pgx.cli.mnist_train import main
    _run(main, tmp_path, ["--total-iter", "4", "--max-step", "2"])


def test_cli_cifar_train(tmp_path):
    from pgx.cli.cifar_train import main
    _run(main, tmp_path, ["--total-iter", "4", "--max-step", "2"])


def test_cli_proper_cifar_train(tmp_path):
    from pgx.cli.proper_cifar_train import main
    _run(main, tmp_path, ["--images-per-mini-step", "8", "--max-step", "2"])


def test_cli_conditional_mnist(tmp_path):
    from pgx.cli.conditional_mnist_wgan_train import main
    _run(main, tmp_path, ["--total-iter", "4", "--max-step", "2",
                          "--num-classes", "3"])


def test_cli_conditional_cifar10(tmp_path):
    from pgx.cli.conditional_cifar10_wgan_train import main
    _run(main, tmp_path, ["--total-iter", "4", "--max-step", "2",
                          "--num-classes", "3"])


def test_cli_conditional_proper_cifar_ada(tmp_path):
    from pgx.cli.conditional_proper_cifar_train import main
    _run(main, tmp_path, ["--images-per-mini-step", "8", "--max-step", "2",
                          "--num-classes", "3", "--ada",
                          "--ada-length", "100"])


def test_cli_conditional_proper_cifar_ada_heads(tmp_path):
    from pgx.cli.conditional_proper_cifar_train import main
    _run(main, tmp_path, ["--images-per-mini-step", "8", "--max-step", "2",
                          "--num-classes", "3", "--ada-heads"])


def test_cli_mnist_train_ada_on_digits(tmp_path):
    """Real data end-to-end at micro scale: the sklearn-digits dataset
    (`--path sklearn-digits`) through the legacy MNIST CLI with the ADA
    pipeline + controller enabled — covers the ADA flags now shared by
    every CLI (pgx/cli/common.py add_ada_args) and the ada_p log column."""
    from pgx.cli.mnist_train import main
    tiny = [a for a in TINY if a != "--synthetic"]
    trial = main(tiny + ["--output", str(tmp_path), "--path",
                         "sklearn-digits", "--total-iter", "4",
                         "--max-step", "2", "--ada", "--ada-length", "100"])
    assert os.listdir(os.path.join(trial, "checkpoint"))
    log = [f for f in os.listdir(trial) if f.startswith("train_log")]
    with open(os.path.join(trial, log[0])) as f:
        header = f.readline().strip()
    assert header.endswith(",ada_p,ada_r")


def test_cli_fixed_p_augmentation(tmp_path):
    """--ada-p P runs the augmentation pipe at a fixed probability with no
    controller (the ADA paper's fixed-p ablation mode; wgan.py's
    ``augment_p`` path).  The log gains the ada columns and ada_p stays
    pinned at P."""
    from pgx.cli.conditional_proper_cifar_train import main
    trial = _run(main, tmp_path,
                 ["--images-per-mini-step", "8", "--max-step", "2",
                  "--num-classes", "3", "--ada-p", "0.3",
                  "--log-every", "1"])
    log = [f for f in os.listdir(trial) if f.startswith("train_log")]
    with open(os.path.join(trial, log[0])) as f:
        header = f.readline().strip()
        row = f.readline().strip().split(",")
    assert header.endswith(",ada_p,ada_r")
    ada_p = float(row[header.split(",").index("ada_p")])
    assert ada_p == pytest.approx(0.3, abs=1e-6)


def test_cli_fixed_p_and_adaptive_mutually_exclusive():
    from pgx.cli.common import ada_configs_from_args
    import argparse
    ns = argparse.Namespace(ada=True, ada_p=0.3, ada_warp="shear",
                            ada_target=0.6, ada_length=100)
    with pytest.raises(SystemExit):
        ada_configs_from_args(ns)
    ns = argparse.Namespace(ada=False, ada_p=1.5, ada_warp="shear",
                            ada_target=0.6, ada_length=100)
    with pytest.raises(SystemExit):
        ada_configs_from_args(ns)
    aug, ada, p = ada_configs_from_args(
        argparse.Namespace(ada=False, ada_p=0.25, ada_warp="gather",
                           ada_target=0.6, ada_length=100))
    assert aug is not None and ada is None and p == 0.25
    assert aug.warp_impl == "gather"


def test_cli_wikiart_synthetic(tmp_path):
    from pgx.cli.conditional_proper_wikiart import main
    _run(main, tmp_path, ["--images-per-mini-step", "8", "--max-step", "2",
                          "--num-classes", "3"])


def test_cli_equal_embed_variant(tmp_path):
    from pgx.cli.conditional_proper_cifar_train import main
    _run(main, tmp_path, ["--images-per-mini-step", "8", "--max-step", "2",
                          "--num-classes", "3", "--equal-embed"])


def test_cli_conditional_proper_grown_512(tmp_path):
    """--max-step > 6 switches the conditional proper CLIs to the grown
    halving-plan configs (zoo.conditional_correct_grown): 512px-capable
    training from scratch, no grow-checkpoint step needed.  Micro pass
    through every stage up to 512px with --gp-mode jvp (the recommended
    512px recipe)."""
    import json

    from pgx.cli.conditional_proper_cifar_train import main
    # later --channels wins over TINY's (argparse last-occurrence)
    trial = _run(main, tmp_path,
                 ["--images-per-mini-step", "8", "--max-step", "8",
                  "--num-classes", "3", "--channels", "16",
                  "--gp-mode", "jvp"])
    cfg_file = [f for f in os.listdir(trial) if f.startswith("train_config")]
    with open(os.path.join(trial, cfg_file[0])) as f:
        cfg = json.load(f)
    assert tuple(cfg["generator"]["channels"]) == (16, 16, 16, 16, 8, 4, 2, 1)
    assert cfg["train"]["gp_mode"] == "jvp"
    # the final sample grid is 512px
    samples = sorted(os.listdir(os.path.join(trial, "sample")))
    assert samples
