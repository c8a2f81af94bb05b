"""pgx.cli.fid_selftest: the absolute-FID certification kit (VERDICT r4
next #5).  No official weights exist in this environment, so the tests
drive the full CLI with a random-weights state_dict in the supported
layout: unrecognized-hash rejection (negative path), unverified scoring,
expected-slot recording, pass, and mismatch-fail."""

import json
import os

import numpy as np
import pytest
import torch

from pgx.cli import fid_selftest


@pytest.fixture(scope="module")
def random_weights(tmp_path_factory):
    from tests.torch_fid_inception import FIDInceptionV3, randomize_
    model = randomize_(FIDInceptionV3(), seed=5).eval()
    path = str(tmp_path_factory.mktemp("w") / "random_inception.pt")
    torch.save(model.state_dict(), path)
    return path


def test_committed_artifacts_exist_and_load():
    imgs = np.load(fid_selftest.IMAGES_PATH)["images"]
    assert imgs.shape == (64, 8, 8, 1) and imgs.dtype == np.uint8
    with open(fid_selftest.EXPECTED_PATH) as f:
        expected = json.load(f)
    slots = {k: v for k, v in expected.items() if not k.startswith("_")}
    # both official checkpoint identities present, torch-hub hash prefixes
    assert slots["pt_inception-2015-12-05"]["sha256_prefix"] == "6726825d"
    assert slots["torchvision_inception_v3"]["sha256_prefix"] == "0cc3c7bd"


def test_random_weights_negative_path(random_weights, capsys):
    """A weights file whose sha256 matches no official checkpoint must be
    rejected (exit 2) unless --allow-unverified."""
    rc = fid_selftest.main(["--weights", random_weights])
    assert rc == 2
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "unrecognized_weights"
    assert out["sha256"] == fid_selftest.sha256_file(random_weights)


def test_allow_unverified_scores(random_weights, capsys):
    rc = fid_selftest.main(["--weights", random_weights,
                            "--allow-unverified", "--batch-size", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "computed_unverified"
    assert np.isfinite(out["fid_halves"]) and out["fid_halves"] >= 0
    assert np.isfinite(out["act_mean_abs"]) and out["act_mean_abs"] > 0


@pytest.mark.slow
def test_record_then_pass_then_fail(random_weights, tmp_path, capsys):
    """The certification loop end-to-end: identify -> record expected ->
    pass on re-run -> fail loudly when the recorded value is wrong."""
    sha = fid_selftest.sha256_file(random_weights)
    expected_path = str(tmp_path / "expected.json")
    with open(expected_path, "w") as f:
        json.dump({"fake-official": {"sha256_prefix": sha[:8],
                                     "fid_halves": None,
                                     "act_mean_abs": None,
                                     "act_mean": None}}, f)

    base = ["--weights", random_weights, "--expected", expected_path,
            "--batch-size", "32"]

    # slot exists but empty -> computed, exit 0, hint to record
    rc = fid_selftest.main(base)
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "computed_no_expected"
    assert out["weights"] == "fake-official"

    # record
    rc = fid_selftest.main(base + ["--update-expected"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "expected_recorded"
    with open(expected_path) as f:
        slot = json.load(f)["fake-official"]
    assert slot["fid_halves"] == pytest.approx(out["fid_halves"])

    # re-run -> pass (deterministic chain)
    rc = fid_selftest.main(base)
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["status"] == "pass"

    # corrupt the slot -> fail with the offending key reported
    slot_bad = {"fake-official": dict(slot, act_mean_abs=slot["act_mean_abs"]
                                      * 1.5)}
    with open(expected_path, "w") as f:
        json.dump(slot_bad, f)
    rc = fid_selftest.main(base)
    assert rc == 1
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "fail"
    assert "act_mean_abs" in out["mismatches"]
