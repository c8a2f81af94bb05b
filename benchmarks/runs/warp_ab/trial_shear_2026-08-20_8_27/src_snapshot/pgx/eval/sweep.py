"""Checkpoint-sweep FID driver (mirrors fid/load_mnist_model_and_fid_it.py
and fid/load_cifar_model_and_fid_it.py).

For every ``{iter}_g.model`` checkpoint in a trial dir: reconstruct
(step, alpha) from the iteration index via the growth schedule (the
reference's arithmetic, :94-100), generate N samples in batches from the EMA
generator, score FID against real-data statistics, and append to an
incremental ``fid_score.json`` that skips already-scored checkpoints
(:38-46, :86-87).  Exception: entries written by the in-training gate
(``TrainingFid``) are re-scored — their per-stage-resolution balanced
baseline is not comparable to the sweep's (see ``load_fid_meta``).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pgx import checkpoint as ckpt
from pgx.eval.fid import (calculate_activation_statistics,
                          calculate_frechet_distance, get_activations,
                          make_extractor)
from pgx.train.wgan import make_eval_generate


def _load_scores(trial_dir: str, filename: str) -> dict:
    path = os.path.join(trial_dir, filename)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _append_score(trial_dir: str, filename: str, name: str, score) -> None:
    scores = _load_scores(trial_dir, filename)
    scores[name] = score
    with open(os.path.join(trial_dir, filename), "w") as f:
        json.dump(scores, f, indent=2)


def load_fid_scores(trial_dir: str) -> dict:
    return _load_scores(trial_dir, "fid_score.json")


def append_fid_score(trial_dir: str, name: str, score: float) -> None:
    _append_score(trial_dir, "fid_score.json", name, score)


def load_kid_scores(trial_dir: str) -> dict:
    """Incremental kid_score.json: {ckpt: [mean, std]} (pgx.eval.kid)."""
    return _load_scores(trial_dir, "kid_score.json")


def load_fid_meta(trial_dir: str) -> dict:
    """Names whose fid_score.json entries came from the IN-TRAINING gate
    (TrainingFid: per-stage-resolution, class-balanced real baseline).
    Those numbers are not comparable to a post-hoc sweep's single
    native-resolution baseline, so ``sweep_trial`` re-scores them instead
    of skipping — the final file never mixes the two scales."""
    return _load_scores(trial_dir, "fid_score_meta.json")


def _unmark_in_training(trial_dir: str, name: str) -> None:
    meta = load_fid_meta(trial_dir)
    if name in meta:
        del meta[name]
        with open(os.path.join(trial_dir, "fid_score_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)


def append_kid_score(trial_dir: str, name: str, mean: float,
                     std: float) -> None:
    _append_score(trial_dir, "kid_score.json", name, [mean, std])


def generate_samples(params, gcfg, *, step: int, alpha: float, fading: bool,
                     num_samples: int, batch_size: int = 50, seed: int = 0,
                     num_classes: int = 0, gen=None) -> np.ndarray:
    """Batched EMA-generator sampling (reference :103-113); returns float32
    NHWC outputs (pre-squash — the FID preprocessing applies the reference's
    tanh quirk).  ``gen`` lets a caller pass a cached jitted generator
    (TrainingFid scores repeatedly at the same growth stage)."""
    if gen is None:
        gen = make_eval_generate(gcfg, step=step, fading=fading)
    rng = np.random.RandomState(seed)
    # class-BALANCED labels (shuffled round-robin), matching the real-side
    # statistics which are computed over class-balanced subsets
    # (datasets._balanced_subset_indices) — uniform sampling would add an
    # avoidable label-distribution mismatch to the metric
    if num_classes:
        labels = np.tile(np.arange(num_classes),
                         num_samples // num_classes + 1)[:num_samples]
        labels = rng.permutation(labels)
    outs = []
    done = 0
    while done < num_samples:
        b = min(batch_size, num_samples - done)
        z = jnp.asarray(rng.randn(b, gcfg.z_dim).astype(np.float32))
        lab = jnp.asarray(labels[done:done + b]) if num_classes else None
        outs.append(np.asarray(gen(params, z, lab, jnp.float32(alpha)),
                               np.float32))
        done += b
    return np.concatenate(outs)


def sweep_trial(trial_dir: str, schedule, real_data: np.ndarray,
                num_samples: int = 2000, batch_size: int = 50,
                extractor: Optional[Callable] = None,
                verbose: bool = True, kid: bool = False,
                kid_subset_size: int = 1000,
                kid_subsets: int = 100) -> dict:
    """Score every unscored G checkpoint in a trial dir against real_data.

    ``kid=True`` additionally scores the Kernel Inception Distance
    (pgx.eval.kid) from the same activations into an incremental
    ``kid_score.json`` — checkpoints already FID-scored get their missing
    KID filled in without regenerating FID."""
    cfg = ckpt.load_config(trial_dir)
    gcfg, _, _ = ckpt.configs_from_dict(cfg)
    if extractor is None:
        extractor = make_extractor()

    # real activations computed lazily: a fully-scored trial (the
    # incremental-skip use case) must not pay the Inception pass at all
    real = {}

    def _real():
        if not real:
            acts = get_activations(real_data, extractor, batch_size)
            real["acts"] = acts
            real["mu"] = np.mean(acts, axis=0)
            real["sig"] = np.cov(acts, rowvar=False)
        return real

    scores = load_fid_scores(trial_dir)
    kid_scores = load_kid_scores(trial_dir) if kid else {}
    in_training = load_fid_meta(trial_dir)
    for path in ckpt.list_checkpoints(trial_dir, "g"):
        name = os.path.basename(path)
        # in-training entries (TrainingFid) used a per-stage-resolution
        # balanced baseline — re-score them against THIS sweep's baseline
        # so min()/comparisons inside fid_score.json stay apples-to-apples
        rescore = name in in_training
        if (name in scores and not rescore
                and (not kid or name in kid_scores)):
            continue
        _, params, _, st = ckpt.load_generator_state(
            trial_dir, schedule, path=path)
        samples = generate_samples(
            params, gcfg, step=st.step, alpha=st.alpha, fading=st.fading,
            num_samples=num_samples, batch_size=batch_size,
            num_classes=gcfg.num_classes if gcfg.conditioning != "none"
            else 0)
        gen_acts = get_activations(samples, extractor, batch_size)
        msg = f"{name}: step={st.step} alpha={st.alpha:.2f}"
        if name not in scores or rescore:
            r = _real()
            mu_g, sig_g = (np.mean(gen_acts, axis=0),
                           np.cov(gen_acts, rowvar=False))
            fid = calculate_frechet_distance(mu_g, sig_g, r["mu"], r["sig"])
            scores[name] = fid
            append_fid_score(trial_dir, name, fid)
            msg += f" FID={fid:.2f}" + (" (re-scored)" if rescore else "")
        if kid and (name not in kid_scores or rescore):
            from pgx.eval.kid import kid_from_activations
            k_mean, k_std = kid_from_activations(
                _real()["acts"], gen_acts, subset_size=kid_subset_size,
                num_subsets=kid_subsets)
            kid_scores[name] = [k_mean, k_std]
            append_kid_score(trial_dir, name, k_mean, k_std)
            msg += f" KID={k_mean:.5f}+-{k_std:.5f}"
        if rescore:
            _unmark_in_training(trial_dir, name)
        if verbose:
            print(msg, flush=True)
    # in-training scores at iterations with NO checkpoint file cannot be
    # re-scored (no params to regenerate from) — they stay marked, and
    # consumers (fid_sweep's best-of) must exclude them from comparisons
    leftover = [n for n in load_fid_meta(trial_dir) if n in scores]
    if leftover and verbose:
        print(f"note: {len(leftover)} in-training score(s) have no "
              f"checkpoint file and keep their per-stage baseline: "
              f"{leftover}", flush=True)
    return scores


def precompute_real_statistics(dataset, sizes, out_dir: str,
                               samples_per_size: int = 10000,
                               extractor: Optional[Callable] = None,
                               batch_size: int = 50, seed: int = 0,
                               prefix: str = "") -> None:
    """Per-resolution real-data (mu, sigma) precompute
    (fid/get_wikiart_original_scores.py:31-72), saved as {size}_stats.npz."""
    if extractor is None:
        extractor = make_extractor()
    os.makedirs(out_dir, exist_ok=True)
    # class-balanced subset when labels exist (uniform otherwise) — the
    # generated side draws balanced labels (generate_samples), so the real
    # baseline must match that label distribution
    from pgx.data.datasets import _balanced_subset_indices
    labels = getattr(dataset, "labels", None)
    ncls = int(getattr(dataset, "num_classes", 0) or 0)
    for size in sizes:
        images = dataset.at_resolution(size)
        idx = _balanced_subset_indices(
            labels, ncls, min(samples_per_size, len(images)), seed,
            total=len(images))
        mu, sigma = calculate_activation_statistics(images[idx], extractor,
                                                    batch_size)
        with open(os.path.join(out_dir, f"{prefix}{size}_stats.npz"),
                  "wb") as f:
            np.savez(f, mu=mu, sigma=sigma)


def load_real_statistics(out_dir: str, size: int, prefix: str = ""):
    """(mu, sigma) loader (get_original_statistics, same file :13-19)."""
    with np.load(os.path.join(out_dir, f"{prefix}{size}_stats.npz")) as d:
        return d["mu"], d["sigma"]


class TrainingFid:
    """In-training FID: score the (EMA) generator against per-resolution
    real statistics DURING a run, appending to the trial's incremental
    ``fid_score.json`` under the same ``{iter}_g.model`` keys the post-hoc
    sweep uses.  Entries are marked in ``fid_score_meta.json`` as
    in-training: their real baseline is per-stage-resolution and
    class-balanced, which is internally consistent for the training trend
    but NOT comparable to the post-hoc sweep's single native-resolution
    baseline — so a later ``pgx.cli.fid_sweep`` re-scores them under its
    own baseline rather than mixing the two scales in one file.  The
    reference's quality gate is post-hoc only
    (fid/load_*_model_and_fid_it.py); wiring it into the loop
    (``--fid-every``) closes the feedback cycle without a second process.

    Needs an array-backed dataset (per-resolution uint8 caches); real
    statistics are computed once per resolution over a deterministic
    class-balanced subset and cached.
    """

    def __init__(self, dataset, gcfg, num_samples: int = 1024,
                 batch_size: int = 50, extractor: Optional[Callable] = None,
                 max_real: int = 2048, seed: int = 0,
                 gen_cache: Optional[dict] = None):
        if not hasattr(dataset, "at_resolution"):
            raise TypeError(
                "in-training FID needs an array-backed dataset with "
                "per-resolution caches; for folder/WikiArt pipelines run "
                "pgx.cli.fid_sweep post-hoc")
        if extractor is None:
            extractor = make_extractor()
        self.dataset = dataset
        self.gcfg = gcfg
        self.num_samples = int(num_samples)
        self.batch_size = int(batch_size)
        self.extractor = extractor
        self.max_real = int(max_real)
        self.seed = int(seed)
        self._real_stats = {}          # resolution -> (mu, sigma)
        # (step, fading) -> jitted generator; the train loop passes its own
        # sample-grid cache here so each stage's generator is traced once,
        # not once for grids and again for FID
        self._gen_cache = gen_cache if gen_cache is not None else {}

    def real_stats(self, resolution: int):
        if resolution not in self._real_stats:
            sub = self.dataset.subset(self.max_real, seed=self.seed)
            data = sub.at_resolution(resolution)
            self._real_stats[resolution] = calculate_activation_statistics(
                data, self.extractor, self.batch_size)
        return self._real_stats[resolution]

    def score(self, trial_dir: Optional[str], iteration: int, params,
              st) -> float:
        """FID of ``params`` at growth state ``st``; appends to the trial's
        fid_score.json when ``trial_dir`` is given."""
        gkey = (st.step, st.fading)
        if gkey not in self._gen_cache:
            self._gen_cache[gkey] = make_eval_generate(
                self.gcfg, step=st.step, fading=st.fading)
        conditional = self.gcfg.conditioning != "none"
        samples = generate_samples(
            params, self.gcfg, step=st.step, alpha=float(st.alpha),
            fading=st.fading, num_samples=self.num_samples,
            batch_size=self.batch_size, seed=self.seed,
            num_classes=self.gcfg.num_classes if conditional else 0,
            gen=self._gen_cache[gkey])
        mu_g, sig_g = calculate_activation_statistics(
            samples, self.extractor, self.batch_size)
        mu_r, sig_r = self.real_stats(st.resolution)
        fid = calculate_frechet_distance(mu_g, sig_g, mu_r, sig_r)
        if trial_dir is not None:
            name = ckpt.checkpoint_name(iteration, "g")
            append_fid_score(trial_dir, name, fid)
            # mark as in-training so a later post-hoc sweep re-scores it
            # against its own (native-resolution) baseline instead of
            # mixing the two scales in one file
            _append_score(trial_dir, "fid_score_meta.json", name,
                          "in-training")
        return float(fid)
