"""WGAN-GP training engine: one fused, stage-specialized train step.

Reproduces the reference's per-iteration math exactly (canonical copy
train.py:121-169 / proper_cifar_train.py:191-238):

  D loss   = -E[D(real)] + 0.001*E[D(real)^2]          (drift penalty)
             + E[D(fake)]                               (fake term)
             + 10 * E[(||grad_{x_hat} D(x_hat)||_2 - 1)^2]   (WGAN-GP)
  with x_hat = eps*real + (1-eps)*fake, eps ~ U[0,1) per sample.
  G loss   = -E[D_updated(G(z))] using the SAME z as the D step and the
             freshly updated D (reference order of operations).
  EMA      : g_ema = 0.999*g_ema + 0.001*g after every G update
             (accumulate(), train.py:17-22).
  Optimizers: two Adam(lr, betas=(0.0, 0.99), eps=1e-8).

TPU-first design: the reference needs 3 D forwards + 4 backwards (one a
double-backward through conv2d_gradfix) per iteration; here the whole
iteration is ONE jitted function — the gradient penalty's second-order term
is a nested ``jax.grad`` (SURVEY.md section 7, "absorbed by autodiff"), and
XLA fuses/CSEs the shared forwards.  ``step``/``fading``/``update_g`` are
static so each growth stage compiles exactly two graphs (fade / stabilize).

Conditional variants thread the real batch's labels through G, D, and the
x_hat scoring (reference: conditional_proper_cifar_train.py:197-234).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pgx.augment.adaptive import AdaConfig, ada_update, init_ada_state
from pgx.augment.pipe import AugmentConfig, augment_pipe
from pgx.models.config import DiscriminatorConfig, GeneratorConfig
from pgx.models.discriminator import discriminator_apply, init_discriminator
from pgx.models.generator import generator_apply, init_generator

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters of the WGAN-GP loop (reference defaults)."""

    learning_rate: float = 1e-3
    beta1: float = 0.0
    beta2: float = 0.99
    adam_eps: float = 1e-8
    lambda_gp: float = 10.0
    drift: float = 1e-3
    ema_decay: float = 0.999
    n_critic: int = 1
    gp_every: int = 1      # lazy regularization: compute the gradient
                           # penalty every N iterations with lambda scaled
                           # by N (StyleGAN2-style; 1 == reference-exact)
    gp_mode: str = "reverse"
    # How the GP's parameter gradient is computed (identical math, different
    # AD structure):
    #   "reverse" — nested jax.grad: differentiate through the inner
    #               backward (reverse-over-reverse, the torch
    #               double-backward's direct analogue; reference-exact
    #               operation order)
    #   "jvp"     — exact surrogate: with g = grad_x D(x_hat) and
    #               u = stop_grad(2*lambda*(|g|-1)/|g| * g / B), the GP's
    #               theta-gradient equals grad_theta <u, grad_x D(x_hat)>
    #               = grad_theta jvp(D_sum, x_hat, u) — reverse-over-
    #               FORWARD, a leaner graph for XLA (no differentiation
    #               through a transposed conv chain).  Gradient is
    #               mathematically identical (quadratic-surrogate trick);
    #               fp rounding may differ in the last bits.
    remat: bool = False    # jax.checkpoint the G/D forwards: recompute
                           # activations in the backward instead of storing
                           # them — trades ~repeated forward FLOPs for HBM,
                           # enabling larger batches at high resolutions
    remat_policy: str = "full"
    # What remat=True rematerializes:
    #   "full"  — save nothing (blanket jax.checkpoint; max memory savings,
    #             ~0.73x speed at 256px)
    #   "convs" — save conv/matmul outputs, recompute only the cheap
    #             elementwise epilogues/reshapes (jax.checkpoint policy
    #             matching conv_general_dilated/dot_general) — most of the
    #             memory win at a fraction of the recompute FLOPs
    #   "d_only" — blanket-checkpoint only D's forwards (the GP
    #             double-backward path, where activation memory actually
    #             explodes); G keeps its residuals
    weights_cast: str = "site"
    # Where the f32 master params become compute-dtype weights (bf16 runs):
    #   "site" — scale+cast at every conv apply (pgx/core/layers.py); XLA
    #            CSEs identical converts within the step but may also fuse
    #            them into consumers, re-reading f32 weight bytes per pass
    #   "once" — materialize one barrier'd bf16 copy of each param tree at
    #            the top of every forward; all passes read bf16 bytes.
    #            Gradient flow to the f32 masters is unchanged; rounding
    #            differs from "site" only in scale-application order.
    # Measured at the 128px flagship: no throughput difference (the step is
    # MXU-bound, weight bytes are noise — see benchmarks/README.md HBM
    # roofline); kept as the recorded experiment + knob for wider nets.
    fused_g: bool = False
    # FusedProp-style simultaneous update (Tan et al., arXiv:2004.03335):
    # for WGAN the G loss is exactly minus the D loss's fake term, so ONE
    # joint gradient pass through D(G(z)) yields both the D gradient and
    # (negated) the G gradient — the G step's separate D forward and
    # backward-through-D disappear (1.14-1.21x at the 128px flagship).
    # Two documented semantic trades vs the reference (fused_g=False is
    # reference-exact):
    #   * G's gradient is taken against the PRE-update D (simultaneous /
    #     Jacobi update instead of the reference's Gauss-Seidel order);
    #   * with ADA, G's gradient sees the same augmentation draw as the
    #     D step's fake pass instead of a fresh one.
    # The logged g_loss also changes meaning: it is measured against the
    # PRE-update D with the D step's augmentation draw (the alternating
    # step logs it against the post-update D with a fresh draw), so g_loss
    # columns are not comparable across runs differing in fused_g.
    # Convergence-checked on real data (benchmarks/README.md "FusedProp").
    d_concat: bool = False
    # Batched-D dispatch: ONE D forward over concat([real, fake, x_hat])
    # (3B batch; 2B on lazy-GP iterations that skip the penalty) with the
    # minibatch-stddev statistic computed per B-slice
    # (discriminator_apply stddev_groups), so every slice scores exactly
    # as the reference's three separate B-batch calls would — per-slice
    # stddev has no cross-slice coupling, which also makes the GP's
    # hat-slice input gradient identical (proven in
    # tests/test_train_step.py).  Purpose: lift in-kernel MXU efficiency
    # at small per-call batch by tripling the conv batch.  Trade: the
    # GP's inner backward runs over the full 3B batch (its real/fake
    # cotangent blocks are exactly zero but still computed), so this wins
    # only where batching efficiency beats the extra backward width —
    # measured per-stage in benchmarks/README.md "Batched-D dispatch".
    # Reverse GP only; incompatible with fused_g (there the fake slice
    # would carry G-gradients into the concatenated pass).

    def __post_init__(self):
        # argparse choices guard the CLIs; programmatic construction (tests,
        # benchmarks, notebooks) must not silently fall into another branch
        if self.gp_mode not in ("reverse", "jvp"):
            raise ValueError(f"gp_mode must be 'reverse' or 'jvp', "
                             f"got {self.gp_mode!r}")
        if self.weights_cast not in ("site", "once"):
            raise ValueError(f"weights_cast must be 'site' or 'once', "
                             f"got {self.weights_cast!r}")
        if self.remat_policy not in ("full", "convs", "d_only"):
            raise ValueError(f"remat_policy must be 'full', 'convs' or "
                             f"'d_only', got {self.remat_policy!r}")
        if self.gp_every < 1 or self.n_critic < 1:
            raise ValueError("gp_every and n_critic must be >= 1")
        if self.d_concat and self.gp_mode != "reverse":
            raise ValueError("d_concat requires gp_mode='reverse'")
        if self.d_concat and self.fused_g:
            raise ValueError("d_concat is incompatible with fused_g")


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(tc.learning_rate, b1=tc.beta1, b2=tc.beta2,
                      eps=tc.adam_eps)


def init_train_state(key: jax.Array, gcfg: GeneratorConfig,
                     dcfg: DiscriminatorConfig,
                     tc: TrainConfig) -> Dict[str, Any]:
    """Build the full training state pytree.

    The EMA copy is initialized as an exact copy of G
    (accumulate(g_running, generator, 0), train.py:254-259).
    """
    kg, kd, krng = jax.random.split(key, 3)
    g = init_generator(kg, gcfg)
    d = init_discriminator(kd, dcfg)
    opt = make_optimizer(tc)
    return {
        "g": g,
        "d": d,
        "g_ema": jax.tree.map(jnp.copy, g),
        "opt_g": opt.init(g),
        "opt_d": opt.init(d),
        "rng": krng,
        "iteration": jnp.zeros((), jnp.int32),
        "ada": init_ada_state(0.0),
    }


def _ema_update(ema: Params, new: Params, decay: float) -> Params:
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema, new)


def make_train_step_body(gcfg: GeneratorConfig, dcfg: DiscriminatorConfig,
                         tc: TrainConfig, *, step: int, fading: bool,
                         update_g: bool = True, apply_gp: bool = True,
                         stddev_axis_name: Optional[str] = None,
                         augment_cfg: Optional[AugmentConfig] = None,
                         ada_cfg: Optional[AdaConfig] = None,
                         augment_p: float = 1.0):
    """The un-jitted train-step function for one (stage, fade-phase):
    ``fn(state, real, labels, alpha) -> (state, metrics)``.  Jitted
    directly by ``make_train_step``; composed under ``lax.scan`` by
    ``make_train_multi_step``."""
    conditional = gcfg.conditioning != "none"
    opt = make_optimizer(tc)

    def _cast_once(params: Params, cdt) -> Params:
        """weights_cast='once': materialize ONE compute-dtype copy of the
        f32 master params per step (optimization_barrier stops XLA from
        re-fusing the converts into every consumer), so the step's seven
        forward/backward passes read bf16 weight bytes from HBM instead of
        re-reading the f32 masters at each conv.  Gradients still flow to
        the f32 masters through the cast.  Numerics: the equalized-LR
        scale is applied after the rounding instead of before — not
        bitwise the 'site' path, same precision class."""
        cdt = jnp.dtype(cdt)
        if tc.weights_cast != "once" or cdt == jnp.float32:
            return params
        cast = jax.tree.map(
            lambda a: a.astype(cdt)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
        return jax.lax.optimization_barrier(cast)

    def g_fwd(params: Params, z, labels, alpha):
        params = _cast_once(params, gcfg.compute_dtype)
        return generator_apply(params, gcfg, z, labels, step=step,
                               alpha=alpha, fading=fading)

    def _make_d_fwd(groups: int):
        def d_fwd(params: Params, img, labels, alpha):
            params = _cast_once(params, dcfg.compute_dtype)
            out = discriminator_apply(params, dcfg, img, labels, step=step,
                                      alpha=alpha, fading=fading,
                                      stddev_axis_name=stddev_axis_name,
                                      stddev_groups=groups)
            return out.reshape(-1)
        return d_fwd

    d_fwd = _make_d_fwd(1)
    # batched-D dispatch (TrainConfig.d_concat): per-slice-stddev variants
    # for the 3B (real|fake|x_hat) and 2B (real|fake, GP skipped) passes
    d_fwd_cat = {g: _make_d_fwd(g) for g in ((2, 3) if tc.d_concat else ())}

    if tc.remat:
        # rematerialize activations in the backward passes (incl. through
        # the GP's nested grad — jax.checkpoint composes with AD)
        if tc.remat_policy == "convs":
            def _conv_saveable(prim, *_, **__):
                return prim.name in ("conv_general_dilated", "dot_general")
            g_fwd = jax.checkpoint(g_fwd, policy=_conv_saveable)
            d_fwd = jax.checkpoint(d_fwd, policy=_conv_saveable)
            d_fwd_cat = {g: jax.checkpoint(f, policy=_conv_saveable)
                         for g, f in d_fwd_cat.items()}
        elif tc.remat_policy == "d_only":
            d_fwd = jax.checkpoint(d_fwd)
            d_fwd_cat = {g: jax.checkpoint(f) for g, f in d_fwd_cat.items()}
        else:
            assert tc.remat_policy == "full", tc.remat_policy
            g_fwd = jax.checkpoint(g_fwd)
            d_fwd = jax.checkpoint(d_fwd)
            d_fwd_cat = {g: jax.checkpoint(f) for g, f in d_fwd_cat.items()}

    def train_step(state, real, labels, alpha):
        rng = state["rng"]
        rng, kz, keps, kar, kaf, kag = jax.random.split(rng, 6)
        bsz = real.shape[0]
        z = jax.random.normal(kz, (bsz, gcfg.z_dim), jnp.float32)
        lab = labels if conditional else None

        if augment_cfg is not None:
            ada_p = (state["ada"]["p"] if ada_cfg is not None
                     else jnp.float32(augment_p))
            real = augment_pipe(kar, real, augment_cfg, ada_p)
            # StyleGAN2-ADA semantics: every pipeline application draws fresh
            # transforms — the D step's fake pass uses kaf, the G step below
            # redraws with kag rather than optimizing G against the one fixed
            # transform D happened to see (ada/augment.py applies the pipe
            # independently per call; verified by test_train_step.py).
            aug_d_fake = lambda img: augment_pipe(kaf, img, augment_cfg,
                                                  ada_p)
            aug_g_fake = lambda img: augment_pipe(kag, img, augment_cfg,
                                                  ada_p)
        else:
            aug_d_fake = aug_g_fake = lambda img: img

        # --- D update -----------------------------------------------------
        eps = jax.random.uniform(keps, (bsz, 1, 1, 1), real.dtype)
        fused = bool(tc.fused_g) and update_g

        def _concat_pass(pd, fake_live, x_hat):
            """d_concat: ONE batched D forward (3B with GP, 2B without)
            with per-slice stddev; the hat-slice input gradient for the GP
            comes from the same concatenated graph (its real/fake
            cotangent blocks are exactly zero — per-slice stddev is the
            only cross-sample op).  Returns (real_scores, fake_scores,
            gp)."""
            if apply_gp:
                lab_c = (jnp.concatenate([lab] * 3) if lab is not None
                         else None)

                def cat_scores(xh):
                    xcat = jnp.concatenate([real, fake_live, xh], axis=0)
                    return d_fwd_cat[3](pd, xcat, lab_c, alpha)

                grad_x = jax.grad(
                    lambda xh: jnp.sum(cat_scores(xh)[2 * bsz:]))(x_hat)
                scores = cat_scores(x_hat)  # XLA CSEs with the grad's fwd
                acc = jnp.promote_types(grad_x.dtype, jnp.float32)
                norms = jnp.sqrt(jnp.sum(
                    jnp.square(grad_x.astype(acc)), axis=(1, 2, 3)))
                gp = (tc.lambda_gp * tc.gp_every
                      * jnp.mean(jnp.square(norms - 1.0)))
                return scores[:bsz], scores[bsz:2 * bsz], gp
            lab_c = jnp.concatenate([lab] * 2) if lab is not None else None
            scores = d_fwd_cat[2](
                pd, jnp.concatenate([real, fake_live], axis=0), lab_c,
                alpha)
            return scores[:bsz], scores[bsz:], jnp.zeros((), jnp.float32)

        def d_loss_with(pd, fake_live):
            # fake_live carries G-gradients in fused mode; the GP's x_hat
            # never does — the reference interpolates against a detached
            # fake (train.py:141-151), and FusedProp leaves the penalty
            # on D alone
            fake_sg = jax.lax.stop_gradient(fake_live)
            x_hat = eps * real + (1.0 - eps) * fake_sg
            if tc.d_concat:
                real_scores, fake_scores, gp = _concat_pass(
                    pd, fake_live, x_hat)
                aux_scores = real_scores
                real_drifted = (jnp.mean(real_scores)
                                - tc.drift
                                * jnp.mean(jnp.square(real_scores)))
                loss = -real_drifted + jnp.mean(fake_scores) + gp
                aux = {
                    "d_loss": real_drifted - jnp.mean(fake_scores),
                    "grad_penalty": gp,
                    "real_score": jnp.mean(real_scores),
                    "fake_score": jnp.mean(fake_scores),
                }
                return loss, (aux, aux_scores)
            real_scores = d_fwd(pd, real, lab, alpha)
            aux_scores = real_scores
            fake_scores = d_fwd(pd, fake_live, lab, alpha)
            real_drifted = (jnp.mean(real_scores)
                            - tc.drift * jnp.mean(jnp.square(real_scores)))
            if apply_gp and tc.gp_mode == "jvp":
                # Exact JVP-form GP gradient (see TrainConfig.gp_mode).
                # grad_x is needed only to build the stop-gradiented
                # coefficient vector u, so compute it outside the
                # differentiated path (pd_sg) — the backward-of-backward
                # is then dead code XLA eliminates.
                pd_sg = jax.tree.map(jax.lax.stop_gradient, pd)
                grad_x = jax.grad(
                    lambda xh: jnp.sum(d_fwd(pd_sg, xh, lab, alpha)))(x_hat)
                acc = jnp.promote_types(grad_x.dtype, jnp.float32)
                gx = grad_x.astype(acc)
                norms = jnp.sqrt(jnp.sum(jnp.square(gx), axis=(1, 2, 3)))
                lam = tc.lambda_gp * tc.gp_every
                gp_value = lam * jnp.mean(jnp.square(norms - 1.0))
                coef = 2.0 * lam * (norms - 1.0) / (norms * bsz)
                u = jax.lax.stop_gradient(
                    (coef[:, None, None, None] * gx).astype(x_hat.dtype))
                _, jv = jax.jvp(
                    lambda xh: jnp.sum(d_fwd(pd, xh, lab, alpha)),
                    (x_hat,), (u,))
                # value = the true penalty; gradient = the surrogate's
                gp = (jax.lax.stop_gradient(gp_value)
                      + (jv - jax.lax.stop_gradient(jv)))
            elif apply_gp:
                grad_x = jax.grad(
                    lambda xh: jnp.sum(d_fwd(pd, xh, lab, alpha)))(x_hat)
                acc = jnp.promote_types(grad_x.dtype, jnp.float32)
                norms = jnp.sqrt(
                    jnp.sum(jnp.square(grad_x.astype(acc)), axis=(1, 2, 3)))
                # lazy regularization scales lambda by the interval
                gp = (tc.lambda_gp * tc.gp_every
                      * jnp.mean(jnp.square(norms - 1.0)))
            else:
                gp = jnp.zeros((), jnp.float32)
            loss = -real_drifted + jnp.mean(fake_scores) + gp
            aux = {
                "d_loss": real_drifted - jnp.mean(fake_scores),
                "grad_penalty": gp,
                "real_score": jnp.mean(real_scores),
                "fake_score": jnp.mean(fake_scores),
            }
            return loss, (aux, aux_scores)

        if fused:
            # FusedProp (TrainConfig.fused_g): one joint gradient pass
            # through D(G(z)) produces the D gradient AND the (negated) G
            # gradient — the fake forward is differentiated w.r.t. both
            # parameter sets at once instead of once per network
            def joint_loss_fn(pd, pg):
                return d_loss_with(pd, aug_d_fake(g_fwd(pg, z, lab, alpha)))

            (d_total, (d_aux, real_logits)), (d_grads, g_grads_neg) = (
                jax.value_and_grad(joint_loss_fn, argnums=(0, 1),
                                   has_aux=True)(state["d"], state["g"]))
        else:
            # NOTE (measured, round 3): do NOT run this G forward through
            # the fused Pallas conv+epilogue kernel even though it is
            # forward-only (stop_gradient).  XLA CSEs this subgraph with
            # the G update's forward below (same params, same z), so it is
            # already FREE when update_g; a different kernel here breaks
            # the CSE and costs 6% end-to-end (130.2 -> 122.7 img/s at the
            # 128px flagship).
            fake = jax.lax.stop_gradient(
                aug_d_fake(g_fwd(state["g"], z, lab, alpha)))
            (d_total, (d_aux, real_logits)), d_grads = jax.value_and_grad(
                d_loss_with, has_aux=True)(state["d"], fake)
        d_updates, opt_d = opt.update(d_grads, state["opt_d"], state["d"])
        new_d = optax.apply_updates(state["d"], d_updates)

        ada_state = state["ada"]
        if augment_cfg is not None and ada_cfg is not None:
            ada_state = ada_update(ada_state,
                                   jax.lax.stop_gradient(real_logits),
                                   ada_cfg, bsz)

        metrics = dict(d_aux)
        metrics["d_total"] = d_total
        # report the probability actually APPLIED: the controller state when
        # ADA drives it, the fixed augment_p when augmentation runs without
        # a controller (ada_state["p"] would log a misleading 0.0 there)
        metrics["ada_p"] = (jnp.float32(augment_p)
                            if augment_cfg is not None and ada_cfg is None
                            else ada_state["p"])
        # r_t overfitting signal (mean sign of D's real logits, ada/
        # adapt_augm.py:41): logged so ADA-p trajectories can be explained.
        metrics["ada_r"] = jnp.mean(jnp.sign(real_logits))

        # --- G update (every n_critic iters; same z, updated D — or, in
        # fused mode, the joint pass's negated gradient vs pre-update D) ---
        if update_g:
            if fused:
                g_grads = jax.tree.map(jnp.negative, g_grads_neg)
                # metric caveat: in fused mode the logged g_loss is
                # -mean(D_pre(aug_d(G(z)))) — the PRE-update D with the D
                # step's augmentation draw — whereas the alternating step
                # logs -mean(D_post(aug_g(G(z)))).  Both measure "how well
                # G fools D" but are not comparable across runs that differ
                # in fused_g (see benchmarks/README.md FusedProp notes).
                g_loss = -d_aux["fake_score"]
            else:
                def g_loss_fn(pg):
                    imgs = aug_g_fake(g_fwd(pg, z, lab, alpha))
                    return -jnp.mean(d_fwd(new_d, imgs, lab, alpha))

                g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state["g"])
            g_updates, opt_g = opt.update(g_grads, state["opt_g"], state["g"])
            new_g = optax.apply_updates(state["g"], g_updates)
            g_ema = _ema_update(state["g_ema"], new_g, tc.ema_decay)
            metrics["g_loss"] = g_loss
        else:
            new_g, opt_g, g_ema = state["g"], state["opt_g"], state["g_ema"]
            metrics["g_loss"] = jnp.zeros((), jnp.float32)

        new_state = {
            "g": new_g, "d": new_d, "g_ema": g_ema,
            "opt_g": opt_g, "opt_d": opt_d,
            "rng": rng,
            "iteration": state["iteration"] + 1,
            "ada": ada_state,
        }
        return new_state, metrics

    return train_step


def make_train_step(gcfg: GeneratorConfig, dcfg: DiscriminatorConfig,
                    tc: TrainConfig, *, step: int, fading: bool,
                    update_g: bool = True, apply_gp: bool = True,
                    stddev_axis_name: Optional[str] = None,
                    augment_cfg: Optional[AugmentConfig] = None,
                    ada_cfg: Optional[AdaConfig] = None,
                    augment_p: float = 1.0,
                    donate: bool = True):
    """Build the jitted train step for one (stage, fade-phase).

    Returns ``fn(state, real, labels, alpha) -> (state, metrics)``.
    ``real`` is NHWC in [-1, 1] at this stage's resolution; ``labels`` may be
    None for unconditional configs; ``alpha`` is a traced scalar.

    When ``augment_cfg`` is given, the ADA pipeline augments every image D
    sees (reals, fakes, and the x_hat interpolants are built from augmented
    endpoints), differentiable through to G.  With ``ada_cfg`` the
    adaptive-p controller drives the probability from the real logits — the
    loop the reference shipped but never wired in (SURVEY.md section 2.4);
    without it the fixed ``augment_p`` applies (the controller state's p
    starts at 0, which would make augment_cfg-alone a silent no-op).
    """
    train_step = make_train_step_body(
        gcfg, dcfg, tc, step=step, fading=fading, update_g=update_g,
        apply_gp=apply_gp, stddev_axis_name=stddev_axis_name,
        augment_cfg=augment_cfg, ada_cfg=ada_cfg, augment_p=augment_p)
    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_train_multi_step(gcfg: GeneratorConfig, dcfg: DiscriminatorConfig,
                          tc: TrainConfig, *, step: int, fading: bool,
                          k: int,
                          stddev_axis_name: Optional[str] = None,
                          augment_cfg: Optional[AugmentConfig] = None,
                          ada_cfg: Optional[AdaConfig] = None,
                          augment_p: float = 1.0,
                          donate: bool = True):
    """``k`` reference iterations in ONE device dispatch.

    At the early growth stages the per-step device time is tiny (a 4px
    step is well under a millisecond of compute) and throughput is set by
    host dispatch — the per-call overhead the reference pays as Python
    loop + DataLoader + ``.to(device)`` every iteration
    (train.py:113-155).  TPU-natively the fix is structural: roll ``k``
    consecutive iterations into one jitted ``lax.scan`` so the host
    dispatches once per ``k`` steps and XLA pipelines the whole window
    on-device.  The scan body IS the single-step body
    (``make_train_step_body``), so the math and RNG stream are the
    single-step path's exactly (parity-tested in
    tests/test_train_step.py).

    Constraints (the loop falls back to single steps otherwise):
    ``n_critic == 1`` (the reference's practical setting — every script
    hardcodes it, mnist_train.py:53) and ``k % gp_every == 0`` with the
    window starting on a gp_every boundary — lazy-GP windows scan over
    ``k/gp_every`` groups of one GP step + ``gp_every-1`` plain steps.

    Returns ``fn(state, reals, labels, alphas) -> (state, summed_metrics)``
    where ``reals`` is a k-tuple of (B, H, W, C) batches (stacked
    on-device — cheap at the resolutions this path targets), ``labels``
    a k-tuple or None, ``alphas`` a (k,) float array; ``summed_metrics``
    is the elementwise SUM over the k iterations (the loop's accumulator
    granularity; grad_penalty sums over the k/gp_every applications).
    """
    if tc.n_critic != 1:
        raise ValueError("multi-step dispatch requires n_critic == 1")
    if k < 1 or k % tc.gp_every != 0:
        raise ValueError(f"k={k} must be a positive multiple of "
                         f"gp_every={tc.gp_every}")
    conditional = gcfg.conditioning != "none"
    mk = lambda gp: make_train_step_body(
        gcfg, dcfg, tc, step=step, fading=fading, update_g=True,
        apply_gp=gp, stddev_axis_name=stddev_axis_name,
        augment_cfg=augment_cfg, ada_cfg=ada_cfg, augment_p=augment_p)
    body_gp = mk(True)
    body_nogp = mk(False) if tc.gp_every > 1 else None
    g = tc.gp_every

    def multi_step(state, reals, labels, alphas):
        grp = lambda x: x.reshape((k // g, g) + x.shape[1:])
        xs_r = grp(jnp.stack(reals))
        xs_a = grp(jnp.asarray(alphas, jnp.float32))
        xs = ((xs_r, grp(jnp.stack(labels)), xs_a) if conditional
              else (xs_r, xs_a))

        def scan_body(carry, xs_t):
            r, lab, a = xs_t if conditional else (xs_t[0], None, xs_t[1])
            msum = None
            for j in range(g):     # one GP step + g-1 plain steps, unrolled
                body = body_gp if j == 0 else body_nogp
                carry, m = body(carry, r[j],
                                lab[j] if conditional else None, a[j])
                msum = (m if msum is None
                        else jax.tree.map(jnp.add, msum, m))
            return carry, msum

        state, ms = jax.lax.scan(scan_body, state, xs)
        return state, jax.tree.map(lambda a: jnp.sum(a, axis=0), ms)

    donate_argnums = (0,) if donate else ()
    return jax.jit(multi_step, donate_argnums=donate_argnums)


def make_eval_generate(gcfg: GeneratorConfig, *, step: int,
                       fading: bool = False, output: str = "float"):
    """Jitted sampling from (usually) the EMA generator — the one sampling
    wrapper shared by the train loop, the FID sweep and the serving path.

    ``output='uint8'`` applies the torchvision-style [-1, 1] -> [0, 255]
    quantization ON DEVICE (bit-matching ``pgx.utils.png.to_uint8``), so a
    serving host fetches 4x less data per batch — on the axon relay the
    transfer is a real fraction of per-request latency (benchmarks/
    sampling_bench.py --fetch uint8 vs float)."""
    # NOTE (measured, round 3): sampling is forward-only, but scoping the
    # fused Pallas conv+epilogue kernel here LOSES in-situ (19.1 -> 29.5 ms
    # per 64-image 128px G forward) despite winning per-shape microbenches —
    # the kernel boundary blocks XLA's cross-op scheduling, the same
    # failure mode as round 2's standalone epilogue kernel.  It stays
    # opt-in via pgx.core.layers.fused_conv_scope.
    if output not in ("float", "uint8"):
        raise ValueError(f"output must be 'float' or 'uint8', got {output!r}")

    @jax.jit
    def generate(params, z, labels=None, alpha=1.0):
        lab = labels if gcfg.conditioning != "none" else None
        img = generator_apply(params, gcfg, z, lab, step=step,
                              alpha=alpha, fading=fading)
        if output == "uint8":
            x = (jnp.clip(img.astype(jnp.float32), -1.0, 1.0) + 1.0) * 0.5
            img = jnp.floor(x * 255.0 + 0.5).astype(jnp.uint8)
        return img
    return generate
