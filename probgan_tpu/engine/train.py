"""Training steps: one jitted G/D adversarial step for each model family.

The reference's trainer (``prot_b_gan.py``) is missing from its repo — only
its artifact schema survives (SURVEY.md §0.1, §2.3 C17) — so the losses here
are this framework's documented choices:

- Non-saturating logistic GAN losses (softplus form) for both families.
- ProGAN: plain NS-GAN on images at the active (stage, alpha)
  (BASELINE config 5 requires exactly "one G/D training step").
- KG-GAN: the discriminator separates true tails from generated tails for
  the same (h, r); the generator — trained JOINTLY with the entity/relation
  tables — fools the discriminator and minimizes a full-softmax ranking
  cross-entropy over the entity table (temperature-scaled cosine logits,
  gradients flowing to both the prediction and the table, i.e. a softmax
  classifier whose class embeddings are the entity table) plus a cosine
  reconstruction pull. The cross-entropy is the direct differentiable
  surrogate of the Hit@10 metric the checkpoints carry
  (pro_b_gan_infer.py:110).

Everything is a pure (state, batch, key) -> (state, metrics) function built
on optax, so the same step jits single-chip and pjits over a data-parallel
mesh (see parallel/ and __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from probgan_tpu.models import kg_gan, pro_gan
from probgan_tpu.ops import rank as rank_ops


def _softplus(x):
    return jax.nn.softplus(x)


# ---------------------------------------------------------------------------
# ProGAN (image) step
# ---------------------------------------------------------------------------

class ProGANTrainState(NamedTuple):
    g_params: dict
    d_params: dict
    g_opt: optax.OptState
    d_opt: optax.OptState
    # Exponential moving average of g_params (classic progressive-GAN
    # practice: the EMA generator renders markedly smoother samples than the
    # raw adversarial iterate). Serving prefers it when present
    # (core/image_checkpoint.py). Trails this NamedTuple so pre-EMA
    # train_state files upgrade by key injection (cli/train_image.py).
    g_ema: dict


def progan_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    # ProGAN's Adam settings (b1=0 stabilizes adversarial training).
    return optax.adam(lr, b1=0.0, b2=0.99, eps=1e-8)


def progan_init_state(key: jax.Array, config: pro_gan.ProGANConfig, lr: float = 1e-3):
    kg, kd = jax.random.split(key)
    g_params = pro_gan.init_generator(kg, config)
    d_params = pro_gan.init_discriminator(kd, config)
    opt = progan_optimizer(lr)
    return ProGANTrainState(
        g_params, d_params, opt.init(g_params), opt.init(d_params), g_params
    )


def _progan_loss_fns(g_ref_params, config, stage, alpha, dtype, packed_fake,
                     remat, packed_d, packed_g, packed_train_mode,
                     axis_names, r1_gamma=0.0):
    """The two loss closures both step variants differentiate.

    ``d_loss_fn(d_params, real, z)``: non-saturating D loss; the fake batch
    renders from ``g_ref_params`` (captured — constant w.r.t. d_params).
    ``g_loss_fn(g_params, d_params, z)``: the fool-D generator loss against
    the given (already-updated) discriminator.

    ``r1_gamma > 0`` adds the R1 zero-centered gradient penalty on reals
    (gamma/2 * E[||∇_x D(x)||²], Mescheder et al. 2018 — the standard
    progressive/style-GAN D regularizer). Differentiating it w.r.t.
    d_params is a second-order use of D, which the packed kernels' custom
    VJPs do not support (a custom_vjp backward is not itself
    differentiable), so the penalty term always evaluates D through the
    XLA path; the main loss terms keep whatever path was configured. With
    lazy application (cli --r1_every) callers pre-scale gamma by the
    interval, the usual convention."""
    _d_train_mode = packed_train_mode
    _g_train_mode = packed_train_mode if packed_g else None

    def _r1_penalty(d_params, real_images):
        def d_sum(imgs):
            return jnp.sum(
                pro_gan.discriminator_apply(
                    d_params, imgs, config, stage, alpha, dtype,
                    remat=remat, stddev_axis=axis_names,
                ).astype(jnp.float32)
            )

        g = jax.grad(d_sum)(real_images.astype(jnp.float32))
        return jnp.mean(jnp.sum(jnp.square(g), axis=(1, 2, 3)))

    def d_loss_fn(d_params, real_images, z):
        fake = pro_gan.generator_rgb(
            g_ref_params, z, config, stage, alpha, dtype,
            packed=packed_fake, packed_mode=_g_train_mode,
        )
        # Logits promote to fp32 before the loss math: with dtype=bfloat16
        # the convs run bf16 on the MXU but the softplus/mean (and therefore
        # the loss scale driving the gradients) stays fp32 — the standard
        # mixed-precision recipe. No-op for fp32 training.
        real_logits = pro_gan.discriminator_apply(
            d_params, real_images, config, stage, alpha, dtype, remat=remat,
            packed=packed_d, packed_mode=_d_train_mode if packed_d else None,
            stddev_axis=axis_names,
        ).astype(jnp.float32)
        fake_logits = pro_gan.discriminator_apply(
            d_params, jax.lax.stop_gradient(fake), config, stage, alpha, dtype,
            remat=remat,
            packed=packed_d, packed_mode=_d_train_mode if packed_d else None,
            stddev_axis=axis_names,
        ).astype(jnp.float32)
        loss = jnp.mean(_softplus(-real_logits)) + jnp.mean(_softplus(fake_logits))
        if r1_gamma > 0.0:
            loss = loss + 0.5 * r1_gamma * _r1_penalty(d_params, real_images)
        return loss, (jnp.mean(real_logits), jnp.mean(fake_logits))

    def g_loss_fn(g_params, d_params, z):
        fake = pro_gan.generator_rgb(
            g_params, z, config, stage, alpha, dtype, remat=remat,
            packed_mode=_g_train_mode,
        )
        fake_logits = pro_gan.discriminator_apply(
            d_params, fake, config, stage, alpha, dtype, remat=remat,
            packed=packed_d, packed_mode=_d_train_mode if packed_d else None,
            stddev_axis=axis_names,
        ).astype(jnp.float32)
        return jnp.mean(_softplus(-fake_logits))

    return d_loss_fn, g_loss_fn


@partial(
    jax.jit,
    static_argnames=("config", "stage", "lr", "dtype", "ema_beta",
                     "packed_fake", "remat", "packed_d", "packed_g",
                     "packed_train_mode", "axis_names", "r1_gamma"),
)
def progan_train_step(
    state: ProGANTrainState,
    real_images: jax.Array,
    z: jax.Array,
    alpha: jax.Array,
    config: pro_gan.ProGANConfig,
    stage: int,
    lr: float = 1e-3,
    dtype=jnp.float32,
    ema_beta: float = 0.999,
    packed_fake: bool = False,
    remat: bool = True,
    packed_d: bool = False,
    packed_g: bool = False,
    packed_train_mode: str = "default",
    axis_names: tuple | None = None,
    r1_gamma: float = 0.0,
):
    """One non-saturating G/D step at (stage, alpha). ``real_images`` are
    float in [-1, 1] at the stage's resolution; ``z`` is [B, latent_dim].
    ``ema_beta`` is the generator-EMA decay (0 tracks the raw iterate).

    ``packed_fake``: render the D-step's fake batch with the packed Pallas
    inference kernels. Legal despite the kernels defining no VJP: that
    forward sits behind stop_gradient and is constant w.r.t. d_params, so
    no tangents ever flow through it; the differentiated G forward in the
    G step always uses the XLA path.

    ``remat``: checkpoint each stage block under the conv-saved policy
    (models/pro_gan._REMAT_POLICY). Rematerialization never changes
    numerics — only the memory/recompute trade. Measured at 1024² b2 bf16
    the policy remat is as fast as no remat at all (0.410 vs 0.414 s — the
    rematerialized elementwise chains are bandwidth-cheap and overlap) while
    bounding the tape, so True is the right default at every size; False
    exists for experiments.

    ``packed_d``: run the lane-wasteful leading D stages (nf <= 64) on the
    phase-blocked Pallas kernels for forward AND backward (custom VJPs in
    ops/packed_vjp.py). Kernel grade is "default" (1-pass bf16 dots) —
    the same MXU grade the XLA training path uses for both fp32
    (Precision.DEFAULT) and bf16 dtypes, so the loss math class is
    unchanged; only the layout (and the lane/HBM waste) differs.

    ``packed_g``: likewise for the GENERATOR's late-stage convs — every
    generator_rgb in the step (the d-step's fake render and the
    differentiated g-step forward) runs them on the kernels via the
    lrelu+PixelNorm custom VJPs (toRGB/blend stay XLA). Supersedes
    ``packed_fake`` when set (same kernels, plus the backward).

    ``packed_train_mode``: MXU grade of the packed kernels' dots when
    packed_d/packed_g engage — "default" (1 bf16 pass, the same class as
    XLA's Precision.DEFAULT and the measured-fast choice), "mid" (2-term
    hi/lo split: weight rounding removed, ~2^-9 relative/dot), or "high"
    (3-pass fp32 emulation). The custom VJPs propagate the mode to both
    backward convs; wgrad promotes split modes to HIGHEST
    (ops/packed_vjp.py). Ignored on the XLA path.

    ``axis_names``: set when this step runs INSIDE ``jax.shard_map`` with the
    batch sharded over the named mesh axes (parallel/dp_train.py). Gradients
    and reported metrics are pmean'd over the axes — with equal shard sizes
    that is exactly the gradient of the global-batch loss — and the
    discriminator's minibatch-stddev statistics are computed over the GLOBAL
    batch, so the math matches single-device training on the concatenated
    batch. Per-shard optimizer updates are then identical, keeping params
    replicated without any explicit broadcast. None (the default) is the
    single-device/GSPMD path, where XLA inserts any needed collectives
    itself."""
    opt = progan_optimizer(lr)
    _pmean = (
        (lambda t: jax.lax.pmean(t, axis_names))
        if axis_names is not None else (lambda t: t)
    )
    d_loss_fn, g_loss_fn = _progan_loss_fns(
        state.g_params, config, stage, alpha, dtype, packed_fake, remat,
        packed_d, packed_g, packed_train_mode, axis_names, r1_gamma,
    )

    (d_loss, (real_mean, fake_mean)), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True
    )(state.d_params, real_images, z)
    d_grads = _pmean(d_grads)
    d_loss, real_mean, fake_mean = _pmean((d_loss, real_mean, fake_mean))
    d_updates, d_opt = opt.update(d_grads, state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, d_updates)

    g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params, d_params, z)
    g_grads = _pmean(g_grads)
    g_loss = _pmean(g_loss)
    g_updates, g_opt = opt.update(g_grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, g_updates)
    if ema_beta == 0.0:  # static: EMA disabled — alias, don't materialize
        g_ema = g_params
    else:
        g_ema = jax.tree.map(
            lambda e, p: ema_beta * e + (1.0 - ema_beta) * p,
            state.g_ema, g_params,
        )

    metrics = {
        "d_loss": d_loss,
        "g_loss": g_loss,
        "real_logit": real_mean,
        "fake_logit": fake_mean,
    }
    return ProGANTrainState(g_params, d_params, g_opt, d_opt, g_ema), metrics


@partial(
    jax.jit,
    static_argnames=("config", "stage", "lr", "dtype", "ema_beta",
                     "packed_fake", "remat", "packed_d", "packed_g",
                     "packed_train_mode", "r1_gamma"),
)
def progan_train_step_accum(
    state: ProGANTrainState,
    real_images: jax.Array,
    z: jax.Array,
    alpha: jax.Array,
    config: pro_gan.ProGANConfig,
    stage: int,
    lr: float = 1e-3,
    dtype=jnp.float32,
    ema_beta: float = 0.999,
    packed_fake: bool = False,
    remat: bool = True,
    packed_d: bool = False,
    packed_g: bool = False,
    packed_train_mode: str = "default",
    r1_gamma: float = 0.0,
):
    """progan_train_step with gradient accumulation: ``real_images`` is
    [A, B, R, R, 3] and ``z`` is [A, B, latent_dim] — A microbatches whose
    gradients average (lax.scan, one live microbatch of activations) before
    each single optimizer update, giving an effective batch of A*B at the
    peak memory of B. The use case is HBM-bound resolutions: 1024² training
    fits batch 2 (BASELINE config 5), so large-batch dynamics need
    accumulation rather than a bigger device batch.

    Same math as one step on the concatenated A*B batch, with one
    deliberate exception: the discriminator's minibatch-stddev statistics
    are per-MICROBATCH (the standard accumulation trade — computing them
    globally would need a second pass over all microbatches). Both G and D
    see every microbatch before their one update; the D update still lands
    before the G gradients are taken, preserving the alternating-step
    order."""
    opt = progan_optimizer(lr)
    d_loss_fn, g_loss_fn = _progan_loss_fns(
        state.g_params, config, stage, alpha, dtype, packed_fake, remat,
        packed_d, packed_g, packed_train_mode, None, r1_gamma,
    )
    n_accum = real_images.shape[0]
    zeros_d = jax.tree.map(jnp.zeros_like, state.d_params)

    def d_micro(acc, mb):
        real_mb, z_mb = mb
        (loss, aux), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, real_mb, z_mb
        )
        g_acc, l_acc, a_acc = acc
        return (
            jax.tree.map(jnp.add, g_acc, grads),
            l_acc + loss,
            (a_acc[0] + aux[0], a_acc[1] + aux[1]),
        ), None

    (d_grads, d_loss, (real_mean, fake_mean)), _ = jax.lax.scan(
        d_micro,
        (zeros_d, jnp.float32(0.0), (jnp.float32(0.0), jnp.float32(0.0))),
        (real_images, z),
    )
    inv = 1.0 / n_accum
    d_grads = jax.tree.map(lambda g: g * inv, d_grads)
    d_loss, real_mean, fake_mean = (
        d_loss * inv, real_mean * inv, fake_mean * inv
    )
    d_updates, d_opt = opt.update(d_grads, state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, d_updates)

    zeros_g = jax.tree.map(jnp.zeros_like, state.g_params)

    def g_micro(acc, z_mb):
        loss, grads = jax.value_and_grad(g_loss_fn)(
            state.g_params, d_params, z_mb
        )
        g_acc, l_acc = acc
        return (jax.tree.map(jnp.add, g_acc, grads), l_acc + loss), None

    (g_grads, g_loss), _ = jax.lax.scan(
        g_micro, (zeros_g, jnp.float32(0.0)), z
    )
    g_grads = jax.tree.map(lambda g: g * inv, g_grads)
    g_loss = g_loss * inv
    g_updates, g_opt = opt.update(g_grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, g_updates)
    if ema_beta == 0.0:
        g_ema = g_params
    else:
        g_ema = jax.tree.map(
            lambda e, p: ema_beta * e + (1.0 - ema_beta) * p,
            state.g_ema, g_params,
        )

    metrics = {
        "d_loss": d_loss,
        "g_loss": g_loss,
        "real_logit": real_mean,
        "fake_logit": fake_mean,
    }
    return ProGANTrainState(g_params, d_params, g_opt, d_opt, g_ema), metrics


# ---------------------------------------------------------------------------
# KG-GAN (link prediction) step
# ---------------------------------------------------------------------------

class KGTrainState(NamedTuple):
    node_emb: jax.Array       # [N, D] trainable entity table
    rel_emb: jax.Array        # [R, D] trainable relation table
    g_params: dict
    d_params: dict
    g_opt: optax.OptState     # optimizes (g_params, node_emb, rel_emb)
    d_opt: optax.OptState     # optimizes d_params


def kg_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    return optax.adam(lr)


def kg_init_state(
    key: jax.Array,
    num_entities: int,
    num_relations: int,
    embed_dim: int = 128,
    noise_dim: int = 64,
    hidden_dim: int = 1024,
    lr: float = 1e-3,
) -> KGTrainState:
    kn, kr, kg, kd = jax.random.split(key, 4)
    node_emb = jax.random.normal(kn, (num_entities, embed_dim)) * 0.1
    rel_emb = jax.random.normal(kr, (num_relations, embed_dim)) * 0.1
    g_params = kg_gan.init_generator(kg, embed_dim, noise_dim)
    d_params = kg_gan.init_discriminator(kd, embed_dim, hidden_dim)
    opt = kg_optimizer(lr)
    return KGTrainState(
        node_emb,
        rel_emb,
        g_params,
        d_params,
        opt.init((g_params, node_emb, rel_emb)),
        opt.init(d_params),
    )


_CE_TEMPERATURE = 0.1


def _rank_ce(pred: jax.Array, node_emb: jax.Array, t_idx: jax.Array) -> jax.Array:
    """Full-softmax cross-entropy of temperature-scaled cosine logits against
    the true tail — the differentiable surrogate of Hit@k ranking."""
    logits = rank_ops.cosine_scores(
        rank_ops.l2_normalize(pred), rank_ops.l2_normalize(node_emb),
        precision=jax.lax.Precision.DEFAULT,
    ) / _CE_TEMPERATURE
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, t_idx[:, None], axis=1))


def _sampled_rank_ce(
    pred: jax.Array, node_emb: jax.Array, t_idx: jax.Array, neg_ids: jax.Array
) -> jax.Array:
    """Sampled-softmax ranking cross-entropy: the full [B, N] logit matrix is
    O(B*N) per step (fine at N=5k, ruinous at N=1M); here the softmax runs
    over {true tail} U {S shared sampled negatives}. Negatives that collide
    with a row's true tail are masked so the label class is unique."""
    pred_n = rank_ops.l2_normalize(pred)
    true_emb = rank_ops.l2_normalize(node_emb[t_idx])        # [B, D]
    neg_emb = rank_ops.l2_normalize(node_emb[neg_ids])       # [S, D]
    true_logit = jnp.sum(pred_n * true_emb, axis=1, keepdims=True)
    neg_logits = rank_ops.cosine_scores(
        pred_n, neg_emb, precision=jax.lax.Precision.DEFAULT
    )  # [B, S]
    collide = neg_ids[None, :] == t_idx[:, None]
    neg_logits = jnp.where(collide, -jnp.inf, neg_logits)
    logits = jnp.concatenate([true_logit, neg_logits], axis=1) / _CE_TEMPERATURE
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])


@partial(
    jax.jit,
    static_argnames=("lr", "cosine_weight", "ce_weight", "adv_weight"),
)
def kg_train_step(
    state: KGTrainState,
    triplets: jax.Array,  # [B, 3] int (h, r, t) positive triplets
    key: jax.Array,
    lr: float = 1e-3,
    cosine_weight: float = 1.0,
    ce_weight: float = 1.0,
    adv_weight: float = 0.1,
    negatives: jax.Array | None = None,   # [B, 2] (corrupt tail, corrupt rel)
    ce_negatives: jax.Array | None = None,  # [S] sampled-softmax entity ids
):
    """One adversarial step on a batch of positive triplets.

    The discriminator separates true triplets from THREE kinds of negatives —
    generator fakes (h, r, G(h,r,z)), corrupted tails (h, r, t'), and
    corrupted relations (h, r', t) — with the tables frozen. A D trained only
    on generator fakes never sees false-but-real-embedding triples, which
    miscalibrates exactly the scorer ``analyze_relations`` relies on
    (pro_b_gan_infer.py:290-302 varies r per pair). ``negatives`` carries the
    corrupted ids, host-sampled by the native loader
    (probgan_tpu/native sample_negatives) in the trainer; None keeps the
    fakes-only round-1 loss.

    Then G and the embedding tables train jointly on fool-D + ranking
    cross-entropy + cosine reconstruction. ``ce_negatives`` switches the CE
    from full-softmax over all N entities (O(B*N) per step) to a sampled
    softmax over S shared negatives — required at production N."""
    opt = kg_optimizer(lr)
    noise_dim = kg_gan.generator_dims(state.g_params)[1]
    z = jax.random.normal(key, (triplets.shape[0], noise_dim), dtype=jnp.float32)
    h_idx, r_idx, t_idx = triplets[:, 0], triplets[:, 1], triplets[:, 2]

    # --- D step (tables frozen) ---
    def d_loss_fn(d_params):
        h = state.node_emb[h_idx]
        r = state.rel_emb[r_idx]
        t = state.node_emb[t_idx]
        fake_t = jax.lax.stop_gradient(
            kg_gan.generator_apply(state.g_params, h, r, z)
        )
        real_logits = kg_gan.discriminator_apply(d_params, h, r, t)
        fake_logits = kg_gan.discriminator_apply(d_params, h, r, fake_t)
        neg_terms = [_softplus(fake_logits)]
        if negatives is not None:
            t_neg = state.node_emb[negatives[:, 0]]
            r_neg = state.rel_emb[negatives[:, 1]]
            neg_terms.append(
                _softplus(kg_gan.discriminator_apply(d_params, h, r, t_neg))
            )
            neg_terms.append(
                _softplus(kg_gan.discriminator_apply(d_params, h, r_neg, t))
            )
        adv = jnp.mean(_softplus(-real_logits)) + jnp.mean(
            jnp.stack([jnp.mean(term) for term in neg_terms])
        )
        return adv, (jnp.mean(real_logits), jnp.mean(fake_logits))

    (d_loss, (real_mean, fake_mean)), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True
    )(state.d_params)
    d_updates, d_opt = opt.update(d_grads, state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, d_updates)

    # --- G + tables step ---
    def g_loss_fn(g_and_tables):
        g_params, node_emb, rel_emb = g_and_tables
        h, r, t = node_emb[h_idx], rel_emb[r_idx], node_emb[t_idx]
        fake_t = kg_gan.generator_apply(g_params, h, r, z)
        fake_logits = kg_gan.discriminator_apply(d_params, h, r, fake_t)
        adv = jnp.mean(_softplus(-fake_logits))
        cos = jnp.mean(rank_ops.cosine_similarity(fake_t, t))
        if ce_negatives is not None:
            ce = _sampled_rank_ce(fake_t, node_emb, t_idx, ce_negatives)
        else:
            ce = _rank_ce(fake_t, node_emb, t_idx)
        # adv is down-weighted by default: the ranking cross-entropy is the
        # quality-bearing objective; an unconstrained discriminator's
        # gradient otherwise swamps it (g_loss diverges, Hit@10 stalls).
        return adv_weight * adv - cosine_weight * cos + ce_weight * ce, cos

    g_and_tables = (state.g_params, state.node_emb, state.rel_emb)
    (g_loss, g_cos), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        g_and_tables
    )
    g_updates, g_opt = opt.update(g_grads, state.g_opt, g_and_tables)
    g_params, node_emb, rel_emb = optax.apply_updates(g_and_tables, g_updates)

    metrics = {
        "d_loss": d_loss,
        "g_loss": g_loss,
        "real_logit": real_mean,
        "fake_logit": fake_mean,
        "gen_cosine": g_cos,
    }
    return (
        KGTrainState(node_emb, rel_emb, g_params, d_params, g_opt, d_opt),
        metrics,
    )


@partial(jax.jit, static_argnames=("k",))
def kg_eval_hits(
    g_params, node_emb, rel_emb, triplets, z, k: int = 10
) -> jax.Array:
    """Hit@k of the true tail under generator cosine ranking — the quality
    metric the reference carries in checkpoints (pro_b_gan_infer.py:110).
    Rank = 1 + #entities scoring strictly higher than the true tail."""
    h = node_emb[triplets[:, 0]]
    r = rel_emb[triplets[:, 1]]
    pred = kg_gan.generator_apply(g_params, h, r, z)
    pred_n = rank_ops.l2_normalize(pred)
    table_n = rank_ops.l2_normalize(node_emb)
    sims = rank_ops.cosine_scores(pred_n, table_n)  # [B, N]
    true_sim = jnp.take_along_axis(sims, triplets[:, 2:3], axis=1)
    rank = 1 + jnp.sum(sims > true_sim, axis=1)
    return jnp.mean((rank <= k).astype(jnp.float32))
