"""Gradient parity for the packed-kernel custom VJPs (ops/packed_vjp.py)
against jax.grad of the XLA reference chain, in interpret mode.

At mode="highest" both forward and backward run fp32-exact dots, so the
gradients must match the XLA HIGHEST reference to float tolerance; the
training mode ("default") is checked by cosine similarity (its dots round
bf16 like the forward's)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probgan_tpu.models import pro_gan
from probgan_tpu.ops import packed_vjp, pallas_packed as pk
from tests.test_pallas_packed import _rand, phase_block, unphase


def _ref_conv_lrelu(x_nhwc, w, b):
    y = jax.lax.conv_general_dilated(
        x_nhwc, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b
    return pro_gan.lrelu(y)


def _ref_convpool_lrelu(x_nhwc, w, b):
    return pro_gan.downsample_avg_2x(_ref_conv_lrelu(x_nhwc, w, b))


def test_conv_lrelu_mid_mode_wgrad_promoted():
    """Split modes ("mid"/"high") have no wgrad split implementation; the
    kernel promotes those dots to HIGHEST instead of silently degrading to
    1-pass bf16 — so at mode "mid" the weight gradient must match the
    HIGHEST reference to float tolerance (the dgrad conv applies the same
    2-term split as the forward and is covered by the forward's own mode
    parity tests)."""
    p, b, c, cout, h, w = 2, 2, 8, 8, 16, 32
    x = _rand((b, h, w, c), 40)
    g = _rand((b, h, w, cout), 41)
    xp = jnp.asarray(phase_block(x, p))
    gp = jnp.asarray(phase_block(g, p))
    want = pk.packed_conv_wgrad(xp, gp, p, mode="highest", interpret=True)
    got = pk.packed_conv_wgrad(xp, gp, p, mode="mid", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def _cos(a, b):
    a, b = np.ravel(a), np.ravel(b)
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def _grads(loss_fn, *args):
    return jax.jit(jax.grad(lambda *a: loss_fn(*a), argnums=(0, 1, 2)))(*args)


@pytest.mark.parametrize("p", [2, 4])
def test_conv_lrelu_grad_parity(p):
    b, c, cout, h, w = 2, 8, 8, 16, 32
    x = _rand((b, h, w, c), 0)
    wgt = _rand((3, 3, c, cout), 1, 0.2)
    bias = _rand((cout,), 2)
    cot = _rand((b, h, w, cout), 3)  # fixed cotangent via weighted-sum loss
    cot_pk = jnp.asarray(phase_block(cot, p))
    xp = jnp.asarray(phase_block(x, p))

    def ref_loss(x, wgt, bias):
        return jnp.sum(_ref_conv_lrelu(x, wgt, bias) * cot)

    def pk_loss(xp, wgt, bias):
        return jnp.sum(
            packed_vjp.conv_lrelu(xp, wgt, bias, p, "highest") * cot_pk
        )

    gx_ref, gw_ref, gb_ref = _grads(ref_loss, jnp.asarray(x), jnp.asarray(wgt),
                                    jnp.asarray(bias))
    gx_pk, gw_pk, gb_pk = _grads(pk_loss, xp, jnp.asarray(wgt),
                                 jnp.asarray(bias))
    np.testing.assert_allclose(unphase(np.asarray(gx_pk), p),
                               np.asarray(gx_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_pk), np.asarray(gw_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_pk), np.asarray(gb_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("p", [2, 4])
def test_convpool_lrelu_grad_parity(p):
    b, c, cout, h, w = 2, 8, 8, 16, 32
    x = _rand((b, h, w, c), 4)
    wgt = _rand((3, 3, c, cout), 5, 0.2)
    bias = _rand((cout,), 6)
    cot = _rand((b, h // 2, w // 2, cout), 7)
    cot_pk = jnp.asarray(phase_block(cot, p // 2))
    xp = jnp.asarray(phase_block(x, p))

    def ref_loss(x, wgt, bias):
        return jnp.sum(_ref_convpool_lrelu(x, wgt, bias) * cot)

    def pk_loss(xp, wgt, bias):
        return jnp.sum(
            packed_vjp.convpool_lrelu(xp, wgt, bias, p, "highest") * cot_pk
        )

    gx_ref, gw_ref, gb_ref = _grads(ref_loss, jnp.asarray(x), jnp.asarray(wgt),
                                    jnp.asarray(bias))
    gx_pk, gw_pk, gb_pk = _grads(pk_loss, xp, jnp.asarray(wgt),
                                 jnp.asarray(bias))
    np.testing.assert_allclose(unphase(np.asarray(gx_pk), p),
                               np.asarray(gx_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_pk), np.asarray(gw_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_pk), np.asarray(gb_ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_lrelu_default_mode_grads_close():
    """Training mode: dots round bf16 (one pass) in fwd and bwd — gradients
    stay directionally faithful to the fp32 reference. NOTE: in CPU
    interpret mode Precision.DEFAULT computes exact fp32 dots, so here this
    only pins the default-mode PLUMBING; the bf16-rounding property itself
    is exercised when the suite runs on a real TPU (and by the full
    train-step soak runs in benchmarks/RESULTS.md)."""
    p, b, c, cout, h, w = 2, 2, 8, 8, 16, 32
    x = _rand((b, h, w, c), 8)
    wgt = _rand((3, 3, c, cout), 9, 0.2)
    bias = _rand((cout,), 10)
    cot = _rand((b, h, w, cout), 11)
    cot_pk = jnp.asarray(phase_block(cot, p))
    xp = jnp.asarray(phase_block(x, p))

    def ref_loss(x, wgt, bias):
        return jnp.sum(_ref_conv_lrelu(x, wgt, bias) * cot)

    def pk_loss(xp, wgt, bias):
        return jnp.sum(
            packed_vjp.conv_lrelu(xp, wgt, bias, p, "default") * cot_pk
        )

    _, gw_ref, _ = _grads(ref_loss, jnp.asarray(x), jnp.asarray(wgt),
                          jnp.asarray(bias))
    gx_pk, gw_pk, gb_pk = _grads(pk_loss, xp, jnp.asarray(wgt),
                                 jnp.asarray(bias))
    assert _cos(np.asarray(gw_pk), np.asarray(gw_ref)) > 0.99
    assert np.all(np.isfinite(np.asarray(gx_pk)))
    assert np.all(np.isfinite(np.asarray(gb_pk)))


def _ref_conv_lrelu_norm(x_nhwc, w, b):
    return pro_gan.pixel_norm(_ref_conv_lrelu(x_nhwc, w, b))


def _ref_upconv_lrelu_norm(x_nhwc, w, b):
    return _ref_conv_lrelu_norm(pro_gan.upsample_nearest_2x(x_nhwc), w, b)


@pytest.mark.parametrize("p", [2, 4])
def test_conv_lrelu_norm_grad_parity(p):
    b, c, cout, h, w = 2, 8, 8, 16, 32
    x = _rand((b, h, w, c), 30)
    wgt = _rand((3, 3, c, cout), 31, 0.2)
    bias = _rand((cout,), 32)
    cot = _rand((b, h, w, cout), 33)
    cot_pk = jnp.asarray(phase_block(cot, p))
    xp = jnp.asarray(phase_block(x, p))

    def ref_loss(x, wgt, bias):
        return jnp.sum(_ref_conv_lrelu_norm(x, wgt, bias) * cot)

    def pk_loss(xp, wgt, bias):
        return jnp.sum(
            packed_vjp.conv_lrelu_norm(xp, wgt, bias, p, "highest") * cot_pk
        )

    gx_ref, gw_ref, gb_ref = _grads(ref_loss, jnp.asarray(x), jnp.asarray(wgt),
                                    jnp.asarray(bias))
    gx_pk, gw_pk, gb_pk = _grads(pk_loss, xp, jnp.asarray(wgt),
                                 jnp.asarray(bias))
    np.testing.assert_allclose(unphase(np.asarray(gx_pk), p),
                               np.asarray(gx_ref), rtol=1e-4, atol=1e-5)
    # wgrad accumulates in a different reduction order (per-row VMEM
    # accumulator vs XLA's tree) — ~5e-4 relative is fp32 agreement.
    np.testing.assert_allclose(np.asarray(gw_pk), np.asarray(gw_ref),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gb_pk), np.asarray(gb_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("p", [1, 2])
def test_upconv_lrelu_norm_grad_parity(p):
    b, c, cout, h, w = 2, 8, 8, 16, 32
    x = _rand((b, h, w, c), 34)
    wgt = _rand((3, 3, c, cout), 35, 0.2)
    bias = _rand((cout,), 36)
    cot = _rand((b, 2 * h, 2 * w, cout), 37)
    cot_pk = jnp.asarray(phase_block(cot, 2 * p))
    xp = jnp.asarray(phase_block(x, p))

    def ref_loss(x, wgt, bias):
        return jnp.sum(_ref_upconv_lrelu_norm(x, wgt, bias) * cot)

    def pk_loss(xp, wgt, bias):
        return jnp.sum(
            packed_vjp.upconv_lrelu_norm(xp, wgt, bias, p, "highest") * cot_pk
        )

    gx_ref, gw_ref, gb_ref = _grads(ref_loss, jnp.asarray(x), jnp.asarray(wgt),
                                    jnp.asarray(bias))
    gx_pk, gw_pk, gb_pk = _grads(pk_loss, xp, jnp.asarray(wgt),
                                 jnp.asarray(bias))
    np.testing.assert_allclose(unphase(np.asarray(gx_pk), p),
                               np.asarray(gx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_pk), np.asarray(gw_ref),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gb_pk), np.asarray(gb_ref),
                               rtol=1e-4, atol=1e-5)


def test_train_step_packed_d_parity():
    """Full progan_train_step with packed_d=True vs the XLA path: at 256²
    the gate routes one D stage through the VJP kernels; on CPU both paths
    run fp32 dots (Precision.DEFAULT), so losses and the updated D params
    must agree to float tolerance."""
    from probgan_tpu.engine import train as train_engine

    cfg = pro_gan.ProGANConfig(resolution=256, latent_dim=8, fmap_base=1024,
                               fmap_max=64)
    stage = 6
    assert pro_gan.packed_d_stage_count(cfg, stage, "highest") == 1
    state = train_engine.progan_init_state(jax.random.key(0), cfg, lr=1e-3)
    real = jnp.asarray(_rand((2, 256, 256, 3), 20))
    z = jnp.asarray(_rand((2, 8), 21))
    alpha = jnp.asarray(0.7, jnp.float32)

    assert pro_gan.packed_start_stage(cfg, stage) == 6
    s_ref, m_ref = train_engine.progan_train_step(
        state, real, z, alpha, cfg, stage, packed_d=False)
    s_pk, m_pk = train_engine.progan_train_step(
        state, real, z, alpha, cfg, stage, packed_d=True, packed_g=True)

    np.testing.assert_allclose(float(m_pk["d_loss"]), float(m_ref["d_loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m_pk["g_loss"]), float(m_ref["g_loss"]),
                               rtol=1e-4)
    for tree_pk, tree_ref in ((s_pk.d_params, s_ref.d_params),
                              (s_pk.g_params, s_ref.g_params)):
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(tree_pk),
            jax.tree_util.tree_leaves_with_path(tree_ref),
        ):
            assert pa == pb
            # Adam's update is m/(sqrt(v)+eps): where a grad is ~0, fp32
            # reduction-order noise flips the RELATIVE update arbitrarily
            # while its magnitude stays bounded by ~lr (1e-3). So compare
            # absolutely at 0.6*lr — a systematically wrong gradient flips
            # whole-tensor updates by up to 2*lr and still fails; per-leaf
            # direction noise on isolated elements passes.
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=4e-3, atol=6e-4,
                                       err_msg=jax.tree_util.keystr(pa))


def test_train_step_packed_mid_mode_parity():
    """packed_train_mode="mid" (the 2-term split: only weight rounding
    dropped, ~2^-9 relative per dot — a REAL perturbation even in CPU
    interpret mode, unlike "default" whose interpret dots are exact fp32)
    vs the XLA fp32 path, compared on RAW GRADIENTS of the same D and G
    losses progan_train_step differentiates. Post-Adam params are the wrong
    observable here: the first Adam step is sign-like (update ~ ±lr), so
    any near-zero gradient whose sign flips under the rounding moves its
    update by 2*lr. Raw-gradient cosine weights components by magnitude and
    pins the thing the mode actually changes."""
    from probgan_tpu.engine import train as train_engine

    cfg = pro_gan.ProGANConfig(resolution=256, latent_dim=8, fmap_base=1024,
                               fmap_max=64)
    stage = 6
    state = train_engine.progan_init_state(jax.random.key(0), cfg, lr=1e-3)
    real = jnp.asarray(_rand((2, 256, 256, 3), 30))
    z = jnp.asarray(_rand((2, 8), 31))
    alpha = jnp.asarray(0.7, jnp.float32)

    def losses(g_params, d_params, packed, mode):
        pm = mode if packed else None
        fake = pro_gan.generator_rgb(
            state.g_params, z, cfg, stage, alpha, packed_mode=pm)
        real_logits = pro_gan.discriminator_apply(
            d_params, real, cfg, stage, alpha, packed=packed, packed_mode=pm
        ).astype(jnp.float32)
        fake_logits_d = pro_gan.discriminator_apply(
            d_params, jax.lax.stop_gradient(fake), cfg, stage, alpha,
            packed=packed, packed_mode=pm,
        ).astype(jnp.float32)
        d_loss = (jnp.mean(jax.nn.softplus(-real_logits))
                  + jnp.mean(jax.nn.softplus(fake_logits_d)))
        fake_g = pro_gan.generator_rgb(
            g_params, z, cfg, stage, alpha, packed_mode=pm)
        fake_logits_g = pro_gan.discriminator_apply(
            state.d_params, fake_g, cfg, stage, alpha,
            packed=packed, packed_mode=pm,
        ).astype(jnp.float32)
        return d_loss, jnp.mean(jax.nn.softplus(-fake_logits_g))

    def grads(packed, mode):
        def d_fn(dp):
            return losses(state.g_params, dp, packed, mode)[0]

        def g_fn(gp):
            return losses(gp, state.d_params, packed, mode)[1]

        return (jax.jit(jax.grad(d_fn))(state.d_params),
                jax.jit(jax.grad(g_fn))(state.g_params))

    dg_ref, gg_ref = grads(False, None)
    dg_pk, gg_pk = grads(True, "mid")

    for tree_pk, tree_ref in ((dg_pk, dg_ref), (gg_pk, gg_ref)):
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(tree_pk),
            jax.tree_util.tree_leaves_with_path(tree_ref),
        ):
            assert pa == pb
            name = jax.tree_util.keystr(pa)
            a, b = np.asarray(a), np.asarray(b)
            if np.linalg.norm(a) == 0 and np.linalg.norm(b) == 0:
                continue  # leaf inactive at this (stage, alpha): no gradient
            # Worst case observed: the earliest (deepest-chained) 16-element
            # bias at cos ~0.998 — legitimate accumulation of the per-dot
            # rounding across every downstream packed stage. A systematic
            # gradient error (wrong sign, scale, or tap) lands far below.
            assert _cos(a, b) > 0.995, f"{name}: cos={_cos(a, b)}"
            norm_ratio = np.linalg.norm(a) / (np.linalg.norm(b) + 1e-30)
            assert 0.95 < norm_ratio < 1.05, f"{name}: ratio={norm_ratio}"


def test_wgrad_kernel_matches_xla_correlation():
    """packed_conv_wgrad alone vs the XLA wgrad of the same SAME conv."""
    p, b, c, cout, h, w = 4, 2, 8, 8, 16, 32
    x = _rand((b, h, w, c), 12)
    g = _rand((b, h, w, cout), 13)
    xp = jnp.asarray(phase_block(x, p))
    gp = jnp.asarray(phase_block(g, p))

    def ref_loss(wgt):
        y = jax.lax.conv_general_dilated(
            jnp.asarray(x), wgt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.sum(y * jnp.asarray(g))

    wgt0 = jnp.zeros((3, 3, c, cout), jnp.float32)
    want = jax.jit(jax.grad(ref_loss))(wgt0)
    got = pk.packed_conv_wgrad(xp, gp, p, mode="highest", interpret=True)
    # fp32 reduction order differs (per-row accumulation vs XLA's tree):
    # ~1e-4 relative is the expected float32 agreement, not an error.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
