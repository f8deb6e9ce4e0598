"""Parity tests for the phase-blocked packed late-stage kernels
(ops/pallas_packed.py) against the XLA NHWC op chain, in interpret mode.

The phase-blocked layout stores full column u = P*j + psi at lane
psi*Wp + j; these tests round-trip that mapping and check conv / upconv /
final-rgb-blend kernels bit-near the models/pro_gan.py reference ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probgan_tpu.models import pro_gan
from probgan_tpu.ops import pallas_packed as pk


def phase_block(x_nhwc: np.ndarray, p: int) -> np.ndarray:
    """[B, H, W, C] -> [B, C, H, P*Wp] phase-blocked."""
    b, h, w, c = x_nhwc.shape
    wp = w // p
    out = np.empty((b, c, h, w), x_nhwc.dtype)
    for psi in range(p):
        # full columns psi, psi+P, ... -> lanes [psi*wp, (psi+1)*wp)
        out[:, :, :, psi * wp : (psi + 1) * wp] = np.transpose(
            x_nhwc[:, :, psi::p, :], (0, 3, 1, 2)
        )
    return out


def unphase(x_pk: np.ndarray, p: int) -> np.ndarray:
    """[B, C, H, P*Wp] -> [B, H, W, C]."""
    return np.asarray(pk.packed_rgb_to_nhwc(jnp.asarray(x_pk), p))


def ref_conv(x_nhwc, w, b):
    y = jax.lax.conv_general_dilated(
        x_nhwc, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b
    return pro_gan.pixel_norm(pro_gan.lrelu(y))


def _rand(shape, seed, scale=1.0):
    return (np.random.RandomState(seed).standard_normal(shape) * scale).astype(
        np.float32
    )


@pytest.mark.parametrize("p", [1, 2, 4])
def test_packed_conv_parity(p):
    b, c, cout, h, w = 2, 8, 8, 16, 32
    x = _rand((b, h, w, c), 0)
    wgt = _rand((3, 3, c, cout), 1, 0.2)
    bias = _rand((cout,), 2)
    want = np.asarray(jax.jit(ref_conv)(x, wgt, bias))
    got_pk = pk.packed_conv(
        jnp.asarray(phase_block(x, p)), jnp.asarray(wgt), jnp.asarray(bias), p,
        mode="highest", interpret=True,
    )
    got = unphase(np.asarray(got_pk), p)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_packed_conv_round_trip_layout():
    x = _rand((1, 4, 8, 3), 3)
    assert np.allclose(unphase(phase_block(x, 2), 2), x)
    assert np.allclose(unphase(phase_block(x, 4), 4), x)


@pytest.mark.parametrize("p_in", [1, 2])
def test_packed_upconv_parity(p_in):
    b, c, cout, h, w = 2, 8, 4, 8, 16
    x = _rand((b, h, w, c), 4)
    wgt = _rand((3, 3, c, cout), 5, 0.2)
    bias = _rand((cout,), 6)

    def ref(x, wgt, bias):
        return ref_conv(pro_gan.upsample_nearest_2x(x), wgt, bias)

    want = np.asarray(jax.jit(ref)(x, wgt, bias))
    got_pk = pk.packed_upconv(
        jnp.asarray(phase_block(x, p_in)), jnp.asarray(wgt), jnp.asarray(bias),
        p_in, mode="highest", rows_per_step=4, interpret=True,
    )
    got = unphase(np.asarray(got_pk), 2 * p_in)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_packed_upconv_emits_input_rgb():
    b, c, cout, h, w = 1, 8, 4, 8, 16
    x = _rand((b, h, w, c), 7)
    wgt = _rand((3, 3, c, cout), 8, 0.2)
    bias = _rand((cout,), 9)
    rgb_w = _rand((c, 3), 10, 0.3)
    rgb_b = _rand((3,), 11)
    feats, rgb8 = pk.packed_upconv(
        jnp.asarray(phase_block(x, 2)), jnp.asarray(wgt), jnp.asarray(bias), 2,
        mode="highest", rows_per_step=4, interpret=True,
        rgb_w=jnp.asarray(rgb_w), rgb_b=jnp.asarray(rgb_b),
    )
    want_rgb = x @ rgb_w + rgb_b  # 1x1 conv on the raw input
    got_rgb = unphase(np.asarray(rgb8), 2)[..., :3]
    np.testing.assert_allclose(got_rgb, want_rgb, rtol=2e-5, atol=2e-5)
    # features must be identical to the rgb-less variant
    feats_only = pk.packed_upconv(
        jnp.asarray(phase_block(x, 2)), jnp.asarray(wgt), jnp.asarray(bias), 2,
        mode="highest", rows_per_step=4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats_only))


@pytest.mark.parametrize("alpha", [1.0, 0.3])
def test_packed_conv_rgb_blend_parity(alpha):
    b, c, cout, h, w = 1, 8, 8, 32, 64  # h mult of 16 (fixed r)
    p = 4
    x = _rand((b, h, w, c), 12)
    wgt = _rand((3, 3, c, cout), 13, 0.2)
    bias = _rand((cout,), 14)
    rgb_w = _rand((cout, 3), 15, 0.3)
    rgb_b = _rand((3,), 16)
    prev_nhwc = _rand((b, h // 2, w // 2, 3), 17)

    def ref(x, wgt, bias):
        feat = ref_conv(x, wgt, bias)
        rgb = feat @ rgb_w + rgb_b
        prev_up = pro_gan.upsample_nearest_2x(prev_nhwc)
        return prev_up + alpha * (rgb - prev_up)

    want = np.asarray(jax.jit(ref)(x, jnp.asarray(wgt), jnp.asarray(bias)))
    prev_pk = phase_block(np.pad(prev_nhwc, ((0, 0), (0, 0), (0, 0), (0, 5))),
                          p // 2)
    got_pk = pk.packed_conv_rgb(
        jnp.asarray(phase_block(x, p)), jnp.asarray(wgt), jnp.asarray(bias),
        jnp.asarray(rgb_w), jnp.asarray(rgb_b), jnp.asarray(prev_pk),
        jnp.float32(alpha), p, mode="highest", interpret=True,
    )
    got = unphase(np.asarray(got_pk), p)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_high_mode_conv_parity():
    """The split-3 "high" mode kernel stays within parity-grade error of the
    fp32 reference (on CPU the underlying dot is exact, so this checks the
    hi/lo decomposition plumbing end-to-end through the kernel)."""
    b, c, cout, h, w = 1, 8, 8, 16, 32
    x = _rand((b, h, w, c), 20)
    wgt = _rand((3, 3, c, cout), 21, 0.2)
    bias = _rand((cout,), 22)
    want = np.asarray(jax.jit(ref_conv)(x, wgt, bias))
    got = unphase(
        np.asarray(
            pk.packed_conv(
                jnp.asarray(phase_block(x, 2)), jnp.asarray(wgt),
                jnp.asarray(bias), 2, mode="high", interpret=True,
            )
        ),
        2,
    )
    assert np.abs(got - want).max() < 1e-4


def test_hilo_split_has_cross_terms():
    """The 3-term K-stacking (w: [hi; hi; lo] vs x: [hi; lo; hi]) must
    reconstruct the fp32 product to ~fp32 accuracy — a diagonal-only 2-term
    stack is bf16-grade and would fail this bound."""
    rng = np.random.RandomState(30)
    wk = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    want = np.asarray(
        jax.lax.dot_general(
            wk, x, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    wk3 = np.asarray(pk.stack_weights(wk, "high"), np.float32)
    x3 = np.asarray(pk._stack_x(x, "high"), np.float32)
    got = wk3.T @ x3
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-5  # 3-term split drops lo*lo: ~bf16^2 relative error

    # diagonal-only 2-term stack (the wrong construction) is much worse
    whi, wlo = pk._hilo(wk)
    xhi, xlo = pk._hilo(x)
    diag = (
        np.asarray(whi, np.float32).T @ np.asarray(xhi, np.float32)
        + np.asarray(wlo, np.float32).T @ np.asarray(xlo, np.float32)
    )
    rel_diag = np.abs(diag - want).max() / np.abs(want).max()
    assert rel_diag > 100 * rel


def test_exact6_mode_is_fp32_grade():
    """"exact6" (3-way hi/mid/lo split, six K-stacked products) must
    reconstruct the fp32 dot to fp32-emulation accuracy — the same six
    products Mosaic's HIGHEST 6-pass computes, so it must be an order of
    magnitude tighter than the 2-way split-3 "high" mode."""
    rng = np.random.RandomState(31)
    wk = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    want = np.asarray(
        jax.lax.dot_general(
            wk, x, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    )

    def rel_err(mode):
        wks = np.asarray(pk.stack_weights(wk, mode), np.float32)
        xs = np.asarray(pk._stack_x(x, mode), np.float32)
        got = wks.T @ xs
        return np.abs(got - want).max() / np.abs(want).max()

    rel6 = rel_err("exact6")
    rel3 = rel_err("high")
    assert rel6 < 2e-6
    assert rel6 < rel3 / 4


def test_exact6_mode_conv_parity():
    """The exact6 kernel mode passes the SAME parity bound as "highest"
    against the fp32 reference chain."""
    b, c, cout, h, w = 1, 8, 8, 16, 32
    x = _rand((b, h, w, c), 23)
    wgt = _rand((3, 3, c, cout), 24, 0.2)
    bias = _rand((cout,), 25)
    want = np.asarray(jax.jit(ref_conv)(x, wgt, bias))
    got = unphase(
        np.asarray(
            pk.packed_conv(
                jnp.asarray(phase_block(x, 2)), jnp.asarray(wgt),
                jnp.asarray(bias), 2, mode="exact6", interpret=True,
            )
        ),
        2,
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_exact6_mode_upconv_and_rgb_parity():
    b, c, cout, h, w = 1, 8, 8, 16, 32
    p = 2
    x = _rand((b, h, w, c), 26)
    wgt = _rand((3, 3, c, cout), 27, 0.2)
    bias = _rand((cout,), 28)

    def ref_up(x, wgt, bias):
        return ref_conv(pro_gan.upsample_nearest_2x(x), wgt, bias)

    want = np.asarray(jax.jit(ref_up)(x, wgt, bias))
    got = unphase(
        np.asarray(
            pk.packed_upconv(
                jnp.asarray(phase_block(x, p)), jnp.asarray(wgt),
                jnp.asarray(bias), p, mode="exact6", rows_per_step=4,
                interpret=True,
            )
        ),
        2 * p,
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    rgb_w = _rand((cout, 3), 29, 0.3)
    rgb_b = _rand((3,), 30)
    prev_nhwc = _rand((b, h, w, 3), 31)
    xb = _rand((b, 2 * h, 2 * w, c), 32)

    def ref_rgb(xb):
        feat = ref_conv(xb, wgt, bias)
        rgb = feat @ rgb_w + rgb_b
        prev_up = pro_gan.upsample_nearest_2x(prev_nhwc)
        return prev_up + 0.4 * (rgb - prev_up)

    want_rgb = np.asarray(jax.jit(ref_rgb)(xb))
    prev_pk = phase_block(
        np.pad(prev_nhwc, ((0, 0), (0, 0), (0, 0), (0, 5))), p
    )
    got_rgb = unphase(
        np.asarray(
            pk.packed_conv_rgb(
                jnp.asarray(phase_block(xb, 2 * p)), jnp.asarray(wgt),
                jnp.asarray(bias), jnp.asarray(rgb_w), jnp.asarray(rgb_b),
                jnp.asarray(prev_pk), jnp.float32(0.4), 2 * p, mode="exact6",
                interpret=True,
            )
        ),
        2 * p,
    )
    np.testing.assert_allclose(got_rgb, want_rgb, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("alpha", [1.0, 0.5])
def test_generator_packed_end_to_end(alpha):
    """generator_rgb(packed=True) must match the XLA path through the real
    generator at a 512² config where the packed gate engages (stages 6-7)."""
    cfg = pro_gan.ProGANConfig(resolution=512, latent_dim=16, fmap_base=512,
                               fmap_max=64)
    stage = cfg.num_stages - 1
    assert pro_gan.packed_start_stage(cfg, stage) == 6
    params = pro_gan.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (2, cfg.latent_dim), jnp.float32)
    want = np.asarray(
        pro_gan.generator_rgb(params, z, cfg, stage, alpha,
                              precision="highest")
    )
    got = np.asarray(
        pro_gan.generator_rgb(params, z, cfg, stage, alpha,
                              precision="highest", packed=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_packed_gate_rejects_small_configs():
    cfg = pro_gan.ProGANConfig(resolution=64, latent_dim=16, fmap_base=64,
                               fmap_max=32)
    assert pro_gan.packed_start_stage(cfg, cfg.num_stages - 1) is None
    # and packed=True on an ineligible config silently uses the XLA path
    params = pro_gan.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (1, cfg.latent_dim), jnp.float32)
    a = np.asarray(pro_gan.generator_rgb(params, z, cfg, cfg.num_stages - 1))
    b = np.asarray(
        pro_gan.generator_rgb(params, z, cfg, cfg.num_stages - 1, packed=True)
    )
    np.testing.assert_array_equal(a, b)


def test_stage_fused_upconv_conv_parity():
    """packed_upconv_conv (one kernel per stage) must be BITWISE identical
    to packed_upconv -> packed_conv (shared row helpers; the only difference
    is where conv1's rows live), and match the XLA reference chain."""
    b, c, c1, c2, h, w = 1, 8, 8, 8, 8, 16
    p_in = 2
    x = _rand((b, h, w, c), 40)
    w1 = _rand((3, 3, c, c1), 41, 0.2)
    b1 = _rand((c1,), 42)
    w2 = _rand((3, 3, c1, c2), 43, 0.2)
    b2 = _rand((c2,), 44)

    xp = jnp.asarray(phase_block(x, p_in))
    feats = pk.packed_upconv(
        xp, jnp.asarray(w1), jnp.asarray(b1), p_in, mode="highest",
        rows_per_step=4, interpret=True,
    )
    want_unfused = np.asarray(
        pk.packed_conv(
            feats, jnp.asarray(w2), jnp.asarray(b2), 2 * p_in,
            mode="highest", interpret=True,
        )
    )
    got = np.asarray(
        pk.packed_upconv_conv(
            xp, jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
            jnp.asarray(b2), p_in, mode="highest", rows_per_step=4,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want_unfused)

    def ref(x):
        return ref_conv(ref_conv(pro_gan.upsample_nearest_2x(x), w1, b1),
                        w2, b2)

    want = np.asarray(jax.jit(ref)(x))
    np.testing.assert_allclose(
        unphase(got, 2 * p_in), want, rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("alpha", [1.0, 0.4])
def test_stage_fused_rgb_parity(alpha):
    """packed_upconv_conv_rgb (the whole final stage in one kernel) must be
    bitwise identical to the unfused packed pair + conv_rgb, and match the
    XLA reference chain including the progressive blend."""
    b, c, c1, c2, h, w = 1, 8, 8, 8, 16, 32
    p_in = 2
    x = _rand((b, h, w, c), 50)
    w1 = _rand((3, 3, c, c1), 51, 0.2)
    b1 = _rand((c1,), 52)
    w2 = _rand((3, 3, c1, c2), 53, 0.2)
    b2 = _rand((c2,), 54)
    rgb_w = _rand((c2, 3), 55, 0.3)
    rgb_b = _rand((3,), 56)
    prev_w = _rand((c, 3), 57, 0.3)
    prev_b = _rand((3,), 58)

    xp = jnp.asarray(phase_block(x, p_in))
    feats, rgb_prev8 = pk.packed_upconv(
        xp, jnp.asarray(w1), jnp.asarray(b1), p_in, mode="highest",
        rows_per_step=8, interpret=True,
        rgb_w=jnp.asarray(prev_w), rgb_b=jnp.asarray(prev_b),
    )
    want_unfused = np.asarray(
        pk.packed_conv_rgb(
            feats, jnp.asarray(w2), jnp.asarray(b2), jnp.asarray(rgb_w),
            jnp.asarray(rgb_b), rgb_prev8, jnp.float32(alpha), 2 * p_in,
            mode="highest", interpret=True,
        )
    )
    got = np.asarray(
        pk.packed_upconv_conv_rgb(
            xp, jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
            jnp.asarray(b2), jnp.asarray(rgb_w), jnp.asarray(rgb_b),
            jnp.asarray(prev_w), jnp.asarray(prev_b), jnp.float32(alpha),
            p_in, mode="highest", rows_per_step=8, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want_unfused)

    def ref(x):
        feat = ref_conv(
            ref_conv(pro_gan.upsample_nearest_2x(x), w1, b1), w2, b2
        )
        rgb = feat @ rgb_w + rgb_b
        prev_up = pro_gan.upsample_nearest_2x(x @ prev_w + prev_b)
        return prev_up + alpha * (rgb - prev_up)

    want = np.asarray(jax.jit(ref)(x))
    np.testing.assert_allclose(
        unphase(got, 2 * p_in), want, rtol=2e-5, atol=2e-5
    )


def test_generator_stage_fused_matches_unfused(monkeypatch):
    """The PROBGAN_STAGE_FUSED escape hatch: both packed paths produce
    bitwise-identical generator output through the real model."""
    cfg = pro_gan.ProGANConfig(resolution=512, latent_dim=16, fmap_base=512,
                               fmap_max=64)
    stage = cfg.num_stages - 1
    params = pro_gan.init_generator(jax.random.key(3), cfg)
    z = jax.random.normal(jax.random.key(4), (1, cfg.latent_dim), jnp.float32)

    monkeypatch.setenv("PROBGAN_STAGE_FUSED", "1")
    fused = np.asarray(
        pro_gan.generator_rgb(params, z, cfg, stage, 0.6,
                              precision="highest", packed=True)
    )
    monkeypatch.setenv("PROBGAN_STAGE_FUSED", "0")
    unfused = np.asarray(
        pro_gan.generator_rgb(params, z, cfg, stage, 0.6,
                              precision="highest", packed=True)
    )
    np.testing.assert_array_equal(fused, unfused)


def test_packed_conv_lrelu_epilogue():
    """epilogue="lrelu" must match conv+bias+LeakyReLU without PixelNorm
    (the discriminator block's conv1)."""
    b, c, cout, h, w = 1, 8, 8, 16, 32
    x = _rand((b, h, w, c), 60)
    wgt = _rand((3, 3, c, cout), 61, 0.2)
    bias = _rand((cout,), 62)

    def ref(x):
        y = jax.lax.conv_general_dilated(
            x, wgt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ) + bias
        return pro_gan.lrelu(y)

    want = np.asarray(jax.jit(ref)(x))
    got = unphase(
        np.asarray(
            pk.packed_conv(
                jnp.asarray(phase_block(x, 2)), jnp.asarray(wgt),
                jnp.asarray(bias), 2, mode="highest", epilogue="lrelu",
                interpret=True,
            )
        ),
        2,
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("p", [2, 4])
def test_packed_convpool_parity(p):
    """conv3x3 + bias + LeakyReLU + 2x2 mean pool in one kernel: the phase
    count halves (column pooling = phase-block pair average)."""
    b, c, cout, h, w = 2, 8, 8, 16, 32
    x = _rand((b, h, w, c), 63)
    wgt = _rand((3, 3, c, cout), 64, 0.2)
    bias = _rand((cout,), 65)

    def ref(x):
        y = jax.lax.conv_general_dilated(
            x, wgt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ) + bias
        return pro_gan.downsample_avg_2x(pro_gan.lrelu(y))

    want = np.asarray(jax.jit(ref)(x))
    got = unphase(
        np.asarray(
            pk.packed_convpool(
                jnp.asarray(phase_block(x, p)), jnp.asarray(wgt),
                jnp.asarray(bias), p, mode="highest", rows_per_step=8,
                interpret=True,
            )
        ),
        p // 2,
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_nhwc_to_phase_blocked_roundtrip():
    x = _rand((2, 8, 32, 8), 66)
    for p in (1, 2, 4):
        pb = np.asarray(pk.nhwc_to_phase_blocked(jnp.asarray(x), p))
        np.testing.assert_array_equal(pb, phase_block(x, p))
        np.testing.assert_allclose(unphase(pb, p), x)


@pytest.mark.parametrize("alpha", [1.0, 0.5])
def test_discriminator_packed_end_to_end(alpha):
    """discriminator_apply(packed=True) must match the XLA path through the
    real D at a 512² config where the packed gate engages."""
    cfg = pro_gan.ProGANConfig(resolution=512, latent_dim=16, fmap_base=2048,
                               fmap_max=64)
    stage = cfg.num_stages - 1
    n = pro_gan.packed_d_stage_count(cfg, stage)
    assert n >= 2  # nf(7)=16, nf(6)=32, nf(5)=64 ... down to res 256
    params = pro_gan.init_discriminator(jax.random.key(5), cfg)
    img = jax.random.uniform(
        jax.random.key(6), (2, 512, 512, 3), jnp.float32, -1.0, 1.0
    )
    want = np.asarray(
        pro_gan.discriminator_apply(params, img, cfg, stage, alpha,
                                    precision="highest")
    )
    got = np.asarray(
        pro_gan.discriminator_apply(params, img, cfg, stage, alpha,
                                    precision="highest", packed=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_packed_d_gate_rejects_small_configs():
    cfg = pro_gan.ProGANConfig(resolution=64, latent_dim=16, fmap_base=64,
                               fmap_max=32)
    assert pro_gan.packed_d_stage_count(cfg, cfg.num_stages - 1) == 0
    params = pro_gan.init_discriminator(jax.random.key(7), cfg)
    img = jax.random.uniform(
        jax.random.key(8), (1, 64, 64, 3), jnp.float32, -1.0, 1.0
    )
    a = np.asarray(pro_gan.discriminator_apply(params, img, cfg, 4, 1.0))
    b = np.asarray(
        pro_gan.discriminator_apply(params, img, cfg, 4, 1.0, packed=True)
    )
    np.testing.assert_array_equal(a, b)


def test_discriminator_packed_high_ladder():
    """At ladder precision "high" the D path maps to the kernels' 3-term
    split mode (no fp32 promotion — logits need no golden grade); the
    result must stay close to the fp32 reference at split-mode accuracy."""
    cfg = pro_gan.ProGANConfig(resolution=512, latent_dim=16, fmap_base=2048,
                               fmap_max=64)
    stage = cfg.num_stages - 1
    params = pro_gan.init_discriminator(jax.random.key(9), cfg)
    img = jax.random.uniform(
        jax.random.key(10), (2, 512, 512, 3), jnp.float32, -1.0, 1.0
    )
    want = np.asarray(
        pro_gan.discriminator_apply(params, img, cfg, stage, 1.0,
                                    precision="highest")
    )
    got = np.asarray(
        pro_gan.discriminator_apply(params, img, cfg, stage, 1.0,
                                    precision="high", packed=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_packed_d_gate_declines_default_precision():
    cfg = pro_gan.ProGANConfig(resolution=512, latent_dim=16, fmap_base=2048,
                               fmap_max=64)
    stage = cfg.num_stages - 1
    assert pro_gan.packed_d_stage_count(cfg, stage, "highest") >= 2
    assert pro_gan.packed_d_stage_count(cfg, stage, None) == 0
    assert pro_gan.packed_d_stage_count(cfg, stage, "default") == 0


def test_packed_convpool_rejects_unaligned_rows_per_step():
    x = jnp.zeros((1, 8, 16, 32), jnp.float32)  # already phase-blocked [B,C,H,W]
    wgt = jnp.zeros((3, 3, 8, 8), jnp.float32)
    bias = jnp.zeros((8,), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 8"):
        pk.packed_convpool(x, wgt, bias, 2, rows_per_step=4, interpret=True)


def test_mid_mode_conv_parity():
    """The 2-term "mid" mode (the "fast" serving grade's kernel mode) drops
    only the weight rounding: error vs the fp32 reference is bounded by
    ~2^-9 per dot — an order tighter than "default" would allow, an order
    looser than "high"."""
    b, c, cout, h, w = 1, 8, 8, 16, 32
    x = _rand((b, h, w, c), 70)
    wgt = _rand((3, 3, c, cout), 71, 0.2)
    bias = _rand((cout,), 72)
    want = np.asarray(jax.jit(ref_conv)(x, wgt, bias))
    got = unphase(
        np.asarray(
            pk.packed_conv(
                jnp.asarray(phase_block(x, 2)), jnp.asarray(wgt),
                jnp.asarray(bias), 2, mode="mid", interpret=True,
            )
        ),
        2,
    )
    # Conv accumulates ~72 dropped |w_lo*x| terms (each ~2^-9 relative), and
    # PixelNorm amplifies near-zero-rms pixels — the loose fp32 bound just
    # pins the error CLASS (an all-bf16 "default" dot would be ~8x worse).
    err = np.abs(got - want).max()
    assert err < 5e-2, err
    # the split really is w_hi * x exactly: rebuilding the conv with
    # bf16-rounded weights must match the kernel to fp32 accuracy
    # (x_lo is itself bf16-rounded, so "exactly" means up to ~2^-16
    # relative — fp32-class, not bit-equal.)
    w_hi = jnp.asarray(wgt).astype(jnp.bfloat16).astype(jnp.float32)
    want_hi = np.asarray(jax.jit(ref_conv)(x, np.asarray(w_hi), bias))
    assert np.abs(got - want_hi).max() < 5e-5


def test_fast_grade_end_to_end():
    """precision="fast" routes the packed generator through the "mid"
    kernel mode and stays close to the fp32 path (serving-grade bound)."""
    cfg = pro_gan.ProGANConfig(resolution=512, latent_dim=16, fmap_base=512,
                               fmap_max=64)
    stage = cfg.num_stages - 1
    # the fast grade maps to the cheapest mode measured >= 50 dB at 1024²
    # (kernel "default" for G with early XLA stages at HIGH; "mid" for D)
    assert pro_gan._PACKED_MODES["fast"] == "default"
    assert pro_gan._PACKED_MODES_D["fast"] == "mid"
    params = pro_gan.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (2, cfg.latent_dim), jnp.float32)
    want = np.asarray(
        pro_gan.generator_rgb(params, z, cfg, stage, 1.0, precision="highest")
    )
    got = np.asarray(
        pro_gan.generator_rgb(params, z, cfg, stage, 1.0, precision="fast",
                              packed=True)
    )
    # The grade's contract is the north-star parity bar: uint8 PSNR >= 50 dB
    # vs the fp32-exact path (the production measurement is
    # benchmarks/packed_psnr.py at the real 1024² config).
    u_want = np.asarray(pro_gan.to_uint8(jnp.asarray(want))).astype(np.float64)
    u_got = np.asarray(pro_gan.to_uint8(jnp.asarray(got))).astype(np.float64)
    mse = np.mean((u_got - u_want) ** 2)
    psnr = 10 * np.log10(255.0**2 / mse) if mse > 0 else np.inf
    assert psnr >= 50.0, psnr


def test_fused_uint8_epilogue_exact():
    """emit_uint8 kernels: the in-kernel tanh -> denorm -> byte-pack must
    produce EXACTLY the same uint8 image as to_uint8(fp32-RGB path), both
    through packed_conv_rgb and end-to-end through generator_apply."""
    cfg = pro_gan.ProGANConfig(resolution=512, latent_dim=16, fmap_base=512,
                               fmap_max=64)
    stage = cfg.num_stages - 1
    params = pro_gan.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (2, cfg.latent_dim), jnp.float32)

    want = np.asarray(
        pro_gan.to_uint8(
            pro_gan.generator_rgb(params, z, cfg, stage, 0.5,
                                  precision="highest", packed=True)
        )
    )
    got = np.asarray(
        pro_gan.generator_apply(params, z, cfg, stage, 0.5,
                                precision="highest", packed=True)
    )
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_fused_uint8_epilogue_stage_fused(monkeypatch):
    """The stage-fused kernel's emit_uint8 path matches too."""
    monkeypatch.setenv("PROBGAN_STAGE_FUSED", "1")
    cfg = pro_gan.ProGANConfig(resolution=512, latent_dim=16, fmap_base=512,
                               fmap_max=64)
    stage = cfg.num_stages - 1
    params = pro_gan.init_generator(jax.random.key(2), cfg)
    z = jax.random.normal(jax.random.key(3), (1, cfg.latent_dim), jnp.float32)
    # Call the un-jitted model fns directly: the env var is read at trace
    # time, so jit caching must not be in the way (see _g_late_packed).
    want = np.asarray(
        pro_gan.to_uint8(
            pro_gan.generator_rgb(params, z, cfg, stage, 1.0,
                                  precision="highest", packed=True)
        )
    )
    got = np.asarray(
        pro_gan.generator_apply(params, z, cfg, stage, 1.0,
                                precision="highest", packed=True)
    )
    np.testing.assert_array_equal(got, want)


def test_fast_grade_psnr_margin_emulated():
    """Regression guard for the fast serving grade's >= 50 dB parity margin,
    CPU-runnable (VERDICT r3 #2). The grade's TPU error source is the packed
    late stages' 1-pass bf16 dots — EXACT fp32 in CPU interpret mode, so the
    pipeline is rendered with kernel mode "emulate_bf16" (both dot operands
    explicitly bf16-rounded, fp32 accumulation: the MXU's 1-pass arithmetic
    model) against the XLA parity path. Calibrated on this config at
    55.3 dB (alpha=1.0) / 57.1 dB (alpha=0.5) — vs 97+ dB un-emulated,
    which is why emulation is load-bearing; the TPU-measured 1024² grade
    sits at 52.7-54.1 dB (benchmarks/packed_psnr.py). A kernel edit that
    erodes the margin ~4 dB trips the 51 dB floor here before serving
    quality drops below the north-star bar."""
    cfg = pro_gan.ProGANConfig(resolution=256, latent_dim=64, fmap_base=1024,
                               fmap_max=64)
    stage = cfg.num_stages - 1
    assert pro_gan.packed_start_stage(cfg, stage) == 6
    params = pro_gan.init_generator(jax.random.key(7), cfg)
    z = jax.random.normal(jax.random.key(8), (2, cfg.latent_dim), jnp.float32)

    def render(packed, precision, mode_override, alpha):
        saved = dict(pro_gan._PACKED_MODES)
        if mode_override is not None:
            for k in list(pro_gan._PACKED_MODES):
                pro_gan._PACKED_MODES[k] = mode_override
        try:
            return np.asarray(
                pro_gan.generator_apply(params, z, cfg, stage, alpha,
                                        jnp.float32, precision,
                                        packed=packed)
            ).astype(np.float64)
        finally:
            pro_gan._PACKED_MODES.clear()
            pro_gan._PACKED_MODES.update(saved)

    for alpha in (1.0, 0.5):
        ref = render(False, "high", None, alpha)
        fast = render(True, "fast", "emulate_bf16", alpha)
        mse = float(np.mean((fast - ref) ** 2))
        assert mse > 0, "emulation inactive: fast pipeline exactly equals ref"
        psnr = 10 * np.log10(255.0**2 / mse)
        # < 70 dB proves the bf16 rounding actually engaged (the un-emulated
        # CPU pipeline scores 97+ dB); > 51 dB is the margin floor.
        assert 51.0 < psnr < 70.0, f"alpha={alpha}: fast-grade PSNR {psnr:.1f} dB"


def test_per_stage_mode_mix_routing(monkeypatch):
    """Packed-mode mixes "base+final" (models/pro_gan._g_late_packed) route
    the FINAL stage's kernels to ``final`` and every earlier packed stage to
    ``base``: with two packed stages "default+mid" differs from both pure
    modes; with a single packed stage it degenerates to pure ``final``
    bitwise. This is the serving-margin candidate mix of VERDICT r4 #2
    (measured on chip by benchmarks/fast_grade_bench.py --variants
    finalmid)."""
    z_key, w_key = jax.random.key(1), jax.random.key(0)

    def render(cfg, stage, mode):
        monkeypatch.setitem(pro_gan._PACKED_MODES, "fast", mode)
        params = pro_gan.init_generator(w_key, cfg)
        z = jax.random.normal(z_key, (2, cfg.latent_dim), jnp.float32)
        return np.asarray(
            pro_gan.generator_rgb(params, z, cfg, stage, 1.0,
                                  precision="fast", packed=True)
        )

    # 512²: packed segment {6, 7} — two stages, the mix is a true mix.
    cfg2 = pro_gan.ProGANConfig(resolution=512, latent_dim=16, fmap_base=512,
                                fmap_max=64)
    stage2 = cfg2.num_stages - 1
    assert pro_gan.packed_start_stage(cfg2, stage2) == 6
    mix = render(cfg2, stage2, "default+mid")
    pure_default = render(cfg2, stage2, "default")
    pure_mid = render(cfg2, stage2, "mid")
    assert not np.array_equal(mix, pure_default)  # final stage went mid
    assert not np.array_equal(mix, pure_mid)      # stage 6 stayed default

    # 256²: packed segment {6} — single stage, mix == pure final mode.
    cfg1 = pro_gan.ProGANConfig(resolution=256, latent_dim=16, fmap_base=512,
                                fmap_max=64)
    stage1 = cfg1.num_stages - 1
    assert pro_gan.packed_start_stage(cfg1, stage1) == stage1
    np.testing.assert_array_equal(render(cfg1, stage1, "default+mid"),
                                  render(cfg1, stage1, "mid"))
