"""Progressive image GAN tests: shapes, blend semantics, uint8 output, and
fp32 pixel parity against the torch CPU reference (PSNR > 50 dB, BASELINE.md).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probgan_tpu.models import pro_gan

CFG = pro_gan.ProGANConfig(resolution=64, latent_dim=32, fmap_base=256, fmap_max=64)


@pytest.fixture(scope="module")
def g_params():
    return pro_gan.init_generator(jax.random.key(0), CFG)


@pytest.fixture(scope="module")
def d_params():
    return pro_gan.init_discriminator(jax.random.key(1), CFG)


def test_config_stages():
    assert CFG.num_stages == 5  # 4, 8, 16, 32, 64
    assert pro_gan.stage_resolution(0) == 4
    assert pro_gan.stage_resolution(4) == 64
    full = pro_gan.ProGANConfig(resolution=1024)
    assert full.num_stages == 9
    assert full.nf(0) == 512 and full.nf(8) == 32


@pytest.mark.parametrize("stage", [0, 1, 4])
def test_generator_shapes(g_params, stage):
    z = jax.random.normal(jax.random.key(2), (2, CFG.latent_dim))
    img = pro_gan.generator_apply(g_params, z, CFG, stage=stage)
    r = pro_gan.stage_resolution(stage)
    assert img.shape == (2, r, r, 3)
    assert img.dtype == jnp.uint8


def test_alpha_blend_endpoints(g_params):
    """alpha=0 must equal upsampled previous-stage RGB; alpha=1 the new
    stage's own toRGB (progressive fade-in semantics)."""
    z = jax.random.normal(jax.random.key(3), (2, CFG.latent_dim))
    stage = 2
    rgb0 = pro_gan.generator_rgb(g_params, z, CFG, stage, alpha=0.0)
    rgb1 = pro_gan.generator_rgb(g_params, z, CFG, stage, alpha=1.0)
    rgb_half = pro_gan.generator_rgb(g_params, z, CFG, stage, alpha=0.5)

    x_prev, _ = pro_gan.generator_features(g_params, z, CFG, stage - 1)
    expected0 = pro_gan.upsample_nearest_2x(
        pro_gan.eq_conv(g_params["to_rgb"][stage - 1], x_prev, gain=1.0)
    )
    np.testing.assert_allclose(np.asarray(rgb0), np.asarray(expected0), atol=1e-5)

    x_cur, _ = pro_gan.generator_features(g_params, z, CFG, stage)
    expected1 = pro_gan.eq_conv(g_params["to_rgb"][stage], x_cur, gain=1.0)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(expected1), atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(rgb_half),
        0.5 * (np.asarray(rgb0) + np.asarray(rgb1)),
        atol=1e-5,
    )


def test_alpha_is_traced_not_static(g_params):
    """One compiled graph serves all alphas (SURVEY.md §7.3): jit with alpha
    as a traced argument must not retrace across alpha values."""
    traces = 0

    def fwd(params, z, alpha):
        nonlocal traces
        traces += 1
        return pro_gan.generator_rgb(params, z, CFG, 2, alpha)

    jfwd = jax.jit(fwd)
    z = jax.random.normal(jax.random.key(4), (1, CFG.latent_dim))
    jfwd(g_params, z, jnp.float32(0.3))
    jfwd(g_params, z, jnp.float32(0.8))
    assert traces == 1


def test_uint8_denorm_range(g_params):
    z = 100.0 * jax.random.normal(jax.random.key(5), (4, CFG.latent_dim))
    img = np.asarray(pro_gan.generator_apply(g_params, z, CFG, stage=1))
    assert img.min() >= 0 and img.max() <= 255


@pytest.mark.parametrize("stage,alpha", [(0, 1.0), (2, 0.5), (4, 1.0)])
def test_discriminator_shapes(d_params, stage, alpha):
    r = pro_gan.stage_resolution(stage)
    img = jax.random.normal(jax.random.key(6), (3, r, r, 3))
    logits = pro_gan.discriminator_apply(d_params, img, CFG, stage, alpha)
    assert logits.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_minibatch_stddev_channel():
    x = jax.random.normal(jax.random.key(7), (4, 4, 4, 8))
    y = pro_gan.minibatch_stddev(x)
    assert y.shape == (4, 4, 4, 9)
    # constant input -> ~zero stddev channel
    y0 = pro_gan.minibatch_stddev(jnp.ones((4, 4, 4, 8)))
    assert float(jnp.max(y0[..., -1])) < 1e-3


# -- parity vs torch CPU reference -------------------------------------------

def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("stage,alpha", [(0, 1.0), (3, 0.5), (4, 1.0)])
def test_parity_vs_torch_reference(g_params, stage, alpha):
    """Same weights + same latents -> PSNR > 50 dB vs the torch fp32 CPU
    reference (BASELINE.json north_star)."""
    import torch

    from benchmarks import torch_reference as tref

    rng = np.random.RandomState(123)
    z_np = rng.standard_normal((2, CFG.latent_dim)).astype(np.float32)

    img_jax = np.asarray(
        pro_gan.generator_apply(g_params, jnp.asarray(z_np), CFG, stage, alpha)
    )
    t_params = tref.convert_params(g_params)
    img_torch = tref.generator_uint8(
        t_params, torch.from_numpy(z_np), CFG.nf(0), stage, alpha
    )
    assert img_jax.shape == img_torch.shape
    psnr = _psnr(img_jax, img_torch)
    assert psnr > 50.0, f"PSNR {psnr:.1f} dB < 50 dB at stage {stage}"


def test_fused_upconv_matches_unfused(monkeypatch):
    """The subpixel-decomposed upsample+conv must equal materialize-then-conv
    (exact up to fp reassociation of pre-summed taps)."""
    import os

    import jax.numpy as jnp

    from probgan_tpu.ops.fused_upconv import upsample2x_conv3x3

    key = jax.random.key(0)
    kw_, kx = jax.random.split(key)
    w = jax.random.normal(kw_, (3, 3, 8, 16), jnp.float32)
    b = jax.random.normal(jax.random.key(2), (16,), jnp.float32)
    x = jax.random.normal(kx, (2, 6, 6, 8), jnp.float32)

    fused = upsample2x_conv3x3(w, b, x)
    up = pro_gan.upsample_nearest_2x(x)
    ref = jax.lax.conv_general_dilated(
        up, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def test_generator_same_with_and_without_fusion(g_params, monkeypatch):
    z = jax.random.normal(jax.random.key(9), (2, CFG.latent_dim))
    monkeypatch.setenv("PROBGAN_FUSE_UPCONV", "0")
    unfused = np.asarray(pro_gan.generator_rgb(g_params, z, CFG, 3, 0.7))
    monkeypatch.setenv("PROBGAN_FUSE_UPCONV", "1")
    fused = np.asarray(pro_gan.generator_rgb(g_params, z, CFG, 3, 0.7))
    np.testing.assert_allclose(fused, unfused, atol=2e-5)


def test_emulate_bf16_precision_sentinel(g_params):
    """The test-only "emulate_bf16" precision (models/pro_gan.
    _maybe_emulate_bf16) engages on the XLA conv/dense path: the render
    must differ from fp32 (bf16 rounding active — on CPU a plain DEFAULT
    render is exact fp32 and indistinguishable) but stay within the
    bf16-arithmetic error class, and both fused/unfused upconv paths must
    honor it. The serving/training ladders never map to this sentinel."""
    assert "emulate_bf16" not in pro_gan._PRECISIONS
    assert all(v != "emulate_bf16" for v in pro_gan._PACKED_MODES.values())
    z = jax.random.normal(jax.random.key(11), (2, CFG.latent_dim))
    exact = np.asarray(
        pro_gan.generator_rgb(g_params, z, CFG, 3, 0.7, precision="highest")
    ).astype(np.float64)
    for fuse in ("0", "1"):
        os.environ["PROBGAN_FUSE_UPCONV"] = fuse
        try:
            emul = np.asarray(
                pro_gan.generator_rgb(g_params, z, CFG, 3, 0.7,
                                      precision="emulate_bf16")
            ).astype(np.float64)
        finally:
            del os.environ["PROBGAN_FUSE_UPCONV"]
        err = np.abs(emul - exact)
        scale = np.abs(exact).max()
        assert err.max() > 1e-6 * scale, f"fuse={fuse}: emulation inactive"
        assert err.max() < 0.1 * scale, f"fuse={fuse}: error beyond bf16 class"
