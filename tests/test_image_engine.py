"""Image engine tests: generation, scoring, latent walks (BASELINE configs)."""

import jax
import numpy as np
import pytest

from probgan_tpu.engine.image import ImageGANEngine
from probgan_tpu.models import pro_gan

CFG = pro_gan.ProGANConfig(resolution=32, latent_dim=16, fmap_base=128, fmap_max=32)


@pytest.fixture(scope="module")
def engine():
    return ImageGANEngine(CFG, device="cpu", seed=0)


def test_generate_final_stage(engine):
    z = engine.sample_latents(4)
    imgs = engine.generate(z)
    assert imgs.shape == (4, 32, 32, 3)
    assert imgs.dtype == np.uint8


def test_generate_with_fade_in(engine):
    z = engine.sample_latents(2)
    a = engine.generate(z, stage=2, alpha=0.25)
    b = engine.generate(z, stage=2, alpha=0.75)
    assert a.shape == (2, 16, 16, 3)
    assert not np.array_equal(a, b)  # alpha actually blends


def test_generate_deterministic_given_latents(engine):
    z = np.ones((2, CFG.latent_dim), np.float32)
    np.testing.assert_array_equal(engine.generate(z), engine.generate(z))


def test_score_images(engine):
    z = engine.sample_latents(3)
    imgs = engine.generate(z).astype(np.float32) / 127.5 - 1.0
    logits = engine.score(imgs)
    assert logits.shape == (3,)
    assert np.all(np.isfinite(logits))


def test_latent_walk(engine):
    rng = np.random.RandomState(0)
    z0 = rng.standard_normal(CFG.latent_dim).astype(np.float32)
    z1 = rng.standard_normal(CFG.latent_dim).astype(np.float32)
    frames = engine.latent_walk(z0, z1, frames=8, stage=2)
    assert frames.shape == (8, 16, 16, 3)
    # The walk must equal direct generation of the interpolated latent batch
    # (same batch size — XLA rounding differs across batch shapes, so an
    # equal-batch comparison is the bit-exact contract).
    t = np.linspace(0.0, 1.0, 8, dtype=np.float32)[:, None]
    z = z0[None, :] * (1.0 - t) + z1[None, :] * t
    direct = engine.generate(z, stage=2)
    np.testing.assert_array_equal(frames, direct)


def test_pallas_and_jnp_denorm_agree(engine):
    """The Pallas-fused uint8 path (interpret mode on CPU) must produce the
    same pixels as the jnp path."""
    z = np.ones((2, CFG.latent_dim), np.float32)
    eng_pallas = ImageGANEngine(CFG, g_params=engine.g_params,
                                d_params=engine.d_params, device="cpu",
                                use_pallas=True)
    np.testing.assert_array_equal(engine.generate(z), eng_pallas.generate(z))
