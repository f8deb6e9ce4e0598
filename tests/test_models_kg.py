"""Unit tests for the KG-GAN model family (models/kg_gan.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from probgan_tpu.models import kg_gan


def test_generator_shapes_and_determinism():
    key = jax.random.key(0)
    params = kg_gan.init_generator(key, embed_dim=16, noise_dim=8)
    h = jax.random.normal(jax.random.key(1), (4, 16))
    r = jax.random.normal(jax.random.key(2), (4, 16))
    z = jax.random.normal(jax.random.key(3), (4, 8))
    out1 = kg_gan.generator_apply(params, h, r, z)
    out2 = kg_gan.generator_apply(params, h, r, z)
    assert out1.shape == (4, 16)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_generator_dims_roundtrip():
    params = kg_gan.init_generator(jax.random.key(0), embed_dim=32, noise_dim=12)
    assert kg_gan.generator_dims(params) == (32, 12)


def test_discriminator_logit_shape():
    params = kg_gan.init_discriminator(jax.random.key(0), embed_dim=16, hidden_dim=32)
    e = jax.random.normal(jax.random.key(1), (5, 16))
    logits = kg_gan.discriminator_apply(params, e, e, e)
    assert logits.shape == (5,)
    assert kg_gan.discriminator_dims(params) == (16, 32)


def test_score_triplets_matches_manual_gather():
    """score_triplets must equal gather-then-forward (pro_b_gan_infer.py:207
    does its own gathers; SURVEY.md §3.3)."""
    key = jax.random.key(0)
    params = kg_gan.init_discriminator(key, embed_dim=16, hidden_dim=32)
    node = jax.random.normal(jax.random.key(1), (10, 16))
    rel = jax.random.normal(jax.random.key(2), (3, 16))
    trips = jnp.array([[0, 1, 2], [3, 0, 4], [9, 2, 0]], dtype=jnp.int32)

    logits, probs = kg_gan.discriminator_score_triplets(params, node, rel, trips)
    manual = kg_gan.discriminator_apply(
        params, node[trips[:, 0]], rel[trips[:, 1]], node[trips[:, 2]]
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(manual), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(probs), 1.0 / (1.0 + np.exp(-np.asarray(manual))), rtol=1e-5
    )


def test_jit_compatible():
    g = kg_gan.init_generator(jax.random.key(0), 16, 8)
    fwd = jax.jit(kg_gan.generator_apply)
    h = jnp.ones((2, 16))
    z = jnp.zeros((2, 8))
    out = fwd(g, h, h, z)
    assert out.shape == (2, 16)
    assert bool(jnp.all(jnp.isfinite(out)))
