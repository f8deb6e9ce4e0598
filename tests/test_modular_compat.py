"""The reference's import surface: ``from modular_prot_b_gan import ...``.

Exercises the exact lifecycle the reference performs on these classes
(pro_b_gan_infer.py:41,93-107,143,201,207,301): construct with dims, load a
torch-style state dict, .to(device), .eval(), call forward, score triplets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modular_prot_b_gan import ModularDiscriminator, ModularGenerator
from probgan_tpu.core.checkpoint import params_to_torch_state
from probgan_tpu.models import kg_gan

D, Z, H, N, R, B = 16, 8, 32, 50, 7, 4


@pytest.fixture(scope="module")
def tables():
    key = jax.random.key(0)
    kn, kr = jax.random.split(key)
    node = jax.random.normal(kn, (N, D), jnp.float32)
    rel = jax.random.normal(kr, (R, D), jnp.float32)
    return node, rel


def test_generator_reference_lifecycle(tables):
    node, rel = tables
    params = kg_gan.init_generator(jax.random.key(3), D, Z)
    gen = ModularGenerator(embed_dim=D, noise_dim=Z)
    gen.load_state_dict(params_to_torch_state(params))  # ref :97 (torch sd)
    gen.to("auto").eval()                               # ref :93,:106
    assert gen.training is False

    h, r = node[:B], rel[:B]
    out = gen(h, r)                                     # ref :143 — no noise arg
    assert out.shape == (B, D)
    # explicit noise must match the pure function exactly
    z = jax.random.normal(jax.random.key(9), (B, Z), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(gen(h, r, z=z)),
        np.asarray(kg_gan.generator_apply(params, h, r, z)),
    )


def test_generator_internal_noise_is_deterministic_per_sequence(tables):
    node, rel = tables
    h, r = node[:B], rel[:B]
    a1 = ModularGenerator(D, Z, seed=5)
    a2 = ModularGenerator(D, Z, seed=5)
    # same seed, same call index -> same noise; successive calls differ
    np.testing.assert_array_equal(np.asarray(a1(h, r)), np.asarray(a2(h, r)))
    assert not np.array_equal(np.asarray(a1(h, r)), np.asarray(a2(h, r, z=jnp.zeros((B, Z)))))


def test_discriminator_reference_lifecycle(tables):
    node, rel = tables
    params = kg_gan.init_discriminator(jax.random.key(4), D, H)
    disc = ModularDiscriminator(embed_dim=D, hidden_dim=H)
    disc.load_state_dict(params_to_torch_state(params))
    disc.to("cpu").eval()

    trip = jnp.asarray([[0, 1, 2], [3, 4, 5], [6, 0, 7], [1, 2, 3]], jnp.int32)
    h, r, t = node[trip[:, 0]], rel[trip[:, 1]], node[trip[:, 2]]
    logit = disc(h, r, t)                               # ref :301
    assert logit.shape == (B,)

    logits, probs = disc.score_triplets(node, rel, trip)  # ref :207
    want_logits, want_probs = kg_gan.discriminator_score_triplets(
        params, node, rel, trip
    )
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(want_logits))
    np.testing.assert_array_equal(np.asarray(probs), np.asarray(want_probs))
    # ``.tolist()`` is how the reference consumes these (ref :208-209)
    assert isinstance(logits.tolist(), list)
    # rel_emb may also arrive as the Embedding state_dict ({'weight': ...})
    logits2, _ = disc.score_triplets(node, {"weight": rel}, trip.tolist())
    np.testing.assert_array_equal(np.asarray(logits2), np.asarray(logits))


def test_load_state_dict_accepts_native_pytree_and_rejects_mismatch():
    params = kg_gan.init_generator(jax.random.key(7), D, Z)
    gen = ModularGenerator(D, Z)
    gen.load_state_dict(jax.tree.map(np.asarray, params))  # native nested form
    z = jnp.zeros((2, Z), jnp.float32)
    h = jnp.ones((2, D), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(gen(h, h, z=z)),
        np.asarray(kg_gan.generator_apply(params, h, h, z)),
    )
    with pytest.raises(ValueError, match="state dict mismatch"):
        gen.load_state_dict({"fc1.weight": np.zeros((2 * D, 2 * D + Z))})


def test_torch_tensor_inputs(tables):
    torch = pytest.importorskip("torch")
    node, rel = tables
    gen = ModularGenerator(D, Z, seed=1)
    h_t = torch.tensor(np.asarray(node[:B]))
    r_t = torch.tensor(np.asarray(rel[:B]))
    z = np.zeros((B, Z), np.float32)
    np.testing.assert_array_equal(
        np.asarray(gen(h_t, r_t, z=z)),
        np.asarray(gen(np.asarray(node[:B]), np.asarray(rel[:B]), z=z)),
    )


def test_state_dict_round_trip():
    disc = ModularDiscriminator(D, H, seed=2)
    sd = disc.state_dict()
    assert set(sd) == {f"fc{i}.{k}" for i in (1, 2, 3) for k in ("weight", "bias")}
    other = ModularDiscriminator(D, H, seed=99)
    other.load_state_dict(sd)
    node = jnp.ones((3, D), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(other(node, node, node)), np.asarray(disc(node, node, node))
    )


def test_strict_load_rejects_shape_mismatch():
    """Strict load must raise at LOAD time on wrong-shaped leaves (torch
    semantics) instead of failing later inside a jitted apply."""
    gen = ModularGenerator(embed_dim=D, noise_dim=Z)
    params = kg_gan.init_generator(jax.random.key(4), D, Z)
    sd = params_to_torch_state(params)
    bad = dict(sd)
    bad["fc1.weight"] = np.zeros((3, 3), np.float32)  # wrong shape, right key
    with pytest.raises(ValueError, match="size mismatch"):
        gen.load_state_dict(bad)
    # the original, well-shaped dict still loads
    gen.load_state_dict(sd)
