"""Knowledge-graph GAN: ModularGenerator / ModularDiscriminator equivalents.

The reference imports ``ModularGenerator, ModularDiscriminator`` from a module
that is NOT present in the repo (pro_b_gan_infer.py:41); their internals are
unconstrained beyond the call-site contract. This module freezes an inferred
architecture and documents it as the contract (SURVEY.md §2.3 C9/C10, §7.3):

Generator (ctor ``(embed_dim=128, noise_dim=64)``, pro_b_gan_infer.py:93):
    forward ``(h_emb [B,D], r_emb [B,D], z [B,Z]) -> t̂_emb [B,D]``
    (call sites pro_b_gan_infer.py:143,201 — noise is internal there; here it
    is an explicit input, see core/rng.py).
    Architecture: concat[h,r,z] -> Dense(2D) -> LeakyReLU(0.2)
                                -> Dense(2D) -> LeakyReLU(0.2) -> Dense(D).

Discriminator (ctor ``(embed_dim=128, hidden_dim=1024)``, pro_b_gan_infer.py:94):
    forward ``(h,r,t) -> logit [B]`` (pro_b_gan_infer.py:301);
    extra classmethod-style ``score_triplets(params, node_emb, rel_emb,
    triplets) -> (logits, probs)`` doing its own gathers + sigmoid
    (pro_b_gan_infer.py:207).
    Architecture: concat[h,r,t] -> Dense(H) -> LeakyReLU(0.2)
                                -> Dense(H) -> LeakyReLU(0.2) -> Dense(1).

Everything is a pure function over a params pytree, so the engine can jit /
pjit / vmap freely. Params are stored fp32; matmul precision is selectable at
the call sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.2


def _dense_init(key: jax.Array, fan_in: int, fan_out: int) -> dict:
    """He-normal init appropriate for LeakyReLU MLPs. Kernel is stored
    ``[fan_in, fan_out]`` (JAX convention; the torch interop layer in
    core/checkpoint.py transposes)."""
    w = jax.random.normal(key, (fan_in, fan_out), dtype=jnp.float32)
    w = w * jnp.sqrt(2.0 / fan_in)
    return {"w": w, "b": jnp.zeros((fan_out,), dtype=jnp.float32)}


def _dense(params: dict, x: jax.Array) -> jax.Array:
    return x @ params["w"] + params["b"]


def _lrelu(x: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=LRELU_SLOPE)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def init_generator(key: jax.Array, embed_dim: int = 128, noise_dim: int = 64) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    d, z = embed_dim, noise_dim
    return {
        "fc1": _dense_init(k1, 2 * d + z, 2 * d),
        "fc2": _dense_init(k2, 2 * d, 2 * d),
        "fc3": _dense_init(k3, 2 * d, d),
    }


def generator_apply(
    params: dict, h_emb: jax.Array, r_emb: jax.Array, z: jax.Array
) -> jax.Array:
    """(h_emb [B,D], r_emb [B,D], z [B,Z]) -> predicted tail embedding [B,D]."""
    x = jnp.concatenate([h_emb, r_emb, z], axis=-1)
    x = _lrelu(_dense(params["fc1"], x))
    x = _lrelu(_dense(params["fc2"], x))
    return _dense(params["fc3"], x)


def generator_dims(params: dict) -> tuple[int, int]:
    """Recover (embed_dim, noise_dim) from a params pytree."""
    embed_dim = params["fc3"]["w"].shape[1]
    noise_dim = params["fc1"]["w"].shape[0] - 2 * embed_dim
    return embed_dim, noise_dim


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------

def init_discriminator(
    key: jax.Array, embed_dim: int = 128, hidden_dim: int = 1024
) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    d, hdim = embed_dim, hidden_dim
    return {
        "fc1": _dense_init(k1, 3 * d, hdim),
        "fc2": _dense_init(k2, hdim, hdim),
        "fc3": _dense_init(k3, hdim, 1),
    }


def discriminator_apply(
    params: dict, h_emb: jax.Array, r_emb: jax.Array, t_emb: jax.Array
) -> jax.Array:
    """(h,r,t embeddings [B,D] each) -> realness logit [B]
    (pro_b_gan_infer.py:301 uses the scalar of a B=1 call)."""
    x = jnp.concatenate([h_emb, r_emb, t_emb], axis=-1)
    x = _lrelu(_dense(params["fc1"], x))
    x = _lrelu(_dense(params["fc2"], x))
    return _dense(params["fc3"], x)[..., 0]


def discriminator_score_triplets(
    params: dict,
    node_emb: jax.Array,
    rel_emb: jax.Array,
    triplets: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """The model-owned scoring path: does its own gathers from the raw tables
    then sigmoid, mirroring ``Discriminator.score_triplets``
    (pro_b_gan_infer.py:207; SURVEY.md §3.3 notes the model owns its lookup).

    Args:
        node_emb: [N, D] entity table.
        rel_emb:  [R, D] relation table.
        triplets: [B, 3] int ids (h, r, t).

    Returns:
        (logits [B], probs [B]).
    """
    h = node_emb[triplets[:, 0]]
    r = rel_emb[triplets[:, 1]]
    t = node_emb[triplets[:, 2]]
    logits = discriminator_apply(params, h, r, t)
    return logits, jax.nn.sigmoid(logits)


def discriminator_dims(params: dict) -> tuple[int, int]:
    """Recover (embed_dim, hidden_dim) from a params pytree."""
    hidden_dim = params["fc1"]["w"].shape[1]
    embed_dim = params["fc1"]["w"].shape[0] // 3
    return embed_dim, hidden_dim
