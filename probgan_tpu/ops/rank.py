"""Ranking primitives: L2-normalize, cosine-similarity matmul, top-k.

These are the hot ops of the reference's flagship path (SURVEY.md §3.2):
``F.normalize(pred) @ F.normalize(node_emb).T`` then ``topk``
(pro_b_gan_infer.py:146-151). TPU-native differences:

- the entity table's normalization is computed ONCE at load time and cached
  (the reference re-normalizes the full [N, D] table on every call,
  pro_b_gan_infer.py:147);
- the matmul runs at ``Precision.HIGHEST`` by default so fp32 rankings are
  bit-stable for golden tests while still tiling onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# torch F.normalize epsilon (denominator clamp), for score parity.
_NORM_EPS = 1e-12


def l2_normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    """Row-wise L2 normalization matching ``F.normalize``'s eps semantics."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, _NORM_EPS)


def cosine_scores(
    query_norm: jax.Array,
    table_norm: jax.Array,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """[B, D] x [N, D] -> [B, N] cosine similarities (inputs pre-normalized)."""
    return jnp.matmul(query_norm, table_norm.T, precision=precision)


def rank_topk(
    query_norm: jax.Array, table_norm: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Fused rank: scores then per-row top-k. Returns (values, indices)."""
    return jax.lax.top_k(cosine_scores(query_norm, table_norm), k)


def cosine_similarity(a: jax.Array, b: jax.Array, axis: int = -1) -> jax.Array:
    """Elementwise-row cosine similarity, matching ``F.cosine_similarity``
    (pro_b_gan_infer.py:202): clamps each norm at eps=1e-8."""
    eps = 1e-8
    na = jnp.maximum(jnp.linalg.norm(a, axis=axis), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=axis), eps)
    return jnp.sum(a * b, axis=axis) / (na * nb)
