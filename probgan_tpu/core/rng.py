"""Explicit RNG policy.

The reference generator samples its latent noise internally from torch's
global RNG (no RNG argument at any call site — pro_b_gan_infer.py:143,201),
which is non-reproducible across runs. TPU-native design makes randomness an
explicit, splittable input: the engine owns an ``RngStream`` seeded at
construction; each draw folds in a monotone counter, so a freshly-constructed
engine is deterministic for a given call sequence (mirroring the semantics of
a freshly-seeded global torch RNG) while staying functional under jit.
"""

from __future__ import annotations

import jax


class RngStream:
    """A counter-based PRNG key stream: ``key_i = fold_in(seed_key, i)``."""

    def __init__(self, seed: int = 0):
        self._base = jax.random.key(seed)
        self._counter = 0

    def next_key(self) -> jax.Array:
        key = jax.random.fold_in(self._base, self._counter)
        self._counter += 1
        return key

    @property
    def counter(self) -> int:
        return self._counter
