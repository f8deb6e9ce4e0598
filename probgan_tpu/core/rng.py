"""Explicit RNG policy.

The reference generator samples its latent noise internally from torch's
global RNG (no RNG argument at any call site — pro_b_gan_infer.py:143,201),
which is non-reproducible across runs. TPU-native design makes randomness an
explicit, splittable input: the engine owns an ``RngStream`` seeded at
construction; each draw folds a (task, per-task counter) pair into the seed
key, so a given call sequence is deterministic (mirroring the semantics of a
freshly-seeded global torch RNG) while staying functional under jit.

Keys are derived PER TASK: the i-th draw for task "predict_tails" is the same
key no matter what other tasks ran before it. A single shared counter would
make every golden output depend on the global call order across all tasks —
reordering one test would silently invalidate every downstream golden.
"""

from __future__ import annotations

import zlib

import jax


class RngStream:
    """A task-keyed counter PRNG stream:
    ``key(task, i) = fold_in(fold_in(seed_key, crc32(task)), i)``."""

    def __init__(self, seed: int = 0):
        self._base = jax.random.key(seed)
        self._counters: dict[str, int] = {}

    def next_key(self, task: str = "") -> jax.Array:
        i = self._counters.get(task, 0)
        self._counters[task] = i + 1
        key = self._base
        if task:
            key = jax.random.fold_in(key, zlib.crc32(task.encode()) & 0x7FFFFFFF)
        return jax.random.fold_in(key, i)

    def counter(self, task: str = "") -> int:
        return self._counters.get(task, 0)
