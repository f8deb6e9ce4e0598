"""Object-style wrappers matching the reference's ``modular_prot_b_gan`` API.

The reference does ``from modular_prot_b_gan import ModularGenerator,
ModularDiscriminator`` (pro_b_gan_infer.py:41) — the module itself is missing
from the reference repo, but its call-site contract is fully pinned down
(SURVEY.md §2.3 C9/C10):

- ``ModularGenerator(embed_dim, noise_dim)`` then ``load_state_dict(sd)``,
  ``.to(device)``, ``.eval()`` (pro_b_gan_infer.py:93,97,106);
  forward ``gen(h_emb [B,D], r_emb [B,D]) -> t̂_emb [B,D]`` with noise sampled
  internally (pro_b_gan_infer.py:143,201 pass no noise argument).
- ``ModularDiscriminator(embed_dim, hidden_dim)`` same lifecycle
  (pro_b_gan_infer.py:94,98,107); forward ``disc(h, r, t) -> logit``
  (pro_b_gan_infer.py:301); plus
  ``disc.score_triplets(node_emb, rel_emb, triplets) -> (logits, probs)``
  doing its own gathers + sigmoid (pro_b_gan_infer.py:207).

These classes are thin stateful shells over the pure functions in
``models/kg_gan.py`` (the framework's real compute path — the engine never
uses these shells; they exist so user code written against the reference's
import keeps working). Weights live as a JAX pytree; ``load_state_dict``
accepts both torch-style flat dicts (``fc1.weight``/``fc1.bias``, transposed)
and the native nested pytree. Inputs may be JAX arrays, NumPy arrays, lists,
or CPU torch tensors (anything ``np.asarray`` understands); outputs are JAX
arrays whose ``.tolist()`` matches the reference's tensor usage.
"""

from __future__ import annotations

from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from probgan_tpu.core.checkpoint import (
    params_to_torch_state,
    torch_state_to_params,
)
from probgan_tpu.core.device import resolve_device
from probgan_tpu.models import kg_gan

__all__ = ["ModularGenerator", "ModularDiscriminator"]


def _as_f32(x: Any) -> jax.Array:
    if isinstance(x, jax.Array):
        return x.astype(jnp.float32)
    return jnp.asarray(np.asarray(x), dtype=jnp.float32)


def _as_i32(x: Any) -> jax.Array:
    if isinstance(x, jax.Array):
        return x.astype(jnp.int32)
    return jnp.asarray(np.asarray(x), dtype=jnp.int32)


class _Module:
    """Shared lifecycle surface (load_state_dict / state_dict / to / eval)."""

    params: dict

    def load_state_dict(self, state: dict, strict: bool = True) -> None:
        if state and all(isinstance(v, dict) for v in state.values()):
            params = jax.tree.map(_as_f32, state)  # native nested pytree
        else:
            params = jax.tree.map(_as_f32, torch_state_to_params(state))
        if strict:
            want = {jax.tree_util.keystr(k): v.shape for k, v in
                    jax.tree_util.tree_leaves_with_path(self.params)}
            got = {jax.tree_util.keystr(k): v.shape for k, v in
                   jax.tree_util.tree_leaves_with_path(params)}
            if want.keys() != got.keys():
                missing = want.keys() - got.keys()
                unexpected = got.keys() - want.keys()
                raise ValueError(
                    f"state dict mismatch: missing={sorted(missing)} "
                    f"unexpected={sorted(unexpected)}"
                )
            # Shape check too: torch's strict load raises on size mismatch at
            # load time; without this a wrong-shaped array loads silently and
            # only fails later inside a jitted apply.
            bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
            if bad:
                raise ValueError(
                    "state dict size mismatch (got != expected): "
                    + ", ".join(
                        f"{k}: {g} != {w}" for k, (g, w) in sorted(bad.items())
                    )
                )
        self.params = params

    def state_dict(self) -> dict:
        """Torch-style flat state dict (``fcN.weight`` transposed, ``fcN.bias``)."""
        return params_to_torch_state(self.params)

    def to(self, device: Any = "auto") -> "_Module":
        """Accepts 'auto'/'tpu'/'cuda'/'cpu' (reference --device values),
        a jax.Device, or an object with a ``.type`` attribute (torch.device)."""
        if hasattr(device, "platform"):  # jax.Device
            dev = device
        else:
            name = getattr(device, "type", device)
            dev = resolve_device(str(name))
        self.params = jax.device_put(self.params, dev)
        return self

    def eval(self) -> "_Module":
        self.training = False
        return self

    def train(self, mode: bool = True) -> "_Module":
        self.training = mode
        return self

    def parameters(self) -> Iterator[jax.Array]:
        yield from jax.tree.leaves(self.params)


class ModularGenerator(_Module):
    """``gen(h_emb, r_emb) -> t̂_emb`` with internally sampled noise.

    The reference's call sites pass no noise (pro_b_gan_infer.py:143,201), so
    each call folds an internal counter into the seed key — deterministic for
    a given (seed, call sequence), like a torch module holding an RNG state.
    Pass ``z=...`` to make the noise explicit (the framework-native form used
    by the engine and trainer).
    """

    def __init__(self, embed_dim: int = 128, noise_dim: int = 64,
                 seed: int = 0):
        self.embed_dim = int(embed_dim)
        self.noise_dim = int(noise_dim)
        self.training = True
        self._key = jax.random.key(seed)
        self._calls = 0
        self.params = kg_gan.init_generator(
            jax.random.fold_in(jax.random.key(seed), 1),
            self.embed_dim, self.noise_dim,
        )
        self._apply = jax.jit(kg_gan.generator_apply)

    def __call__(self, h_emb: Any, r_emb: Any, z: Any | None = None) -> jax.Array:
        h, r = _as_f32(h_emb), _as_f32(r_emb)
        if z is None:
            self._calls += 1
            zkey = jax.random.fold_in(self._key, self._calls)
            z = jax.random.normal(zkey, (h.shape[0], self.noise_dim), jnp.float32)
        else:
            z = _as_f32(z)
        return self._apply(self.params, h, r, z)

    forward = __call__


class ModularDiscriminator(_Module):
    """``disc(h, r, t) -> logit [B]`` plus the model-owned
    ``score_triplets`` path (gathers from the raw tables + sigmoid)."""

    def __init__(self, embed_dim: int = 128, hidden_dim: int = 1024,
                 seed: int = 0):
        self.embed_dim = int(embed_dim)
        self.hidden_dim = int(hidden_dim)
        self.training = True
        self.params = kg_gan.init_discriminator(
            jax.random.fold_in(jax.random.key(seed), 2),
            self.embed_dim, self.hidden_dim,
        )
        self._apply = jax.jit(kg_gan.discriminator_apply)
        self._score = jax.jit(kg_gan.discriminator_score_triplets)

    def __call__(self, h_emb: Any, r_emb: Any, t_emb: Any) -> jax.Array:
        return self._apply(self.params, _as_f32(h_emb), _as_f32(r_emb),
                           _as_f32(t_emb))

    forward = __call__

    def score_triplets(
        self, node_emb: Any, rel_emb: Any, triplets: Any
    ) -> tuple[jax.Array, jax.Array]:
        """(node_emb [N,D], rel_emb [R,D] or {'weight': [R,D]}, triplets [B,3])
        -> (logits [B], probs [B]) — pro_b_gan_infer.py:207 semantics."""
        if isinstance(rel_emb, dict):
            rel_emb = rel_emb["weight"]
        return self._score(self.params, _as_f32(node_emb), _as_f32(rel_emb),
                           _as_i32(triplets))
