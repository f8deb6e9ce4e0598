"""Cross-framework artifact interop: a checkpoint written by this framework's
trainer in torch ``.pt`` format must be directly consumable by a pure-torch
consumer (the reference's ecosystem), and produce the same scores.

This is the strongest form of the C17 contract (SURVEY.md §5.4 "seeds/
checkpoints are shared"): we build the inferred ModularGenerator /
ModularDiscriminator architectures as ACTUAL torch nn.Modules, load the
state dicts from the .pt with strict=True, and compare forward passes
against this framework's engine.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from probgan_tpu.engine import InferenceEngine
from tests.conftest import EMBED_DIM, HIDDEN_DIM, NOISE_DIM


class TorchModularGenerator(nn.Module):
    """The inferred C9 contract as a torch module (models/kg_gan.py)."""

    def __init__(self, embed_dim: int, noise_dim: int):
        super().__init__()
        d, z = embed_dim, noise_dim
        self.fc1 = nn.Linear(2 * d + z, 2 * d)
        self.fc2 = nn.Linear(2 * d, 2 * d)
        self.fc3 = nn.Linear(2 * d, d)
        self.act = nn.LeakyReLU(0.2)

    def forward(self, h, r, z):
        x = torch.cat([h, r, z], dim=-1)
        return self.fc3(self.act(self.fc2(self.act(self.fc1(x)))))


class TorchModularDiscriminator(nn.Module):
    """The inferred C10 contract as a torch module."""

    def __init__(self, embed_dim: int, hidden_dim: int):
        super().__init__()
        self.fc1 = nn.Linear(3 * embed_dim, hidden_dim)
        self.fc2 = nn.Linear(hidden_dim, hidden_dim)
        self.fc3 = nn.Linear(hidden_dim, 1)
        self.act = nn.LeakyReLU(0.2)

    def forward(self, h, r, t):
        x = torch.cat([h, r, t], dim=-1)
        return self.fc3(self.act(self.fc2(self.act(self.fc1(x)))))[..., 0]


@pytest.fixture(scope="module")
def torch_side(torch_ckpt_path):
    raw = torch.load(torch_ckpt_path, map_location="cpu", weights_only=False)
    gen = TorchModularGenerator(EMBED_DIM, NOISE_DIM)
    disc = TorchModularDiscriminator(EMBED_DIM, HIDDEN_DIM)
    # strict=True: the artifact's key layout must exactly match real torch
    # Linear modules.
    gen.load_state_dict(raw["generator"], strict=True)
    disc.load_state_dict(raw["discriminator"], strict=True)
    gen.eval()
    disc.eval()
    node = raw["node_emb"]
    rel = raw["rel_emb"]["weight"]
    return gen, disc, node, rel


def test_torch_loads_artifact_strict(torch_side):
    gen, disc, node, rel = torch_side
    assert node.shape[1] == EMBED_DIM
    assert rel.shape[1] == EMBED_DIM


def test_discriminator_scores_match_engine(torch_side, torch_ckpt_path):
    """Pure-torch forward over the .pt == this framework's engine output."""
    gen, disc, node, rel = torch_side
    trips = [(0, 1, 2), (7, 3, 9), (4, 0, 0)]

    with torch.no_grad():
        idx = torch.tensor(trips)
        t_logits = disc(node[idx[:, 0]], rel[idx[:, 1]], node[idx[:, 2]]).numpy()

    engine = InferenceEngine(torch_ckpt_path, device="cpu")
    res = engine.score_triplets(trips, method="discriminator")
    np.testing.assert_allclose(
        res["discriminator_logits"], t_logits, rtol=1e-4, atol=1e-5
    )


def test_generator_forward_matches_with_shared_noise(torch_side, ckpt_dict):
    """Same embeddings + same explicit noise -> same generator output in both
    frameworks (the PRNG-parity strategy of SURVEY.md §7.3: make noise an
    explicit input)."""
    import jax.numpy as jnp

    from probgan_tpu.models import kg_gan

    gen, _, node, rel = torch_side
    rng = np.random.RandomState(5)
    z = rng.standard_normal((4, NOISE_DIM)).astype(np.float32)
    h_ids, r_ids = [0, 1, 2, 3], [0, 1, 2, 3]

    with torch.no_grad():
        t_out = gen(
            node[torch.tensor(h_ids)], rel[torch.tensor(r_ids)], torch.from_numpy(z)
        ).numpy()

    j_out = kg_gan.generator_apply(
        ckpt_dict["generator"],
        jnp.asarray(ckpt_dict["node_emb"])[jnp.asarray(h_ids)],
        jnp.asarray(ckpt_dict["rel_emb"]["weight"])[jnp.asarray(r_ids)],
        jnp.asarray(z),
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=1e-4, atol=1e-5)
