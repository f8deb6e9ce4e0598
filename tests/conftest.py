"""Test harness config.

Tests run on an 8-device virtual CPU mesh (SURVEY.md §4: distributed-without-
a-cluster) so sharding paths are exercised without TPU hardware. These env
vars must be set before jax is imported anywhere in the test process.
"""

import os

# Force CPU: the session environment may pin JAX_PLATFORMS to a TPU plugin
# (e.g. 'axon') and may pre-import jax from a sitecustomize, so setting env
# vars here is too late — use jax.config.update, which takes effect as long
# as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from probgan_tpu.core.checkpoint import save_checkpoint  # noqa: E402
from probgan_tpu.models import kg_gan  # noqa: E402

# Tiny-but-nontrivial dims for fast tests.
NUM_ENTITIES = 50
NUM_RELATIONS = 7
EMBED_DIM = 16
NOISE_DIM = 8
HIDDEN_DIM = 32


def make_checkpoint_dict(seed: int = 0) -> dict:
    """A tiny, deterministic checkpoint in the C17 schema (SURVEY.md §2.3)."""
    key = jax.random.key(seed)
    k_node, k_rel, k_gen, k_disc = jax.random.split(key, 4)
    return {
        "args": {
            "embed_dim": EMBED_DIM,
            "noise_dim": NOISE_DIM,
            "hidden_dim": HIDDEN_DIM,
        },
        "node_emb": np.asarray(
            jax.random.normal(k_node, (NUM_ENTITIES, EMBED_DIM)), np.float32
        ),
        "rel_emb": {
            "weight": np.asarray(
                jax.random.normal(k_rel, (NUM_RELATIONS, EMBED_DIM)), np.float32
            )
        },
        "generator": jax.tree.map(
            np.asarray, kg_gan.init_generator(k_gen, EMBED_DIM, NOISE_DIM)
        ),
        "discriminator": jax.tree.map(
            np.asarray, kg_gan.init_discriminator(k_disc, EMBED_DIM, HIDDEN_DIM)
        ),
        "best_val_hit10": 0.4321,
        "best_epoch": 17,
        "training_history": {"val_hit10": [0.1, 0.3, 0.4321]},
    }


@pytest.fixture(scope="session")
def ckpt_dict():
    return make_checkpoint_dict()


@pytest.fixture(scope="session")
def native_ckpt_path(tmp_path_factory, ckpt_dict):
    path = tmp_path_factory.mktemp("ckpt") / "best_checkpoint.msgpack"
    save_checkpoint(str(path), ckpt_dict, format="native")
    return str(path)


@pytest.fixture(scope="session")
def torch_ckpt_path(tmp_path_factory, ckpt_dict):
    path = tmp_path_factory.mktemp("ckpt_pt") / "best_checkpoint.pt"
    save_checkpoint(str(path), ckpt_dict, format="torch")
    return str(path)
