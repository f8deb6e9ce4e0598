"""Checkpoint I/O for the reference checkpoint schema (SURVEY.md §2.3 C17).

Logical schema (key names match the reference exactly,
pro_b_gan_infer.py:74-112):

    {
      'args': {'embed_dim': int, 'noise_dim': int, 'hidden_dim': int, ...},
      'node_emb': float32 [num_entities, embed_dim],
      'rel_emb': {'weight': float32 [num_relations, embed_dim]},
      'generator': <generator params>,
      'discriminator': <discriminator params>,
      'best_val_hit10': float,
      'best_epoch': int,
      'training_history': dict,
    }

Two physical formats are supported transparently:

- **native** — msgpack (flax.serialization) of the dict above with JAX-layout
  params (``{'fc1': {'w' [in,out], 'b'}, ...}``). This is the format our
  trainer writes.
- **torch ``.pt``** — the reference's artifact (written by the missing
  trainer, loaded at pro_b_gan_infer.py:74). We both READ and WRITE it (torch
  runs CPU-side here), converting between torch Linear layout
  (``fcN.weight [out,in]``) and JAX layout (``fcN.w [in,out]``), so seeds and
  checkpoints are shared with the reference ecosystem.

Format detection on load is by file content (zip magic / pickle protocol for
torch), not extension, so a reference-named ``best_checkpoint.pt`` holding
either format loads correctly.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
from flax import serialization

CHECKPOINT_KEYS = (
    "args",
    "node_emb",
    "rel_emb",
    "generator",
    "discriminator",
    "best_val_hit10",
    "best_epoch",
    "training_history",
)

# MLP param layouts used by the KG models (models/kg_gan.py).
_MLP_LAYERS = ("fc1", "fc2", "fc3")


# ---------------------------------------------------------------------------
# torch <-> JAX param conversion (KG MLPs)
# ---------------------------------------------------------------------------

def params_to_torch_state(params: dict) -> dict:
    """JAX MLP params -> torch-style state dict (weights transposed)."""
    state = {}
    for name, layer in params.items():
        state[f"{name}.weight"] = np.asarray(layer["w"]).T.copy()
        state[f"{name}.bias"] = np.asarray(layer["b"]).copy()
    return state


def torch_state_to_params(state: dict) -> dict:
    """torch-style state dict -> JAX MLP params (weights transposed)."""
    params: dict = {}
    for key, value in state.items():
        arr = np.asarray(value, dtype=np.float32)
        name, _, kind = key.rpartition(".")
        layer = params.setdefault(name, {})
        if kind == "weight":
            layer["w"] = arr.T.copy()
        elif kind == "bias":
            layer["b"] = arr
        else:  # tolerate unknown key layouts (SURVEY.md §7.3)
            layer[kind] = arr
    return params


# ---------------------------------------------------------------------------
# save
# ---------------------------------------------------------------------------

def _to_numpy_tree(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _to_numpy_tree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_to_numpy_tree(v) for v in tree)
    if hasattr(tree, "shape") and hasattr(tree, "dtype"):
        return np.asarray(tree)
    return tree


def save_checkpoint(path: str, checkpoint: dict, format: str = "auto") -> None:
    """Save a checkpoint dict.

    format: 'native' (msgpack), 'torch' (.pt via torch.save), 'orbax'
    (directory checkpoint via orbax — sharded/async-capable, the right
    backend once the entity table outgrows a single host buffer), or 'auto'
    (torch when the path ends in .pt, orbax for a .orbax suffix, else
    native).
    """
    if format == "auto":
        if path.endswith(".pt"):
            format = "torch"
        elif path.rstrip("/").endswith(".orbax"):
            format = "orbax"
        else:
            format = "native"
    checkpoint = _to_numpy_tree(checkpoint)
    dirname = os.path.dirname(path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)

    if format == "torch":
        import torch

        def tt(a):
            return torch.from_numpy(np.array(a, copy=True))

        state = dict(checkpoint)
        state["node_emb"] = tt(checkpoint["node_emb"])
        state["rel_emb"] = {"weight": tt(checkpoint["rel_emb"]["weight"])}
        state["generator"] = {
            k: tt(v) for k, v in params_to_torch_state(checkpoint["generator"]).items()
        }
        state["discriminator"] = {
            k: tt(v)
            for k, v in params_to_torch_state(checkpoint["discriminator"]).items()
        }
        torch.save(state, path)
    elif format == "native":
        blob = serialization.msgpack_serialize(checkpoint)
        with open(path, "wb") as f:
            f.write(blob)
    elif format == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), checkpoint, force=True)
    else:
        raise ValueError(f"Unknown checkpoint format: {format!r}")


# ---------------------------------------------------------------------------
# load
# ---------------------------------------------------------------------------

def _looks_like_torch(path: str) -> bool:
    with open(path, "rb") as f:
        magic = f.read(2)
    # torch>=1.6 zip archives start with 'PK'; legacy torch pickles start with
    # pickle PROTO opcode 0x80 followed by a protocol byte 2..5. The protocol
    # check matters: a native msgpack whose top level is an empty fixmap also
    # starts with 0x80, but its next byte is a msgpack type tag, never 2..5.
    if magic[:2] == b"PK":
        return True
    return len(magic) == 2 and magic[0] == 0x80 and 2 <= magic[1] <= 5


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint from either physical format into the logical schema
    with numpy arrays and JAX-layout params.

    Raises FileNotFoundError with the reference's message shape
    (pro_b_gan_infer.py:71-72).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"Checkpoint not found: {path}")

    if os.path.isdir(path):  # orbax directory checkpoint
        import orbax.checkpoint as ocp

        return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))

    if _looks_like_torch(path):
        import torch

        try:
            raw = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            # weights_only rejects any pickled non-tensor object. The C17
            # schema is tensors + plain containers, so this path should be
            # rare; full unpickling executes arbitrary code from the file and
            # therefore requires an explicit opt-in for untrusted paths.
            if os.environ.get("PROBGAN_TORCH_UNSAFE_LOAD", "0") != "1":
                raise ValueError(
                    f"{path} requires full (unsafe) torch unpickling; set "
                    "PROBGAN_TORCH_UNSAFE_LOAD=1 to allow it for a trusted file"
                )
            raw = torch.load(path, map_location="cpu", weights_only=False)
        ckpt = dict(raw)
        ckpt["node_emb"] = np.asarray(raw["node_emb"].detach().numpy(), np.float32)
        ckpt["rel_emb"] = {
            "weight": np.asarray(raw["rel_emb"]["weight"].detach().numpy(), np.float32)
        }
        ckpt["generator"] = torch_state_to_params(
            {k: v.detach().numpy() for k, v in raw["generator"].items()}
        )
        ckpt["discriminator"] = torch_state_to_params(
            {k: v.detach().numpy() for k, v in raw["discriminator"].items()}
        )
        return ckpt

    with open(path, "rb") as f:
        blob = f.read()
    return serialization.msgpack_restore(blob)
