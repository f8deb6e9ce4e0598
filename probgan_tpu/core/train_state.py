"""Full-train-state checkpointing for resume.

The reference's checkpoint schema (C17) is inference-oriented: it carries the
best model but not the optimizer state, so training cannot continue from it.
This module adds the missing half (SURVEY.md §5.4 "resume"): the complete
train state — params, embedding tables, BOTH optimizer states, and loop
metadata (epoch, best-so-far, history) — serialized via
flax.serialization state-dicts so optax's nested NamedTuple states
round-trip through msgpack (raw msgpack would flatten them to lists).

Restore requires a template state with the same structure (built by the
trainer's init for the same architecture); values are poured into it with
``from_state_dict``.
"""

from __future__ import annotations

import os
from typing import Any

from flax import serialization


def save_train_state(path: str, state: Any, meta: dict) -> None:
    """Serialize (state pytree incl. optax states, loop metadata)."""
    payload = {
        "state": serialization.to_state_dict(state),
        "meta": meta,
    }
    blob = serialization.msgpack_serialize(payload)
    dirname = os.path.dirname(path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic on POSIX: no torn checkpoints on crash


def load_train_state(
    path: str, template: Any, alias_missing: dict[str, str] | None = None,
    grow: bool = False,
) -> tuple[Any, dict]:
    """Restore a train state into ``template``'s structure. Returns
    (state, meta).

    ``alias_missing``: schema-upgrade map for state files written before a
    top-level field existed — each missing key is seeded from the named
    sibling key (e.g. ``{"g_ema": "g_params"}`` for pre-EMA ProGAN states;
    flax state-dicts key NamedTuples by field name). Only the listed keys
    are upgraded; any other structure mismatch still raises.

    ``grow``: progressive-growth restore — the file may be a strict SUBTREE
    of ``template`` (e.g. a ProGAN state trained to 512² poured into a
    1024² template: the extra stage's params/EMA/Adam moments keep the
    template's fresh-init values while every trained leaf restores).
    File leaves absent from the template, or with a different shape, still
    raise — growing never silently drops or reshapes trained weights."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    sd = payload["state"]
    for missing, source in (alias_missing or {}).items():
        if missing not in sd and source in sd:
            sd[missing] = sd[source]
    if grow:
        sd = _merge_subtree(serialization.to_state_dict(template), sd)
    state = serialization.from_state_dict(template, sd)
    return state, payload["meta"]


def _merge_subtree(template_sd: Any, file_sd: Any, path: str = "") -> Any:
    """Pour ``file_sd`` into a copy of ``template_sd`` (dict-of-dict state
    dicts; flax renders list entries as stringified-index keys, so grown
    per-stage lists merge positionally). Every file entry must exist in the
    template with a matching leaf shape."""
    if isinstance(file_sd, dict):
        if not isinstance(template_sd, dict):
            raise ValueError(
                f"grow restore: '{path}' is a subtree in the file but a "
                f"leaf in the template"
            )
        merged = dict(template_sd)
        for key, val in file_sd.items():
            if key not in template_sd:
                raise ValueError(
                    f"grow restore: file entry '{path}/{key}' has no "
                    f"counterpart in the template state"
                )
            merged[key] = _merge_subtree(template_sd[key], val, f"{path}/{key}")
        return merged
    t_shape = getattr(template_sd, "shape", None)
    f_shape = getattr(file_sd, "shape", None)
    if t_shape != f_shape:
        raise ValueError(
            f"grow restore: leaf '{path}' shape {f_shape} != template "
            f"shape {t_shape} (incompatible architecture, not a growth)"
        )
    return file_sd
