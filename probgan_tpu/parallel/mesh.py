"""Mesh construction helpers.

Axes convention (SURVEY.md §2.2):
- ``data``  — batch data parallelism (queries / latents / images).
- ``model`` — tensor parallelism: the entity table ``node_emb [N, D]`` is
  sharded over rows so the ranking matmul's N axis (the reference's only
  scaling axis, SURVEY.md §5.7) splits across chips.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None,
    model_parallelism: int | None = None,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices.

    ``model_parallelism`` defaults to the largest power of two <= sqrt(n) that
    divides n — a balanced split for the rank matmul; pass 1 for pure DP or
    n for pure TP.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]

    if model_parallelism is None:
        model_parallelism = 1
        while (
            model_parallelism * 2 <= n_devices
            and n_devices % (model_parallelism * 2) == 0
            and (model_parallelism * 2) ** 2 <= n_devices * 2
        ):
            model_parallelism *= 2
    if n_devices % model_parallelism != 0:
        raise ValueError(
            f"model_parallelism={model_parallelism} must divide n_devices={n_devices}"
        )

    grid = np.asarray(devices).reshape(n_devices // model_parallelism, model_parallelism)
    return Mesh(grid, axis_names)


def resolve_mesh(spec) -> Mesh | None:
    """User-facing mesh spec -> Mesh or None (single device).

    Accepts None/""/"1"/1 (off), "auto" (all attached devices), an int device
    count, or a prebuilt Mesh. A resolved mesh of one device collapses to
    None so callers keep the plain single-device path."""
    if spec in (None, "", "1", 1):
        return None
    if isinstance(spec, Mesh):
        if spec.devices.size <= 1:
            # A degenerate single-device mesh is "no mesh" regardless of its
            # axis names — the axis-name contract below only matters when a
            # mesh path will actually run.
            return None
        # The serving paths hardcode these axis names (entity-table TP over
        # "model", batch DP over "data") — reject other layouts up front
        # instead of KeyError-ing deep inside a shard_map.
        if tuple(spec.axis_names) != ("data", "model"):
            raise ValueError(
                "prebuilt Mesh must have axis names ('data', 'model'); got "
                f"{tuple(spec.axis_names)} — build one with make_mesh(n) or "
                "pass a device count"
            )
        return spec
    n = None if spec == "auto" else int(spec)
    if n is not None and n <= 1:
        return None
    built = make_mesh(n)
    return built if built.devices.size > 1 else None
