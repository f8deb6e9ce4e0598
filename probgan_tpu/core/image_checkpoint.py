"""Checkpoint schema for the image-GAN model family.

The image family has no reference artifact (the image pipeline exists only in
BASELINE.json's north star), so this schema is native-defined, in the same
spirit as the KG schema (core/checkpoint.py): a flat dict, msgpack on disk.

    {
      'image_config': {'resolution', 'latent_dim', 'fmap_base', 'fmap_max',
                       'num_channels'},
      'image_generator': <generator params pytree>,
      'image_generator_ema': <EMA generator params pytree> (optional),
      'image_discriminator': <discriminator params pytree>,
      'training_history': dict (optional),
    }

'image_generator_ema' carries the trainer's exponential moving average of
the generator (engine/train.py ProGANTrainState.g_ema); loaders prefer it
for sample generation when present — the classic progressive-GAN serving
configuration. 'image_generator' always holds the raw adversarial iterate
(the resumable/trainable weights).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from probgan_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from probgan_tpu.models.pro_gan import ProGANConfig

IMAGE_KEYS = ("image_config", "image_generator", "image_discriminator")


def is_image_checkpoint(ckpt: dict) -> bool:
    return "image_generator" in ckpt


def save_image_checkpoint(
    path: str,
    config: ProGANConfig,
    g_params,
    d_params=None,
    training_history: dict | None = None,
    g_ema=None,
) -> None:
    ckpt = {
        "image_config": dataclasses.asdict(config),
        "image_generator": g_params,
        "image_discriminator": d_params if d_params is not None else {},
        "training_history": training_history or {},
    }
    if g_ema is not None:
        ckpt["image_generator_ema"] = g_ema
    save_checkpoint(path, ckpt, format="native")


def load_image_checkpoint(
    path: str, prefer_ema: bool = True
) -> tuple[ProGANConfig, dict, dict]:
    """Returns (config, g_params, d_params). With ``prefer_ema`` (the
    default), g_params is the checkpoint's EMA generator when one is stored;
    pass False for the raw adversarial iterate. SERVING loader: anything
    that fine-tunes or resumes must NOT train from the EMA tree — use
    ``load_image_checkpoint_trees`` to get both trees by name."""
    ckpt = load_checkpoint(path)
    if not is_image_checkpoint(ckpt):
        raise ValueError(
            f"Not an image-GAN checkpoint (missing 'image_generator'): {path}"
        )
    cfg = ProGANConfig(**{k: int(v) for k, v in ckpt["image_config"].items()})

    def to_np(tree):
        if isinstance(tree, dict):
            return {k: to_np(v) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [to_np(v) for v in tree]
        return np.asarray(tree)

    g_key = (
        "image_generator_ema"
        if prefer_ema and "image_generator_ema" in ckpt
        else "image_generator"
    )
    return cfg, to_np(ckpt[g_key]), to_np(ckpt["image_discriminator"])


def load_image_checkpoint_trees(
    path: str,
) -> tuple[ProGANConfig, dict, dict | None, dict]:
    """Unambiguous loader: (config, g_raw, g_ema_or_None, d_params).

    ``g_raw`` is ALWAYS the trainable adversarial iterate
    ('image_generator'); ``g_ema`` is the stored EMA tree or None. Use this
    from resumption / fine-tuning paths so the EMA-preferring serving
    default of ``load_image_checkpoint`` can't silently hand training the
    EMA weights."""
    ckpt = load_checkpoint(path)
    if not is_image_checkpoint(ckpt):
        raise ValueError(
            f"Not an image-GAN checkpoint (missing 'image_generator'): {path}"
        )
    cfg = ProGANConfig(**{k: int(v) for k, v in ckpt["image_config"].items()})

    def to_np(tree):
        if isinstance(tree, dict):
            return {k: to_np(v) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [to_np(v) for v in tree]
        return np.asarray(tree)

    ema = ckpt.get("image_generator_ema")
    return (
        cfg,
        to_np(ckpt["image_generator"]),
        to_np(ema) if ema is not None else None,
        to_np(ckpt["image_discriminator"]),
    )
