"""Quantitative quality signals for the image-GAN family.

The reference has no image pipeline (SURVEY.md §0.2) and publishes no quality
metric; these are the framework's documented choices for the north-star
synthesis evidence (BASELINE.json):

- ``channel_wasserstein``: per-channel 1-Wasserstein distance between the
  pixel-intensity distributions of a sample set and the dataset, in uint8
  units (0 = identical color/intensity statistics). Distribution-level — it
  cannot be gamed by memorizing one training image, and a collapsed
  generator (constant output) scores badly against a diverse dataset.
- ``logit_gap``: mean discriminator logit difference D(real) - D(fake) on
  held-out reals — the adversarial game's own quality readout (a perfect
  generator drives it to 0; an untrained one leaves it large).
- ``sample_grid``: tiles samples into one uint8 image artifact (PNG when a
  writer is importable, .npy always) for human inspection.
"""

from __future__ import annotations

import numpy as np


def channel_quantiles(images: np.ndarray, n: int = 512) -> np.ndarray:
    """[C, n] matched quantiles of each channel's pixel-intensity
    distribution — the sufficient statistic ``channel_wasserstein`` compares.
    Checked-in dataset quantiles (e.g. the 512² synthetic set, whose
    regeneration costs minutes) let tests score grids against the exact
    training distribution without regenerating it."""
    qs = np.linspace(0.0, 1.0, n)
    return np.stack([
        np.quantile(images[..., c].astype(np.float64).ravel(), qs)
        for c in range(images.shape[-1])
    ])


def channel_wasserstein(samples: np.ndarray, dataset) -> float:
    """W1 between per-channel pixel-intensity distributions, uint8 units.

    Computed as the mean absolute difference of matched quantiles (the exact
    1-D Wasserstein-1 under equal sample counts; here 512 quantiles).
    ``dataset`` is either an image array or a precomputed [C, 512] quantile
    matrix from :func:`channel_quantiles`."""
    b_all = (np.asarray(dataset, np.float64)
             if np.ndim(dataset) == 2 else channel_quantiles(dataset))
    a_all = channel_quantiles(samples, b_all.shape[1])
    return float(np.mean(np.abs(a_all - b_all)))


def logit_gap(score_fn, real_uint8: np.ndarray, fake_uint8: np.ndarray) -> float:
    """mean D(real) - mean D(fake); ``score_fn`` maps float images in
    [-1, 1] to logits (e.g. ImageGANEngine.score)."""
    def to_float(u8):
        return u8.astype(np.float32) / 127.5 - 1.0

    return float(
        np.mean(score_fn(to_float(real_uint8)))
        - np.mean(score_fn(to_float(fake_uint8)))
    )


def sample_grid(images: np.ndarray, path_prefix: str, cols: int = 4) -> str:
    """Tile [N, H, W, 3] uint8 into one grid image; returns the written path.
    Writes <prefix>.png when PIL or matplotlib is importable, and always
    <prefix>.npy (the raw grid array) so the artifact is inspectable in any
    environment."""
    n, h, w, c = images.shape
    cols = min(cols, n)
    rows = -(-n // cols)
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    np.save(path_prefix + ".npy", grid)
    try:
        from PIL import Image

        Image.fromarray(grid).save(path_prefix + ".png")
        return path_prefix + ".png"
    except ImportError:
        pass
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path_prefix + ".png", grid)
        return path_prefix + ".png"
    except ImportError:
        return path_prefix + ".npy"
