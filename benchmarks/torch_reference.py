"""CPU reference implementation of the progressive generator, in PyTorch.

The reference repo ships no image model (its image-GAN surface exists only in
BASELINE.json's north star — SURVEY.md §0.2), so this file IS the "CPU
reference" that defines both:

- the ≥50x throughput denominator (BASELINE.md: "this run defines the ≥50x
  denominator and must be measured by the build"), and
- the pixel-parity target (PSNR > 50 dB from the same seeds/weights).

It mirrors probgan_tpu/models/pro_gan.py op-for-op (same equalized-LR
scaling, nearest upsample, SAME conv padding, PixelNorm eps, tanh/denorm
rounding) so fp32 outputs agree to float rounding error. Weights are converted
from the JAX params pytree (HWIO -> OIHW).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

LRELU_SLOPE = 0.2
_PIXELNORM_EPS = 1e-8


def _lrelu(x):
    return F.leaky_relu(x, negative_slope=LRELU_SLOPE)


def _pixel_norm(x):
    # channels-first: normalize over dim 1
    return x * torch.rsqrt(torch.mean(x * x, dim=1, keepdim=True) + _PIXELNORM_EPS)


def _eq_conv(layer: dict, x, gain=math.sqrt(2.0)):
    w = layer["w"]  # OIHW
    fan_in = w.shape[1] * w.shape[2] * w.shape[3]
    scale = gain / math.sqrt(fan_in)
    pad = w.shape[2] // 2
    return F.conv2d(x, w * scale, bias=layer["b"], padding=pad)


def _eq_dense(layer: dict, x, gain=math.sqrt(2.0)):
    w = layer["w"]  # [in, out]
    scale = gain / math.sqrt(w.shape[0])
    return x @ (w * scale) + layer["b"]


def convert_params(jax_params) -> dict:
    """JAX generator params (HWIO convs, [in,out] dense) -> torch tensors."""

    def conv(p):
        w = np.asarray(p["w"])  # HWIO
        return {
            "w": torch.from_numpy(np.ascontiguousarray(w.transpose(3, 2, 0, 1))),
            "b": torch.from_numpy(np.asarray(p["b"]).copy()),
        }

    def dense(p):
        return {
            "w": torch.from_numpy(np.asarray(p["w"]).copy()),
            "b": torch.from_numpy(np.asarray(p["b"]).copy()),
        }

    return {
        "base_dense": dense(jax_params["base_dense"]),
        "base_conv": conv(jax_params["base_conv"]),
        "blocks": [
            {"conv1": conv(b["conv1"]), "conv2": conv(b["conv2"])}
            for b in jax_params["blocks"]
        ],
        "to_rgb": [conv(t) for t in jax_params["to_rgb"]],
    }


@torch.no_grad()
def generator_rgb(params: dict, z: torch.Tensor, nf0: int, stage: int, alpha: float = 1.0):
    """Latent [B, L] -> pre-tanh RGB [B, 3, R, R] (channels-first)."""
    z = _pixel_norm(z.unsqueeze(-1).unsqueeze(-1)).squeeze(-1).squeeze(-1)
    x = _eq_dense(params["base_dense"], z)
    x = x.reshape(z.shape[0], 4, 4, nf0).permute(0, 3, 1, 2).contiguous()
    x = _pixel_norm(_lrelu(x))
    x = _pixel_norm(_lrelu(_eq_conv(params["base_conv"], x)))
    prev = None
    for s in range(1, stage + 1):
        prev = x
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = _pixel_norm(_lrelu(_eq_conv(params["blocks"][s - 1]["conv1"], x)))
        x = _pixel_norm(_lrelu(_eq_conv(params["blocks"][s - 1]["conv2"], x)))
    rgb = _eq_conv(params["to_rgb"][stage], x, gain=1.0)
    if stage > 0:
        rgb_prev = F.interpolate(
            _eq_conv(params["to_rgb"][stage - 1], prev, gain=1.0),
            scale_factor=2,
            mode="nearest",
        )
        rgb = rgb_prev + alpha * (rgb - rgb_prev)
    return rgb


@torch.no_grad()
def generator_uint8(params: dict, z: torch.Tensor, nf0: int, stage: int, alpha: float = 1.0):
    """Full image path -> uint8 numpy [B, R, R, 3] (NHWC, matching the JAX
    path's output layout)."""
    rgb = generator_rgb(params, z, nf0, stage, alpha)
    x = (torch.tanh(rgb) + 1.0) * 127.5
    x = torch.clamp(torch.round(x), 0.0, 255.0).to(torch.uint8)
    return x.permute(0, 2, 3, 1).contiguous().numpy()
