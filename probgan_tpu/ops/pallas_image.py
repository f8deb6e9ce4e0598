"""Pallas TPU kernel: fused tanh -> denorm -> round -> clip -> uint8.

BASELINE.json's north star calls for the generator's final
"tanh/denorm to uint8" to avoid an extra HBM round-trip of the fp RGB tensor
before host transfer (SURVEY.md §7.3 last bullet): at 1024² the pre-tanh RGB
is 12.6 MB/image in fp32 while the uint8 image is 3.1 MB — writing only the
uint8 saves 4x the output bandwidth of the last stage.

The float image is flattened to (rows, 128) lanes; each grid step maps one
row-tile through the VPU: ``u8 = clip(round((tanh(x) + 1) * 127.5), 0, 255)``.
Parity vs models/pro_gan.py:to_uint8 is tested in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# uint8 outputs need (32, 128) min tiles; cap row tiles to bound VMEM.
_MIN_ROWS = 32
_MAX_TILE_ROWS = 512


def _choose_tile_rows(rows: int) -> int:
    """Largest multiple-of-32 divisor of ``rows`` not exceeding the cap."""
    best = 0
    t = _MIN_ROWS
    while t <= _MAX_TILE_ROWS:
        if rows % t == 0:
            best = t
        t += _MIN_ROWS
    return best


def _denorm_kernel(x_ref, out_ref):
    x = jnp.tanh(x_ref[:].astype(jnp.float32))
    y = (x + 1.0) * 127.5
    # Mosaic has no direct f32->u8 cast; route through i32 (value-preserving
    # after the clip). Pixels may differ by ±1 from the CPU reference where
    # the VPU tanh approximation lands on a rounding boundary (~0.1% of
    # pixels, ~78 dB — far inside the >50 dB parity budget).
    out_ref[:] = (
        jnp.clip(jnp.round(y), 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _denorm_flat(x2d: jax.Array, interpret: bool = False) -> jax.Array:
    rows = x2d.shape[0]
    tile_rows = _choose_tile_rows(rows)
    return pl.pallas_call(
        _denorm_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.uint8),
        grid_spec=pl.GridSpec(
            grid=(rows // tile_rows,),
            in_specs=[
                pl.BlockSpec((tile_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (tile_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * _LANES,
            bytes_accessed=4 * rows * _LANES + rows * _LANES,
            transcendentals=rows * _LANES,
        ),
        interpret=interpret,
    )(x2d)


def supports(shape: tuple[int, ...]) -> bool:
    total = 1
    for s in shape:
        total *= s
    return total % _LANES == 0 and _choose_tile_rows(total // _LANES) > 0


def to_uint8_fused(rgb: jax.Array, *, interpret: bool | None = None) -> jax.Array:
    """Drop-in for models/pro_gan.py:to_uint8, fused into one VPU pass.
    Falls back to the jnp path when the element count doesn't tile.
    ``interpret`` defaults to True off-TPU so the kernel is testable on CPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not supports(rgb.shape):
        from probgan_tpu.models.pro_gan import to_uint8

        return to_uint8(rgb)
    total = rgb.size
    flat = rgb.reshape(total // _LANES, _LANES)
    out = _denorm_flat(flat, interpret=interpret)
    return out.reshape(rgb.shape)
