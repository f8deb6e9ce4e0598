"""EXPERIMENTAL Pallas kernel: fused conv3x3+bias+LeakyReLU+PixelNorm in a
packed channels-in-sublanes layout.

Motivation (benchmarks/RESULTS.md "per-stage cost"): the generator's final
1024² stage is 61% of the forward because its C=32 NHWC tensors waste 4x HBM
bandwidth to 128-lane padding. This kernel operates on ``[H, C, W]`` feature
maps — C=32 in the 8-sublane-aligned dim, W=1024 in the 128-lane dim — so
every byte moved is payload, and it fuses the whole stage-block op sequence
(conv -> bias -> LeakyReLU -> PixelNorm) into one HBM read + one write.

Mechanics: the input is pre-padded to ``[H+2, C, W+2]`` (SAME halo); the
grid walks output rows; each step sees three overlapping input rows (three
in_specs over the same array with index maps h, h+1, h+2) and computes nine
``[Cout, C] x [C, W]`` taps on the MXU with lane-shifted row slices.

Status: parity-verified vs the XLA path (tests). NOT yet wired into the
generator — integration requires keeping late stages in the packed layout
end-to-end (including the fused upsample), planned as the round-2 perf
project. ``benchmarks/packed_conv_bench.py`` micro-benchmarks it against
the XLA NHWC op chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probgan_tpu.models.pro_gan import LRELU_SLOPE, _PIXELNORM_EPS


def _kernel(w_ref, b_ref, r0_ref, r1_ref, r2_ref, out_ref):
    # w: [3, 3, C, Cout]; rows: [1, C, W+2]; out: [1, Cout, W]
    wd = out_ref.shape[2]
    acc = None
    rows = (r0_ref, r1_ref, r2_ref)
    for dh in range(3):
        row = rows[dh][0]  # [C, W+2]
        for dw in range(3):
            seg = row[:, dw : dw + wd]  # [C, W] lane-shifted slice
            tap = jax.lax.dot_general(
                w_ref[dh, dw],  # [C, Cout]
                seg,            # [C, W]
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Cout, W]
            acc = tap if acc is None else acc + tap
    acc = acc + b_ref[0][:, None]
    acc = jnp.where(acc >= 0, acc, LRELU_SLOPE * acc)  # LeakyReLU
    # PixelNorm over channels (sublane axis 0)
    acc = acc * jax.lax.rsqrt(
        jnp.mean(acc * acc, axis=0, keepdims=True) + _PIXELNORM_EPS
    )
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _packed_conv_block(x_pad, w, b, interpret: bool = False):
    """x_pad: [H+2, C, W+2] pre-padded feature map -> [H, Cout, W]."""
    hp, c, wp = x_pad.shape
    h, wd = hp - 2, wp - 2
    cout = w.shape[-1]
    row_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, c, wp), lambda i, off=off: (i + off, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((h, cout, wd), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(h,),
            in_specs=[
                pl.BlockSpec((3, 3, c, cout), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
                row_spec(0),
                row_spec(1),
                row_spec(2),
            ],
            out_specs=pl.BlockSpec(
                (1, cout, wd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * h * wd * c * cout,
            bytes_accessed=4 * (hp * c * wp + h * cout * wd),
            transcendentals=h * wd,
        ),
        interpret=interpret,
    )(w, b.reshape(1, -1), x_pad, x_pad, x_pad)


def packed_conv_block(
    x: jax.Array,  # [H, C, W] packed feature map
    w: jax.Array,  # [3, 3, C, Cout] (pre-scaled, e.g. equalized-LR)
    b: jax.Array,  # [Cout]
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused SAME conv3x3 + bias + LeakyReLU + PixelNorm on a packed
    [H, C, W] map -> [H, Cout, W]. Batch via jax.vmap."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x_pad = jnp.pad(x, ((1, 1), (0, 0), (1, 1)))
    return _packed_conv_block(x_pad, w, b, interpret=interpret)


def nhwc_reference(x_hcw: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """The equivalent XLA NHWC op chain, for parity tests: transpose in,
    conv+bias+lrelu+pixelnorm, transpose out."""
    from probgan_tpu.models import pro_gan

    x = jnp.transpose(x_hcw, (0, 2, 1))[None]  # [1, H, W, C]
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b
    y = pro_gan.pixel_norm(pro_gan.lrelu(y))
    return jnp.transpose(y[0], (0, 2, 1))  # [H, Cout, W]
