"""Fused nearest-upsample-2x + conv3x3 (the north-star's
"upsample fused into the following conv").

A 3x3 SAME conv applied to a nearest-2x-upsampled input is EXACTLY a set of
four 2x2 convs on the un-upsampled input, one per output-pixel parity
(subpixel / space-to-depth identity): for output row 2i+p,

    p=0:  rows (i-1, i)   with kernel rows (W0, W1+W2)
    p=1:  rows (i,   i+1) with kernel rows (W0+W1, W2)

and the same split over columns. Benefits vs materialize-then-conv:

- the [B, 2H, 2W, Cin] upsampled tensor is never written/read to HBM
  (the dominant traffic of the generator's bandwidth-bound late stages);
- 16 MACs per 4 output pixels instead of 36 (the upsample duplicates inputs;
  the parity filters pre-sum the duplicated taps).

Exact up to float reassociation of the pre-summed kernel taps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x_conv3x3(
    w: jax.Array,  # [3, 3, Cin, Cout] (already equalized-LR-scaled)
    b: jax.Array,  # [Cout]
    x: jax.Array,  # [B, H, W, Cin]
    precision=None,
) -> jax.Array:
    """Equivalent to ``conv3x3_same(nearest_upsample_2x(x), w) + b`` ->
    [B, 2H, 2W, Cout]."""
    # Row split: parity-0 kernel rows (W0, W1+W2); parity-1 (W0+W1, W2).
    r0 = jnp.stack([w[0], w[1] + w[2]], axis=0)  # [2, 3, Cin, Cout]
    r1 = jnp.stack([w[0] + w[1], w[2]], axis=0)
    # Column split of each: parity-0 cols (C0, C1+C2); parity-1 (C0+C1, C2).
    w00 = jnp.stack([r0[:, 0], r0[:, 1] + r0[:, 2]], axis=1)  # [2, 2, Cin, Cout]
    w01 = jnp.stack([r0[:, 0] + r0[:, 1], r0[:, 2]], axis=1)
    w10 = jnp.stack([r1[:, 0], r1[:, 1] + r1[:, 2]], axis=1)
    w11 = jnp.stack([r1[:, 0] + r1[:, 1], r1[:, 2]], axis=1)

    def conv2x2(kernel, pad_rows, pad_cols):
        return jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=(pad_rows, pad_cols),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )

    top, bot = (1, 0), (0, 1)  # (lo, hi) paddings selecting rows (i-1,i) / (i,i+1)
    y00 = conv2x2(w00, top, top)
    y01 = conv2x2(w01, top, bot)
    y10 = conv2x2(w10, bot, top)
    y11 = conv2x2(w11, bot, bot)

    bsz, h, wd, cout = y00.shape
    # Interleave parities by stack+reshape. Measured on v5e at 1024² b8: this
    # is ~35% faster than strided at[].set writes (29.5 -> 40.4 img/s) at the
    # cost of a padded [B, H, 2, W, 2, C] temp — the size-2 minor dims tile
    # poorly, so very large batches prefer smaller chunks over this temp
    # (batch 8 is the single-chip sweet spot at 1024²).
    row0 = jnp.stack([y00, y01], axis=3)  # [B, H, W, 2, C]
    row1 = jnp.stack([y10, y11], axis=3)
    y = jnp.stack([row0, row1], axis=2)   # [B, H, 2, W, 2, C]
    y = y.reshape(bsz, 2 * h, 2 * wd, cout)
    return y + b.astype(x.dtype)
