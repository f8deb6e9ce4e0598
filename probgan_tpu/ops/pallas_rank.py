"""Pallas TPU kernel: fused L2-normalize + cosine-score matmul.

The flagship hot op (SURVEY.md §3.2): the reference computes
``F.normalize(pred) @ F.normalize(node_emb).T`` as separate eager ops
(pro_b_gan_infer.py:146-148). Here the query normalization is fused into the
MXU matmul tiles so the [B, D] predictions are normalized in VMEM exactly
once per (B-tile, N-tile) pass, and the [N, D] table streams HBM -> VMEM in
MXU-sized blocks. The table side is pre-normalized once at load (cached by
the engine), so this kernel's arithmetic is norm(pred-tile) · table-tileᵀ.

Gated: ``rank_scores_fused`` falls back to the jnp path (ops/rank.py) when
shapes don't satisfy the TPU tiling constraints or no TPU is attached; parity
is tested in tests/test_pallas_kernels.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probgan_tpu.ops import rank as rank_ops

_TILE_N = 2048
_MAX_B = 256   # whole query batch stays resident in VMEM (B*D*4 <= 128 KB)
_NORM_EPS = 1e-12


def _rank_kernel(pred_ref, table_ref, out_ref):
    # The WHOLE query batch rides in VMEM for every N tile, so the [N, D]
    # table streams from HBM exactly once per call. (A B-tiled grid re-reads
    # the table B/TILE_B times — measured 2.7x slower than XLA at N=1M.)
    p = pred_ref[:]  # [B, D]
    norm = jnp.sqrt(jnp.sum(p * p, axis=1, keepdims=True))
    pn = p / jnp.maximum(norm, _NORM_EPS)
    out_ref[:] = jax.lax.dot_general(
        pn,
        table_ref[:],  # [TILE_N, D]
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # fp32-exact MXU passes: match the jnp path's Precision.HIGHEST so
        # rankings are bit-stable for golden tests (ops/rank.py).
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rank_scores_pallas(pred: jax.Array, table_norm: jax.Array, interpret: bool = False):
    b, d = pred.shape
    n = table_norm.shape[0]
    return pl.pallas_call(
        _rank_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n // _TILE_N,),
            in_specs=[
                pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_TILE_N, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (b, _TILE_N), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d + 3 * b * d,
            bytes_accessed=4 * (b * d + n * d + b * n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pred, table_norm)


def supports(pred_shape: tuple[int, int], n: int) -> bool:
    """Tiling gate: batch a multiple of the fp32 sublane count and small
    enough to stay VMEM-resident; table a multiple of the N tile; feature dim
    a multiple of the 128-lane width."""
    b, d = pred_shape
    return b % 8 == 0 and b <= _MAX_B and n % _TILE_N == 0 and d % 128 == 0


def rank_scores_fused(
    pred: jax.Array, table_norm: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """[B, D] raw predictions x [N, D] pre-normalized table -> [B, N] cosine
    scores. Falls back to the jnp path off-gate. ``interpret`` defaults to
    True off-TPU so the kernel is testable on CPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not supports(pred.shape, table_norm.shape[0]):
        return rank_ops.cosine_scores(rank_ops.l2_normalize(pred), table_norm)
    return _rank_scores_pallas(pred, table_norm, interpret=interpret)
