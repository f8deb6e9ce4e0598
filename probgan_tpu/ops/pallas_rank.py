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


def _rank_topk_kernel(pred_ref, table_ref, val_ref, idx_ref, *, k, tile_n,
                      num_entities):
    """One N tile: fused normalize + matmul + per-tile top-k extraction.
    Emits the tile's k best (values, GLOBAL indices) per query row — the
    [B, N] score matrix never exists in HBM, and the XLA full-sort top_k
    over N collapses to a tiny merge over n_tiles*k candidates."""
    j = pl.program_id(0)
    p = pred_ref[:]  # [B, D]
    norm = jnp.sqrt(jnp.sum(p * p, axis=1, keepdims=True))
    pn = p / jnp.maximum(norm, _NORM_EPS)
    s = jax.lax.dot_general(
        pn,
        table_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, TILE_N]
    b = s.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    gidx = lane + j * tile_n
    # Mask table padding rows (their score is exactly 0, which would beat
    # genuinely negative cosines).
    s = jnp.where(gidx < num_entities, s, -jnp.inf)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(s, axis=1, keepdims=True)  # [B, 1]
        # argmax with lax.top_k's tie-break: lowest index among ties
        at = jnp.min(jnp.where(s == m, lane, tile_n), axis=1, keepdims=True)
        vals.append(m)
        idxs.append(at + j * tile_n)
        s = jnp.where(lane == at, -jnp.inf, s)
    # Candidate lanes are padded to 128 (Mosaic block-shape constraint);
    # the -inf fillers are never selected by the merge.
    vals.append(jnp.full((b, 128 - k), -jnp.inf, jnp.float32))
    idxs.append(jnp.zeros((b, 128 - k), jnp.int32))
    val_ref[0] = jnp.concatenate(vals, axis=1)
    idx_ref[0] = jnp.concatenate(idxs, axis=1)


@functools.partial(
    jax.jit, static_argnames=("k", "num_entities", "interpret")
)
def _rank_topk_pallas(pred, table_norm, k, num_entities, interpret=False):
    b, d = pred.shape
    n = table_norm.shape[0]
    nt = n // _TILE_N
    kern = functools.partial(
        _rank_topk_kernel, k=k, tile_n=_TILE_N, num_entities=num_entities
    )
    return pl.pallas_call(
        kern,
        out_shape=(
            # [nt, B, 128]: the tiled (minor two) dims must be 8/128-aligned,
            # which (B, 128) is and (nt, k) is not.
            jax.ShapeDtypeStruct((nt, b, 128), jnp.float32),
            jax.ShapeDtypeStruct((nt, b, 128), jnp.int32),
        ),
        grid_spec=pl.GridSpec(
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_TILE_N, d), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, b, 128), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, 128), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=4 * (b * d + n * d + 2 * b * nt * k),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pred, table_norm)


def supports_topk(pred_shape: tuple[int, int], n: int, k: int) -> bool:
    """Fused rank+top-k gate: rank-kernel tiling constraints plus a small-k
    bound (per-tile extraction is k iterations of max+mask)."""
    return supports(pred_shape, n) and 1 <= k <= 16


def rank_topk_fused(
    pred: jax.Array,
    table_norm: jax.Array,
    k: int,
    num_entities: int,
    *,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """[B, D] raw predictions x [N_pad, D] pre-normalized (zero-padded) table
    -> (top-k values [B, k], top-k entity ids [B, k]), bit-matching
    ``lax.top_k(scores[:, :num_entities], k)`` of the two-step path
    (including its lowest-index tie-break).

    The [B, N] score matrix never touches HBM: each kernel grid step reads
    one table tile and emits k candidates; the final merge ranks the
    [B, n_tiles*k] candidate pool (candidates are ordered (tile, desc-value/
    asc-index), so equal values resolve to the lowest global index exactly
    like lax.top_k). Falls back to score + lax.top_k off-gate."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = pred.shape[0]
    if not supports_topk(pred.shape, table_norm.shape[0], k):
        scores = rank_ops.cosine_scores(
            rank_ops.l2_normalize(pred), table_norm
        )[:, :num_entities]
        return jax.lax.top_k(scores, k)
    cand_v, cand_i = _rank_topk_pallas(
        pred, table_norm, k, num_entities, interpret=interpret
    )
    nt = cand_v.shape[0]
    # Slice the 128-lane Mosaic padding off BEFORE the merge: the -inf
    # fillers occupy lanes [k, 128) and can never win, so the top_k pool is
    # [B, nt*k], not [B, nt*128] (13x smaller at k=10). Candidate order
    # stays (tile, desc-value/asc-index), preserving the tie-break.
    cv = jnp.transpose(cand_v[:, :, :k], (1, 0, 2)).reshape(b, nt * k)
    ci = jnp.transpose(cand_i[:, :, :k], (1, 0, 2)).reshape(b, nt * k)
    v, pos = jax.lax.top_k(cv, k)
    i = jnp.take_along_axis(ci, pos, axis=1)
    return v, i


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
