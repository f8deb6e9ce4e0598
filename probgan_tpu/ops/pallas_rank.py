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
import numpy as np
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


def _rank_topk_kernel(nvalid_ref, pred_ref, table_ref, val_ref, idx_ref, *,
                      k, tile_n, normalize):
    """One N tile: fused normalize + matmul + per-tile top-k extraction.
    Emits the tile's k best (values, GLOBAL indices) per query row — the
    [B, N] score matrix never exists in HBM, and the XLA full-sort top_k
    over N collapses to a tiny merge over n_tiles*k candidates.
    ``nvalid_ref``/``normalize``: see _rank_topk_bf16_kernel."""
    j = pl.program_id(0)
    p = pred_ref[:]  # [B, D]
    if normalize:
        norm = jnp.sqrt(jnp.sum(p * p, axis=1, keepdims=True))
        p = p / jnp.maximum(norm, _NORM_EPS)
    s = jax.lax.dot_general(
        p,
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
    s = jnp.where(gidx < nvalid_ref[0], s, -jnp.inf)
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


# Candidate geometry for the bf16-streamed kernel's extraction. Each tile's
# 2048 lanes split into 128 STRIDE CLASSES (class c = lanes {c, 128+c, ...,
# 1920+c}, i.e. lane mod 128 — the groups native to elementwise max over the
# 16 aligned 128-lane slices, NO relayout); each class keeps its top
# _CLASS_CAP by approximate score. A first segmented design (contiguous
# 128-lane segments via a (B, 16, 128) reshape + max/argmin loops) measured
# 6.4k q/s at N=1M — 3.5x SLOWER than the fp32 kernel — because the
# lane-split reshape forces a full relayout of every score tile in Mosaic;
# this formulation is pure aligned-slice elementwise ops.
_CLASSES = 128                   # stride classes per tile (one per lane slot)
_CLASS_CAP = 2                   # candidates kept per class
_BF16_CANDS = _CLASSES * _CLASS_CAP  # candidates emitted per tile (256)

# Sortable-int packing: scores (cosines, in [-1-eps, 1+eps] even under bf16
# rounding) shift by +8.0 into positive-float territory where the IEEE bit
# pattern is MONOTONE as an int32; the low 11 bits are replaced by the lane
# id, so one integer both ranks candidates and remembers where they came
# from, and extraction needs no argmin/index passes at all. Masked lanes
# pack to just their lane id (score bits 0), below _BF16_VALID_MIN.
_BF16_SHIFT = 8.0
_BF16_LANE_BITS = 11             # 2^11 = 2048 = _TILE_N
_BF16_VALID_MIN = int(np.float32(4.0).view(np.int32))  # < bitcast(-1+8)

# Engine-side gate: only stream bf16 for tables where class-collision
# displacement is negligible (and where the table read is worth halving).
BF16_MIN_N = 200_000


def _rank_topk_bf16_kernel(nvalid_ref, pred_ref, table_ref, out_ref, *,
                           tile_n, normalize):
    """bf16-streamed variant of _rank_topk_kernel: the table tile arrives as
    bfloat16 (HALF the HBM bytes of the dominant stream) and the dot is one
    bf16 MXU pass instead of fp32-emulation's six.

    Candidate extraction is APPROXIMATE, not exact: scores pack into
    sortable int32s carrying their lane id (see _BF16_SHIFT above), and each
    of the 128 stride classes keeps its top-_CLASS_CAP via elementwise max
    over the tile's 16 aligned 128-lane slices — ~8 full-width vector
    passes total, independent of k, vs ~4k for the exact max/argmin/mask
    loop (which measured as the fp32 path's bottleneck). Sloppiness is safe
    because the caller re-scores the merged pool against the fp32 table: a
    true top-k member is lost only if > _CLASS_CAP entities with higher
    approximate score land in its OWN 16-lane stride class of its own tile
    — vanishingly unlikely above the BF16_MIN_N gate (the unit tests plant
    structure instead of relying on that bound).

    ``nvalid_ref`` is a traced (scalar-prefetch) valid-row count: rows at
    index >= nvalid pack below _BF16_VALID_MIN (zero-padded table rows
    would otherwise score exactly 0). Traced (not static) so the
    tensor-parallel path can pass a per-shard count computed from the
    shard index."""
    j = pl.program_id(0)
    p = pred_ref[:]  # [B, D] fp32
    if normalize:
        norm = jnp.sqrt(jnp.sum(p * p, axis=1, keepdims=True))
        p = p / jnp.maximum(norm, _NORM_EPS)
    pn = p.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        pn,
        table_ref[:],  # [TILE_N, D] bf16
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # [B, TILE_N] fp32 accumulation of one bf16 pass
    b = s.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    valid = lane < nvalid_ref[0] - j * tile_n
    sp = jnp.where(valid, s + _BF16_SHIFT, 0.0)
    t = jax.lax.bitcast_convert_type(sp, jnp.int32)
    lane_mask = jnp.int32((1 << _BF16_LANE_BITS) - 1)
    packed = (t & ~lane_mask) | lane  # [B, TILE_N] int32, score-major
    # Per-class top-_CLASS_CAP: elementwise max over the 16 aligned slices
    # (plain lane-offset views — tile-aligned, no relayout), then mask the
    # winners (exact identity compare: lane bits make every packed value
    # unique) and reduce again.
    nsl = tile_n // _CLASSES
    picks = []
    for _ in range(_CLASS_CAP):
        best = packed[:, 0:_CLASSES]
        for i in range(1, nsl):
            best = jnp.maximum(best, packed[:, i * _CLASSES:(i + 1) * _CLASSES])
        picks.append(best)
        keep = []
        for i in range(nsl):
            sl = packed[:, i * _CLASSES:(i + 1) * _CLASSES]
            keep.append(jnp.where(sl == best, jnp.int32(0), sl))
        packed = jnp.concatenate(keep, axis=1)
    out_ref[0] = jnp.concatenate(picks, axis=1)  # [B, _BF16_CANDS]


@functools.partial(
    jax.jit, static_argnames=("interpret", "normalize")
)
def _rank_topk_bf16_pallas(pred, table_bf16, nvalid, interpret=False,
                           normalize=True):
    b, d = pred.shape
    n = table_bf16.shape[0]
    nt = n // _TILE_N
    kern = functools.partial(
        _rank_topk_bf16_kernel, tile_n=_TILE_N, normalize=normalize
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, d), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, b, _BF16_CANDS), lambda j, *_: (j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nt, b, _BF16_CANDS), jnp.int32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=4 * b * d + 2 * n * d + 4 * b * nt * _BF16_CANDS,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(nvalid, jnp.int32).reshape(1), pred, table_bf16)


# Merge-pool margin for the bf16-streamed path. Correctness condition: every
# true top-k entity must survive (a) its stride class's top-_CLASS_CAP
# approximate extraction (see _rank_topk_bf16_kernel) and (b) the
# approximate merge to the rescore pool of k + _BF16_RESCORE_POOL. An entity can only be
# displaced by competitors whose TRUE score is within 2*eps of its own
# (eps ~ 2^-8 cosine units, one bf16 rounding per operand), so the margin
# bounds how many near-boundary competitors are tolerated — ample for
# embedding tables (verified bit-exact on the golden/tie-break suites; the
# fp32-exact 6-pass kernel remains available by not passing table_bf16).
_BF16_RESCORE_POOL = 16


@functools.partial(
    jax.jit, static_argnames=("k", "interpret", "normalize")
)
def _rank_topk_pallas(pred, table_norm, k, nvalid, interpret=False,
                      normalize=True):
    b, d = pred.shape
    n = table_norm.shape[0]
    nt = n // _TILE_N
    kern = functools.partial(
        _rank_topk_kernel, k=k, tile_n=_TILE_N, normalize=normalize
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, d), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, 128), lambda j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 128), lambda j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        kern,
        out_shape=(
            # [nt, B, 128]: the tiled (minor two) dims must be 8/128-aligned,
            # which (B, 128) is and (nt, k) is not.
            jax.ShapeDtypeStruct((nt, b, 128), jnp.float32),
            jax.ShapeDtypeStruct((nt, b, 128), jnp.int32),
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=4 * (b * d + n * d + 2 * b * nt * k),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(nvalid, jnp.int32).reshape(1), pred, table_norm)


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
    table_bf16: jax.Array | None = None,
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
    like lax.top_k). Falls back to score + lax.top_k off-gate.

    ``table_bf16``: a cached bfloat16 copy of ``table_norm`` (the engine
    builds it once at load). When given, the kernel streams the bf16 table
    — HALF the HBM bytes and one MXU pass instead of six — emitting
    top-_CLASS_CAP-per-stride-class approximate candidates per tile as
    sortable lane-tagged int32s (see _rank_topk_bf16_kernel); the merged
    pool's best _BF16_RESCORE_POOL + k candidates are then re-scored
    exactly against the fp32 table, so returned (values, ids) match the
    fp32 kernel's (see the margin comments above for the guarantee's
    bound). Value note: the rescored dot can differ from the dense
    matmul's score by ~1 ulp (different reduction order), so two DISTINCT
    entities whose exact scores are within 1 ulp of each other may order
    differently than lax.top_k — exact duplicates still resolve
    identically (lexsort on ids)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = pred.shape[0]
    if not supports_topk(pred.shape, table_norm.shape[0], k):
        scores = rank_ops.cosine_scores(
            rank_ops.l2_normalize(pred), table_norm
        )[:, :num_entities]
        return jax.lax.top_k(scores, k)
    if table_bf16 is not None:
        nc = _BF16_CANDS
        cand = _rank_topk_bf16_pallas(
            pred, table_bf16, num_entities, interpret=interpret
        )  # [nt, B, nc] packed sortable int32
        nt = cand.shape[0]
        cp = jnp.transpose(cand, (1, 0, 2)).reshape(b, nt * nc)
        # Approximate merge DIRECTLY on the packed ints (monotone in score):
        # shrink the pool to the rescore size; ordering of near-ties here
        # only decides pool membership — the fp32 rescore + lexsort below
        # decides the final ranking and tie-break.
        m = min(k + _BF16_RESCORE_POOL, nt * nc)
        pv, pos = jax.lax.top_k(cp, m)
        lane_mask = jnp.int32((1 << _BF16_LANE_BITS) - 1)
        ids = (pos // nc) * _TILE_N + (pv & lane_mask)  # [B, m] global ids
        # Exact re-score of the pool against the fp32 table (tiny gather:
        # m rows per query vs the N-row stream the kernel just avoided).
        pn = rank_ops.l2_normalize(pred)
        rows = table_norm[ids]  # [B, m, D]
        exact = jax.lax.dot_general(
            pn, rows,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, m]
        # Masked lanes pack to bare lane ids (score bits zeroed) — they must
        # stay -inf through the rescore or a duplicate id could resurface
        # with its true score.
        exact = jnp.where(pv < _BF16_VALID_MIN, -jnp.inf, exact)
        order = jnp.lexsort((ids, -exact), axis=1)[:, :k]
        return (
            jnp.take_along_axis(exact, order, axis=1),
            jnp.take_along_axis(ids, order, axis=1),
        )
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


def rank_topk_local(
    pred_norm: jax.Array,
    table_norm_shard: jax.Array,
    k: int,
    nvalid: jax.Array | int,
    *,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Per-shard fused rank+top-k for the tensor-parallel path
    (parallel/sharded_rank.py): queries arrive ALREADY normalized (the TP
    merge requires every shard to consume identical query bits), and
    ``nvalid`` is a TRACED valid-row count (rows >= nvalid masked to -inf)
    computed from the shard index. Returns (values [B, k], LOCAL shard
    indices [B, k]) — bit-identical to
    ``lax.top_k(where(iota < nvalid, pred_norm @ shard.T, -inf), k)``.
    Caller must check ``supports_topk`` first (no fallback here)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = pred_norm.shape[0]
    cand_v, cand_i = _rank_topk_pallas(
        pred_norm, table_norm_shard, k, nvalid, interpret=interpret,
        normalize=False,
    )
    nt = cand_v.shape[0]
    cv = jnp.transpose(cand_v[:, :, :k], (1, 0, 2)).reshape(b, nt * k)
    ci = jnp.transpose(cand_i[:, :, :k], (1, 0, 2)).reshape(b, nt * k)
    v, pos = jax.lax.top_k(cv, k)
    return v, jnp.take_along_axis(ci, pos, axis=1)


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
