"""Entity-table tensor parallelism for the ranking path.

The TPU analog of "long context" in this workload is the entity count N in
the ``[B, D] x [D, N]`` ranking matmul (SURVEY.md §5.7): shard the normalized
entity table's rows over the ``model`` mesh axis, rank per shard, then merge
per-shard top-k candidates with one small ``all_gather`` over ICI — a
psum-free merge, since top-k of a row-sharded score matrix only needs each
shard's k best (values, global indices).

Communication cost per query row: 2 * model_parallelism * k scalars — vs
all_gathering the full [B, N] scores (N scalars). For N=1M, k=10, tp=8 that
is 160 vs 1,000,000.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_entity_table(table: jax.Array, mesh: Mesh, axis: str = "model") -> jax.Array:
    """Place a [N, D] table row-sharded over ``axis`` (replicated over the
    other mesh axes). Uneven N is zero-padded to the axis size — pass the
    true N as ``num_entities`` to ``sharded_rank_topk`` so pad rows are
    masked out of rankings."""
    tp = mesh.shape[axis]
    pad = (-table.shape[0]) % tp
    if pad:
        table = jnp.pad(table, ((0, pad), (0, 0)))
    return jax.device_put(table, NamedSharding(mesh, P(axis, None)))


def sharded_rank_topk(
    query_norm: jax.Array,
    table_norm_sharded: jax.Array,
    k: int,
    mesh: Mesh,
    axis: str = "model",
    num_entities: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-k cosine ranking against a row-sharded normalized table.

    Args:
        query_norm: [B, D] normalized queries (replicated).
        table_norm_sharded: [N_pad, D] normalized table, rows sharded over
            ``axis`` (use ``shard_entity_table``); N_pad must divide evenly
            by the axis size (zero-pad an uneven table before sharding).
        k: number of results (must be <= local shard size).
        mesh: the device mesh.
        num_entities: true row count; padding rows (global id >= this) are
            masked out of the ranking (a zero pad row's cosine is exactly 0,
            which would otherwise beat genuinely negative scores).

    Returns:
        (values [B, k], global indices [B, k]) — replicated, identical to
        ``jax.lax.top_k(query_norm @ table_norm.T[:num_entities], k)`` on
        one device.
    """
    n = num_entities if num_entities is not None else table_norm_sharded.shape[0]

    from probgan_tpu.ops import pallas_rank

    def local_rank(q, table_shard):
        local_n = table_shard.shape[0]
        k_local = min(k, local_n)
        if pallas_rank.supports_topk(q.shape, local_n, k_local):
            # Per-shard fused rank+top-k: the [B, N/m] shard score matrix
            # never touches HBM — the same kernel the single-device path
            # runs, with the pad mask as a traced per-shard row count.
            # Bit-identical to the dense masked top_k below (same HIGHEST
            # dot over D, same lowest-index tie-break).
            nvalid = jnp.clip(
                n - jax.lax.axis_index(axis) * local_n, 0, local_n
            )
            v, i = pallas_rank.rank_topk_local(q, table_shard, k_local, nvalid)
        else:
            scores = jnp.matmul(
                q, table_shard.T, precision=jax.lax.Precision.HIGHEST
            )  # [B, N/m]
            gidx = (
                jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                + jax.lax.axis_index(axis) * local_n
            )
            scores = jnp.where(gidx < n, scores, -jnp.inf)
            v, i = jax.lax.top_k(scores, k_local)
        i = i + jax.lax.axis_index(axis) * local_n  # local -> global entity ids
        if k_local < k:  # tiny shard: pad candidates (sort last, never win)
            v = jnp.pad(v, ((0, 0), (0, k - k_local)),
                        constant_values=-jnp.inf)
            i = jnp.pad(i, ((0, 0), (0, k - k_local)),
                        constant_values=jnp.iinfo(jnp.int32).max)
        # Merge: gather each shard's k candidates along the last axis, then
        # re-rank the m*k pool. Rides ICI; tiny payload (2*m*k per row).
        vg = jax.lax.all_gather(v, axis, axis=1, tiled=True)  # [B, m*k]
        ig = jax.lax.all_gather(i, axis, axis=1, tiled=True)
        # Tie-break by global index (ascending) to bit-match single-device
        # lax.top_k: sort by (-value, index).
        order = jnp.lexsort((ig, -vg), axis=1)[:, :k]
        return jnp.take_along_axis(vg, order, axis=1), jnp.take_along_axis(
            ig, order, axis=1
        )

    fn = jax.shard_map(
        local_rank,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()),
        # Outputs ARE replicated (every shard computes the identical merged
        # top-k after the all_gather), but the static variance checker can't
        # infer that through top_k/take_along_axis.
        check_vma=False,
    )
    return fn(query_norm, table_norm_sharded)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
