"""TPU-native inference engine for the KG-GAN.

Re-implements the reference's ``ProtBGANInference`` engine
(pro_b_gan_infer.py:43-338) as a thin stateful wrapper around jitted pure
functions. Every public method returns a plain-dict result whose keys and
shapes match the reference exactly (SURVEY.md §2.3 C1-C6), and prints the
same progress banners. TPU-first differences (SURVEY.md §3.2, §3.4):

- the normalized entity table is computed once at load and cached, instead of
  re-normalizing the full [N, D] table per call (pro_b_gan_infer.py:147,232);
- inputs are padded to power-of-two batch buckets so XLA sees static shapes
  and compiles once per bucket;
- ``analyze_relations`` is one batched, scanned discriminator evaluation over
  the (pairs x relations) grid with on-device sigmoid + top-k, replacing the
  reference's O(H*T*R) python loop of single-element kernel launches with a
  host sync each (pro_b_gan_infer.py:290-302);
- generator noise is an explicit, counter-seeded RNG stream (core/rng.py)
  instead of torch's hidden global RNG.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from probgan_tpu.core.checkpoint import load_checkpoint
from probgan_tpu.core.device import device_str, resolve_device
from probgan_tpu.core.rng import RngStream
from probgan_tpu.models import kg_gan
from probgan_tpu.ops import pallas_rank
from probgan_tpu.ops import rank as rank_ops
from probgan_tpu.utils.profiling import task_trace

_REL_CHUNK = 256   # relations scored per scan step in analyze_relations
_N_TILE = 2048     # entity-table row padding so the Pallas rank kernel tiles


def _rank_scores(pred: jax.Array, entity_norm_padded: jax.Array, num_entities: int,
                 use_pallas: bool) -> jax.Array:
    """[B, D] raw predictions -> [B, N] cosine scores against the cached
    normalized (row-padded) table. Pallas-fused on TPU when shapes tile
    (ops/pallas_rank.py); zero padding rows are sliced off before ranking
    (their score is exactly 0, but slicing keeps top-k semantics independent
    of padding)."""
    if use_pallas and pallas_rank.supports(pred.shape, entity_norm_padded.shape[0]):
        scores = pallas_rank.rank_scores_fused(pred, entity_norm_padded)
    else:
        scores = rank_ops.cosine_scores(
            rank_ops.l2_normalize(pred), entity_norm_padded
        )
    return scores[:, :num_entities]


def _rank_topk(pred: jax.Array, entity_norm_padded: jax.Array, k: int,
               num_entities: int, use_pallas: bool, table_bf16=None):
    """Fused rank + top-k when the Pallas gate allows (the [B, N] score
    matrix never touches HBM and the XLA full-sort over N collapses to a
    candidate merge — ops/pallas_rank.rank_topk_fused); otherwise the
    two-step score + lax.top_k path. Bit-identical results either way.
    ``table_bf16``: the engine's cached bf16 table copy — streams half the
    bytes and re-scores the candidate pool in fp32 (pallas_rank)."""
    if use_pallas and pallas_rank.supports_topk(
        pred.shape, entity_norm_padded.shape[0], k
    ):
        return pallas_rank.rank_topk_fused(
            pred, entity_norm_padded, k, num_entities, table_bf16=table_bf16
        )
    scores = _rank_scores(pred, entity_norm_padded, num_entities, use_pallas)
    return jax.lax.top_k(scores, k)


def _bucket(n: int, minimum: int = 8) -> int:
    """Next power-of-two batch bucket (static shapes for jit)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _pad_ids(ids: Sequence[int], bucket: int) -> np.ndarray:
    arr = np.zeros((bucket,), dtype=np.int32)
    arr[: len(ids)] = np.asarray(ids, dtype=np.int32)
    return arr


def _check_ids(ids, bound: int, kind: str) -> None:
    """Raise like the torch reference would on a bad index: JAX gathers clamp
    out-of-range ids silently, which turns a user typo into confidently wrong
    results."""
    arr = np.asarray(ids)
    if arr.size == 0:
        return
    lo, hi = int(arr.min()), int(arr.max())
    if lo < 0 or hi >= bound:
        bad = lo if lo < 0 else hi
        raise IndexError(f"{kind} id {bad} out of range [0, {bound})")


# ---------------------------------------------------------------------------
# jitted kernels (module-level so compilation caches are shared)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("top_k", "num_entities", "use_pallas"))
def _predict_tails_fn(
    g_params, node_emb, entity_norm, rel_table, heads, rels, z, top_k,
    num_entities, use_pallas, table_bf16=None,
):
    """gather -> G fwd -> fused rank -> top-k (SURVEY.md §3.2)."""
    h = node_emb[heads]
    r = rel_table[rels]
    pred = kg_gan.generator_apply(g_params, h, r, z)
    return _rank_topk(pred, entity_norm, top_k, num_entities, use_pallas,
                      table_bf16)


@partial(jax.jit, static_argnames=("top_k", "num_entities", "mesh"))
def _predict_tails_sharded_fn(
    g_params, node_emb, table_sharded, rel_table, heads, rels, z, top_k,
    num_entities, mesh,
):
    """Tensor-parallel predict_tails: the normalized entity table is
    row-sharded over the mesh's ``model`` axis; per-shard rank + top-k merge
    over ICI (parallel/sharded_rank.py). Bit-identical to the single-device
    jnp path (same HIGHEST matmul, same tie-break)."""
    from probgan_tpu.parallel.sharded_rank import sharded_rank_topk

    h = node_emb[heads]
    r = rel_table[rels]
    pred = kg_gan.generator_apply(g_params, h, r, z)
    return sharded_rank_topk(
        rank_ops.l2_normalize(pred), table_sharded, top_k, mesh,
        num_entities=num_entities,
    )


@partial(jax.jit, static_argnames=("k_query", "num_entities", "mesh"))
def _similar_entities_sharded_fn(
    entity_norm, table_sharded, queries, k_query, num_entities, mesh
):
    from probgan_tpu.parallel.sharded_rank import sharded_rank_topk

    # Gather query rows from the SAME cached normalized table the
    # single-device path uses, and re-normalize exactly like _rank_scores
    # does — any numerical difference breaks 1-vs-N bit-identity.
    q = rank_ops.l2_normalize(entity_norm[queries])
    return sharded_rank_topk(
        q, table_sharded, k_query, mesh, num_entities=num_entities
    )


@jax.jit
def _generator_scores_fn(g_params, node_emb, rel_table, triplets, z):
    """Generator-based triplet scoring: cosine(G(h,r), t)
    (pro_b_gan_infer.py:201-202)."""
    h = node_emb[triplets[:, 0]]
    r = rel_table[triplets[:, 1]]
    t = node_emb[triplets[:, 2]]
    pred = kg_gan.generator_apply(g_params, h, r, z)
    return rank_ops.cosine_similarity(pred, t)


@jax.jit
def _discriminator_scores_fn(d_params, node_emb, rel_table, triplets):
    return kg_gan.discriminator_score_triplets(d_params, node_emb, rel_table, triplets)


@partial(jax.jit, static_argnames=("k_query", "num_entities", "use_pallas"))
def _similar_entities_fn(entity_norm, queries, k_query, num_entities,
                         use_pallas, table_bf16=None):
    """Rows of the cached normalized table vs the whole table; k_query =
    min(top_k + 1, N) candidates so host-side self-exclusion can drop the
    query itself (pro_b_gan_infer.py:231-236; clamped so top_k >= N is a
    legal request rather than a crash)."""
    q = entity_norm[queries]
    return _rank_topk(q, entity_norm, k_query, num_entities, use_pallas,
                      table_bf16)


@partial(jax.jit, static_argnames=("top_k", "num_relations"))
def _analyze_relations_fn(d_params, node_emb, rel_table_padded, pairs, top_k, num_relations):
    """Batched relation analysis (SURVEY.md §3.4 fix).

    Args:
        pairs: [P, 2] int (head_id, tail_id) pairs.
        rel_table_padded: [R_pad, D] relation table padded to a _REL_CHUNK
            multiple.
        num_relations: true R (static) — padded rows are masked out of top-k.

    Returns:
        (top_logits [P, top_k], top_probs [P, top_k], top_rel_ids [P, top_k]).
    """
    h = node_emb[pairs[:, 0]]  # [P, D]
    t = node_emb[pairs[:, 1]]  # [P, D]
    r_pad = rel_table_padded.shape[0]
    chunks = rel_table_padded.reshape(r_pad // _REL_CHUNK, _REL_CHUNK, -1)

    def score_chunk(_, r_chunk):
        # [P, C, 3D] -> logits [P, C]
        p = h.shape[0]
        hh = jnp.broadcast_to(h[:, None, :], (p, _REL_CHUNK, h.shape[-1]))
        tt = jnp.broadcast_to(t[:, None, :], (p, _REL_CHUNK, t.shape[-1]))
        rr = jnp.broadcast_to(r_chunk[None, :, :], (p, _REL_CHUNK, r_chunk.shape[-1]))
        logits = kg_gan.discriminator_apply(
            d_params,
            hh.reshape(-1, h.shape[-1]),
            rr.reshape(-1, r_chunk.shape[-1]),
            tt.reshape(-1, t.shape[-1]),
        )
        return None, logits.reshape(p, _REL_CHUNK)

    _, logit_chunks = jax.lax.scan(score_chunk, None, chunks)
    logits = jnp.moveaxis(logit_chunks, 0, 1).reshape(h.shape[0], r_pad)
    probs = jax.nn.sigmoid(logits)
    rel_ids = jax.lax.broadcasted_iota(jnp.int32, (h.shape[0], r_pad), 1)
    valid = rel_ids < num_relations
    masked_probs = jnp.where(valid, probs, -jnp.inf)
    top_probs, top_idx = jax.lax.top_k(masked_probs, top_k)
    top_logits = jnp.take_along_axis(logits, top_idx, axis=1)
    return top_logits, top_probs, top_idx


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

class InferenceEngine:
    """Loads a checkpoint and serves the five reference inference tasks."""

    def __init__(
        self,
        checkpoint_path: str,
        device: str = "auto",
        seed: int = 0,
        use_pallas: bool | None = None,
        mesh=None,
    ):
        """``mesh``: None/""/1 for single-device; "auto" for a mesh over all
        attached devices; an int device count; or a prebuilt
        jax.sharding.Mesh. With a mesh, predict_tails/similar_entities rank
        against the entity table row-sharded over the ``model`` axis
        (SURVEY.md §2.2 TP row) with results bit-identical to single-device."""
        self.device = resolve_device(device)
        self.checkpoint_path = checkpoint_path
        self._rng = RngStream(seed)
        self.mesh = self._resolve_mesh(mesh)
        if use_pallas is None:
            use_pallas = (
                self.device.platform == "tpu"
                and os.environ.get("PROBGAN_PALLAS_RANK", "1") != "0"
            )
        self._use_pallas = use_pallas

        print("Loading Prot-B-GAN inference system...")
        print(f"Checkpoint: {checkpoint_path}")
        if self.mesh is not None:
            print(
                f"Device: mesh of {self.mesh.devices.size} "
                f"(data={self.mesh.shape['data']}, "
                f"model={self.mesh.shape['model']})"
            )
        else:
            print(f"Device: {device_str(self.device)}")

        self._load_checkpoint()

        print("Inference ready!")
        print(f"   - Entities: {self.num_entities:,}")
        print(f"   - Relations: {self.num_relations:,}")
        print(f"   - Embedding dim: {self.embed_dim}")

    @staticmethod
    def _resolve_mesh(mesh):
        from probgan_tpu.parallel.mesh import resolve_mesh

        return resolve_mesh(mesh)

    # -- load ---------------------------------------------------------------

    def _load_checkpoint(self) -> None:
        ckpt = load_checkpoint(self.checkpoint_path)

        saved_args = ckpt.get("args", {}) or {}
        # Defaults match pro_b_gan_infer.py:78-80.
        self.embed_dim = int(saved_args.get("embed_dim", 128))
        self.noise_dim = int(saved_args.get("noise_dim", 64))
        self.hidden_dim = int(saved_args.get("hidden_dim", 1024))

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            put = partial(
                jax.device_put, device=NamedSharding(self.mesh, PartitionSpec())
            )
        else:
            put = partial(jax.device_put, device=self.device)
        self.node_emb = put(jnp.asarray(ckpt["node_emb"], jnp.float32))
        self.rel_table = put(jnp.asarray(ckpt["rel_emb"]["weight"], jnp.float32))
        self.num_entities = int(self.node_emb.shape[0])
        self.num_relations = int(self.rel_table.shape[0])

        print("Model dimensions from checkpoint:")
        print(f"  - Embed dim: {self.embed_dim}")
        print(f"  - Entities: {self.num_entities:,}")
        print(f"  - Relations: {self.num_relations:,}")

        self.generator_params = jax.tree.map(
            lambda a: put(jnp.asarray(a, jnp.float32)), ckpt["generator"]
        )
        self.discriminator_params = jax.tree.map(
            lambda a: put(jnp.asarray(a, jnp.float32)), ckpt["discriminator"]
        )

        # Cache the normalized entity table once (vs per-call at
        # pro_b_gan_infer.py:147), row-padded with zeros so the Pallas rank
        # kernel's N tiling is satisfied for any entity count (padded rows
        # score exactly 0 and are sliced off before top-k in _rank_scores,
        # or masked to -inf in the fused/sharded top-k paths).
        n_pad = -(-self.num_entities // _N_TILE) * _N_TILE
        self.entity_norm = jax.jit(
            lambda t: jnp.pad(
                rank_ops.l2_normalize(t), ((0, n_pad - t.shape[0]), (0, 0))
            )
        )(self.node_emb)
        # bf16 copy for the streamed rank kernel (half the HBM bytes of the
        # dominant table scan; results re-scored exactly in fp32 —
        # ops/pallas_rank.rank_topk_fused). Cast once at load, cached like
        # the normalization. OPT-IN (PROBGAN_BF16_RANK=1): measured on
        # TPU v5e at N=1M the bf16 stream runs ~3x SLOWER than the fp32
        # 6-pass kernel — the single-pass bf16 dot sits at ~80 GB/s
        # effective regardless of tile size, extraction scheme, or operand
        # orientation (benchmarks/RESULTS.md round 3) — so the fp32 kernel
        # stays the production path. Also gated on table size: below
        # BF16_MIN_N the class extraction's displacement probability is
        # non-negligible (and the full table read is cheap anyway).
        self.entity_norm_bf16 = None
        if (
            self._use_pallas
            and self.num_entities >= pallas_rank.BF16_MIN_N
            and os.environ.get("PROBGAN_BF16_RANK", "0") == "1"
        ):
            self.entity_norm_bf16 = jax.jit(
                lambda t: t.astype(jnp.bfloat16)
            )(self.entity_norm)

        if self.mesh is not None:
            # Tensor parallelism: rank against the table row-sharded over the
            # ``model`` axis (parallel/sharded_rank.py handles uneven-N
            # padding and pad-row masking).
            from probgan_tpu.parallel.sharded_rank import shard_entity_table

            self.entity_norm_sharded = shard_entity_table(
                self.entity_norm, self.mesh
            )

        # Pre-pad the relation table for the scanned analyze kernel.
        r_pad = -(-self.num_relations // _REL_CHUNK) * _REL_CHUNK
        self._rel_table_padded = jnp.pad(
            self.rel_table, ((0, r_pad - self.num_relations), (0, 0))
        )

        self.best_val_hit10 = float(ckpt.get("best_val_hit10", 0.0))
        self.best_epoch = int(ckpt.get("best_epoch", 0))
        self.training_history = ckpt.get("training_history", {})

        print("Model performance:")
        print(f"  - Best validation Hit@10: {self.best_val_hit10:.4f}")
        print(f"  - Achieved at epoch: {self.best_epoch}")

    def _place(self, x) -> jax.Array:
        """Place a host array: replicated over the mesh, or on the device."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(x, NamedSharding(self.mesh, PartitionSpec()))
        return jax.device_put(x, self.device)

    def _noise(self, batch: int, task: str) -> jax.Array:
        key = self._rng.next_key(task)
        return self._place(
            jax.random.normal(key, (batch, self.noise_dim), dtype=jnp.float32)
        )

    # -- tasks ----------------------------------------------------------------

    def predict_tails(
        self,
        head_relation_pairs: List[Tuple[int, int]],
        top_k: int = 10,
        return_scores: bool = False,
    ) -> Dict[str, Any]:
        """Top-k tail prediction (pro_b_gan_infer.py:118-165)."""
        n = len(head_relation_pairs)
        print(f"Predicting top-{top_k} tails for {n} head-relation pairs...")

        if n == 0:
            return {
                "predictions": [],
                "metadata": {
                    "num_queries": 0,
                    "top_k": top_k,
                    "model_hit10": self.best_val_hit10,
                },
                **({"scores": []} if return_scores else {}),
            }

        _check_ids([p[0] for p in head_relation_pairs], self.num_entities, "entity")
        _check_ids([p[1] for p in head_relation_pairs], self.num_relations, "relation")
        bucket = _bucket(n)
        heads = _pad_ids([p[0] for p in head_relation_pairs], bucket)
        rels = _pad_ids([p[1] for p in head_relation_pairs], bucket)
        with task_trace("predict_tails"):
            if self.mesh is not None:
                top_scores, top_indices = _predict_tails_sharded_fn(
                    self.generator_params,
                    self.node_emb,
                    self.entity_norm_sharded,
                    self.rel_table,
                    self._place(heads),
                    self._place(rels),
                    self._noise(bucket, "predict_tails"),
                    top_k,
                    self.num_entities,
                    self.mesh,
                )
            else:
                top_scores, top_indices = _predict_tails_fn(
                    self.generator_params,
                    self.node_emb,
                    self.entity_norm,
                    self.rel_table,
                    self._place(heads),
                    self._place(rels),
                    self._noise(bucket, "predict_tails"),
                    top_k,
                    self.num_entities,
                    self._use_pallas,
                    self.entity_norm_bf16,
                )
            top_scores, top_indices = jax.device_get((top_scores, top_indices))

        results: Dict[str, Any] = {
            "predictions": np.asarray(top_indices[:n]).tolist(),
            "metadata": {
                "num_queries": n,
                "top_k": top_k,
                "model_hit10": self.best_val_hit10,
            },
        }
        if return_scores:
            results["scores"] = np.asarray(top_scores[:n], np.float32).tolist()
        return results

    def score_triplets(
        self, triplets: List[Tuple[int, int, int]], method: str = "both"
    ) -> Dict[str, Any]:
        """Generator/discriminator triplet scoring (pro_b_gan_infer.py:167-211)."""
        n = len(triplets)
        print(f"Scoring {n} triplets using {method}...")

        if n == 0:
            results: Dict[str, Any] = {
                "triplets": [],
                "metadata": {
                    "num_triplets": 0,
                    "method": method,
                    "model_hit10": self.best_val_hit10,
                },
            }
            if method in ("generator", "both"):
                results["generator_scores"] = []
            if method in ("discriminator", "both"):
                results["discriminator_logits"] = []
                results["discriminator_probabilities"] = []
            return results

        trip_np = np.asarray(triplets, dtype=np.int32).reshape(n, 3)
        _check_ids(trip_np[:, [0, 2]], self.num_entities, "entity")
        _check_ids(trip_np[:, 1], self.num_relations, "relation")
        bucket = _bucket(n)
        trip = np.zeros((bucket, 3), dtype=np.int32)
        trip[:n] = trip_np
        trip_dev = self._place(trip)

        results: Dict[str, Any] = {
            "triplets": [list(t) for t in triplets],
            "metadata": {
                "num_triplets": n,
                "method": method,
                "model_hit10": self.best_val_hit10,
            },
        }

        with task_trace("score_triplets"):
            if method in ("generator", "both"):
                gen = _generator_scores_fn(
                    self.generator_params,
                    self.node_emb,
                    self.rel_table,
                    trip_dev,
                    self._noise(bucket, "score_triplets"),
                )
                results["generator_scores"] = np.asarray(
                    jax.device_get(gen)[:n], np.float32
                ).tolist()

            if method in ("discriminator", "both"):
                logits, probs = _discriminator_scores_fn(
                    self.discriminator_params, self.node_emb, self.rel_table, trip_dev
                )
                logits, probs = jax.device_get((logits, probs))
                results["discriminator_logits"] = np.asarray(
                    logits[:n], np.float32
                ).tolist()
                results["discriminator_probabilities"] = np.asarray(
                    probs[:n], np.float32
                ).tolist()

        return results

    def find_similar_entities(
        self, entity_ids: List[int], top_k: int = 10
    ) -> Dict[str, Any]:
        """Embedding-space nearest entities (pro_b_gan_infer.py:213-263)."""
        n = len(entity_ids)
        print(f"Finding top-{top_k} similar entities for {n} query entities...")

        if n == 0:
            return {
                "similar_entities": [],
                "metadata": {
                    "num_queries": 0,
                    "top_k": top_k,
                    "model_hit10": self.best_val_hit10,
                },
            }

        _check_ids(entity_ids, self.num_entities, "entity")
        bucket = _bucket(n)
        queries = _pad_ids(entity_ids, bucket)
        k_query = min(top_k + 1, self.num_entities)
        with task_trace("similar_entities"):
            if self.mesh is not None:
                top_scores, top_indices = _similar_entities_sharded_fn(
                    self.entity_norm,
                    self.entity_norm_sharded,
                    self._place(queries),
                    k_query,
                    self.num_entities,
                    self.mesh,
                )
            else:
                top_scores, top_indices = _similar_entities_fn(
                    self.entity_norm,
                    self._place(queries),
                    k_query,
                    self.num_entities,
                    self._use_pallas,
                    self.entity_norm_bf16,
                )
            top_scores, top_indices = jax.device_get((top_scores, top_indices))

        results: Dict[str, Any] = {
            "similar_entities": [],
            "metadata": {
                "num_queries": n,
                "top_k": top_k,
                "model_hit10": self.best_val_hit10,
            },
        }
        for i, query_id in enumerate(entity_ids):
            # Host-side self-exclusion, keeping the reference's edge case: if
            # the query is absent from its own top-(k+1), the (k+1)-th entry
            # is dropped (pro_b_gan_infer.py:247-255; SURVEY.md §0.3).
            idx = np.asarray(top_indices[i])
            val = np.asarray(top_scores[i], np.float32)
            mask = idx != query_id
            results["similar_entities"].append(
                {
                    "query_entity": query_id,
                    "similar_entities": idx[mask][:top_k].tolist(),
                    "similarity_scores": val[mask][:top_k].tolist(),
                }
            )
        return results

    def analyze_relations(
        self, head_ids: List[int], tail_ids: List[int], top_k: int = 5
    ) -> Dict[str, Any]:
        """Most-likely relations per (head, tail) pair
        (pro_b_gan_infer.py:265-320), batched on device (SURVEY.md §3.4)."""
        print(
            f"Analyzing relations between {len(head_ids)} heads and "
            f"{len(tail_ids)} tails..."
        )

        pairs = [(h, t) for h in head_ids for t in tail_ids]
        if not pairs:
            return {
                "relation_analysis": [],
                "metadata": {
                    "num_head_entities": len(head_ids),
                    "num_tail_entities": len(tail_ids),
                    "top_k": top_k,
                    "model_hit10": self.best_val_hit10,
                },
            }
        _check_ids(head_ids, self.num_entities, "entity")
        _check_ids(tail_ids, self.num_entities, "entity")
        bucket = _bucket(len(pairs))
        pair_arr = np.zeros((bucket, 2), dtype=np.int32)
        pair_arr[: len(pairs)] = np.asarray(pairs, dtype=np.int32)

        k = min(top_k, self.num_relations)
        with task_trace("analyze_relations"):
            top_logits, top_probs, top_rels = _analyze_relations_fn(
                self.discriminator_params,
                self.node_emb,
                self._rel_table_padded,
                self._place(pair_arr),
                k,
                self.num_relations,
            )
            top_logits, top_probs, top_rels = jax.device_get(
                (top_logits, top_probs, top_rels)
            )

        results: Dict[str, Any] = {
            "relation_analysis": [],
            "metadata": {
                "num_head_entities": len(head_ids),
                "num_tail_entities": len(tail_ids),
                "top_k": top_k,
                "model_hit10": self.best_val_hit10,
            },
        }
        for i, (head_id, tail_id) in enumerate(pairs):
            top_relations = [
                {
                    "relation_id": int(top_rels[i][j]),
                    "discriminator_score": float(np.float32(top_logits[i][j])),
                    "probability": float(np.float32(top_probs[i][j])),
                }
                for j in range(k)
            ]
            results["relation_analysis"].append(
                {
                    "head_entity": head_id,
                    "tail_entity": tail_id,
                    "top_relations": top_relations,
                }
            )
        return results

    def get_model_info(self) -> Dict[str, Any]:
        """Static model card (pro_b_gan_infer.py:322-338). With a mesh, the
        ``device`` field reports the mesh shape instead of a single device
        (additive: the reference surface is single-device)."""
        if self.mesh is not None:
            device = (
                f"mesh(data={self.mesh.shape['data']},"
                f"model={self.mesh.shape['model']})"
            )
        else:
            device = device_str(self.device)
        return {
            "model_architecture": {
                "embedding_dim": self.embed_dim,
                "noise_dim": self.noise_dim,
                "hidden_dim": self.hidden_dim,
                "num_entities": self.num_entities,
                "num_relations": self.num_relations,
            },
            "training_performance": {
                "best_validation_hit10": self.best_val_hit10,
                "best_epoch": self.best_epoch,
            },
            "checkpoint_path": self.checkpoint_path,
            "device": device,
        }
