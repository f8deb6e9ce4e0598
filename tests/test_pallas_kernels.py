"""Pallas kernel parity vs jnp reference paths (SURVEY.md §4: Pallas kernels
tested against their XLA-lowered equivalents). On CPU these run in interpret
mode; on TPU hardware the same tests exercise the compiled kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probgan_tpu.models import pro_gan
from probgan_tpu.ops import pallas_image, pallas_rank
from probgan_tpu.ops import rank as rank_ops

INTERPRET = jax.default_backend() != "tpu"


def test_rank_scores_fused_matches_jnp():
    key = jax.random.key(0)
    pred = jax.random.normal(key, (16, 128), dtype=jnp.float32)
    table = jax.random.normal(jax.random.key(1), (2048, 128), dtype=jnp.float32)
    table_norm = rank_ops.l2_normalize(table)

    assert pallas_rank.supports(pred.shape, table.shape[0])
    fused = pallas_rank.rank_scores_fused(pred, table_norm, interpret=INTERPRET)
    ref = rank_ops.cosine_scores(rank_ops.l2_normalize(pred), table_norm)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-6)


def test_rank_scores_fused_fallback_off_gate():
    """Non-tiling shapes silently take the jnp path with identical results."""
    pred = jax.random.normal(jax.random.key(2), (3, 50), dtype=jnp.float32)
    table = jax.random.normal(jax.random.key(3), (77, 50), dtype=jnp.float32)
    table_norm = rank_ops.l2_normalize(table)
    assert not pallas_rank.supports(pred.shape, table.shape[0])
    out = pallas_rank.rank_scores_fused(pred, table_norm)
    ref = rank_ops.cosine_scores(rank_ops.l2_normalize(pred), table_norm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_rank_scores_fused_zero_row_safe():
    """A zero prediction row must not produce NaNs (eps-clamped norm,
    matching F.normalize semantics at pro_b_gan_infer.py:146)."""
    pred = jnp.zeros((8, 128), dtype=jnp.float32)
    table_norm = rank_ops.l2_normalize(
        jax.random.normal(jax.random.key(4), (512, 128), dtype=jnp.float32)
    )
    out = pallas_rank.rank_scores_fused(pred, table_norm, interpret=INTERPRET)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


@pytest.mark.parametrize("shape", [(2, 64, 64, 3), (1, 128, 128, 3)])
def test_to_uint8_fused_matches_reference(shape):
    x = 3.0 * jax.random.normal(jax.random.key(5), shape, dtype=jnp.float32)
    assert pallas_image.supports(shape)
    fused = pallas_image.to_uint8_fused(x, interpret=INTERPRET)
    ref = pro_gan.to_uint8(x)
    # On real TPU the VPU tanh approximation may flip ~0.1% of pixels by ±1
    # at rounding boundaries; interpret mode is exact.
    diff = np.abs(
        np.asarray(fused).astype(np.int32) - np.asarray(ref).astype(np.int32)
    )
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.005


def test_to_uint8_fused_fallback():
    x = jax.random.normal(jax.random.key(6), (1, 4, 4, 3), dtype=jnp.float32)
    assert not pallas_image.supports(x.shape)
    out = pallas_image.to_uint8_fused(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pro_gan.to_uint8(x)))


def test_rank_topk_fused_matches_lax_topk():
    """Fused rank+top-k must bit-match top_k(scores[:, :N]) of the two-step
    path, including zero-padded table rows being excluded."""
    pred = jax.random.normal(jax.random.key(10), (16, 128), dtype=jnp.float32)
    n = 4000  # true entity count; padded to 2 tiles of 2048
    n_pad = 4096
    table = jax.random.normal(jax.random.key(11), (n_pad, 128), jnp.float32)
    table_norm = np.array(rank_ops.l2_normalize(table))
    table_norm[n:] = 0.0
    table_norm = jnp.asarray(table_norm)

    scores = rank_ops.cosine_scores(rank_ops.l2_normalize(pred), table_norm)
    want_v, want_i = jax.lax.top_k(scores[:, :n], 10)
    got_v, got_i = pallas_rank.rank_topk_fused(
        pred, table_norm, 10, n, interpret=INTERPRET
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=2e-6)


def test_rank_topk_fused_tie_break_lowest_index():
    """Duplicate table rows produce exactly-equal scores; the fused path must
    resolve ties to the lowest entity id like lax.top_k — including ties that
    span tile boundaries."""
    d = 128
    base = np.array(
        jax.random.normal(jax.random.key(12), (4096, d), jnp.float32)
    )
    # rows 5, 2047, 2048, 3000 identical (crosses the 2048 tile boundary)
    for dup in (2047, 2048, 3000):
        base[dup] = base[5]
    table_norm = jnp.asarray(
        base / np.maximum(np.linalg.norm(base, axis=1, keepdims=True), 1e-12)
    )
    pred = jnp.asarray(base[5:6] + 0.0)  # query = the duplicated row, B=8 pad
    pred = jnp.tile(pred, (8, 1))
    scores = rank_ops.cosine_scores(rank_ops.l2_normalize(pred), table_norm)
    want_v, want_i = jax.lax.top_k(scores, 6)
    got_v, got_i = pallas_rank.rank_topk_fused(
        pred, table_norm, 6, 4096, interpret=INTERPRET
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    assert set(np.asarray(got_i)[0][:4].tolist()) == {5, 2047, 2048, 3000}


def test_rank_topk_fused_fallback_off_gate():
    """k > 16 or unaligned shapes fall back to score + lax.top_k."""
    pred = jax.random.normal(jax.random.key(13), (3, 64), dtype=jnp.float32)
    table_norm = rank_ops.l2_normalize(
        jax.random.normal(jax.random.key(14), (100, 64), jnp.float32)
    )
    assert not pallas_rank.supports_topk(pred.shape, 100, 10)
    got_v, got_i = pallas_rank.rank_topk_fused(pred, table_norm, 10, 100)
    scores = rank_ops.cosine_scores(rank_ops.l2_normalize(pred), table_norm)
    want_v, want_i = jax.lax.top_k(scores, 10)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_rank_topk_bf16_stream_matches_exact_path():
    """The bf16-streamed kernel + fp32 rescore must return the SAME
    (values, ids) as the exact path: ids bit-equal, values fp32-class.

    The top-k rows are PLANTED at scattered indices with clear margins:
    at unit-test table sizes a fully random table puts several of the
    global top-k into one 128-lane segment with non-negligible probability
    — exactly the small-N regime the engine's BF16_MIN_N gate excludes
    (ops/pallas_rank.py); this test verifies the mechanics (stream,
    segmented extraction, merge, rescore), not that statistical bound."""
    rng = np.random.RandomState(21)
    n, n_pad, d, b, k = 4000, 4096, 128, 16, 10
    base = rng.standard_normal((n_pad, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    # plant matches with DISTINCT target cosines (0.98, 0.95, ...): blending
    # q with an orthogonal direction sets the cosine explicitly — scaling q
    # alone would normalize away to k exact near-ties, whose sub-ulp order
    # is unspecified (see rank_topk_fused's value note).
    spots = rng.choice(n, size=(b, k), replace=False)
    for bi in range(b):
        qn = q[bi] / np.linalg.norm(q[bi])
        for rank, ent in enumerate(spots[bi]):
            r = base[ent] - np.dot(base[ent], qn) * qn
            r /= np.linalg.norm(r)
            c = 0.98 - 0.03 * rank
            base[ent] = c * qn + np.sqrt(1.0 - c * c) * r
    base[n:] = 0.0
    table_norm = np.array(rank_ops.l2_normalize(jnp.asarray(base)))
    table_norm[n:] = 0.0
    table_norm = jnp.asarray(table_norm)
    table_bf16 = table_norm.astype(jnp.bfloat16)
    pred = jnp.asarray(q)

    scores = rank_ops.cosine_scores(rank_ops.l2_normalize(pred), table_norm)
    want_v, want_i = jax.lax.top_k(scores[:, :n], k)
    got_v, got_i = pallas_rank.rank_topk_fused(
        pred, table_norm, k, n, table_bf16=table_bf16, interpret=INTERPRET
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=2e-6)


def test_rank_topk_bf16_stream_tie_break_and_duplicates():
    """Exact duplicate rows across tile boundaries: the streamed path's
    approximate merge + rescore must still resolve ties to the lowest ids."""
    d = 128
    base = np.array(
        jax.random.normal(jax.random.key(22), (4096, d), jnp.float32)
    )
    for dup in (2047, 2048, 3000):
        base[dup] = base[5]
    table_norm = jnp.asarray(
        base / np.maximum(np.linalg.norm(base, axis=1, keepdims=True), 1e-12)
    )
    table_bf16 = table_norm.astype(jnp.bfloat16)
    pred = jnp.tile(jnp.asarray(base[5:6]), (8, 1))
    scores = rank_ops.cosine_scores(rank_ops.l2_normalize(pred), table_norm)
    want_v, want_i = jax.lax.top_k(scores, 6)
    got_v, got_i = pallas_rank.rank_topk_fused(
        pred, table_norm, 6, 4096, table_bf16=table_bf16, interpret=INTERPRET
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=2e-6)


def test_rank_topk_bf16_stream_masked_tile_fillers():
    """A mostly-masked table (num_entities barely over one tile) makes
    exhausted tiles emit -inf fillers carrying arbitrary in-range ids; the
    rescore must NOT resurrect them as duplicate results."""
    d = 128
    n = 2050  # tile 2 has only 2 real rows; k_ex > 2 forces fillers
    n_pad = 4096
    table = np.array(
        jax.random.normal(jax.random.key(23), (n_pad, d), jnp.float32)
    )
    table[n:] = 0.0
    table_norm = jnp.asarray(
        table / np.maximum(np.linalg.norm(table, axis=1, keepdims=True), 1e-12)
    )
    table_bf16 = table_norm.astype(jnp.bfloat16)
    pred = jax.random.normal(jax.random.key(24), (8, d), jnp.float32)
    scores = rank_ops.cosine_scores(rank_ops.l2_normalize(pred), table_norm)
    want_v, want_i = jax.lax.top_k(scores[:, :n], 10)
    got_v, got_i = pallas_rank.rank_topk_fused(
        pred, table_norm, 10, n, table_bf16=table_bf16, interpret=INTERPRET
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    # no duplicate ids per row
    ids = np.asarray(got_i)
    for row in ids:
        assert len(set(row.tolist())) == len(row)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=2e-6)
