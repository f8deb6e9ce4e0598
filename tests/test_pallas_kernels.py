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
