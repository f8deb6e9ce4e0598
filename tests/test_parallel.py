"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4):
entity-table TP rank must bit-match the single-device ranking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probgan_tpu.ops import rank as rank_ops
from probgan_tpu.parallel import make_mesh, sharded_rank_topk
from probgan_tpu.parallel.sharded_rank import shard_entity_table


def test_virtual_device_count():
    assert len(jax.devices()) == 8, "conftest must force an 8-device CPU mesh"


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.size == 8
    pure_dp = make_mesh(8, model_parallelism=1)
    assert pure_dp.shape["model"] == 1 and pure_dp.shape["data"] == 8
    pure_tp = make_mesh(8, model_parallelism=8)
    assert pure_tp.shape["model"] == 8


def test_make_mesh_rejects_nondivisible():
    with pytest.raises(ValueError, match="must divide"):
        make_mesh(8, model_parallelism=3)


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_sharded_rank_matches_single_device(tp):
    mesh = make_mesh(8, model_parallelism=tp)
    key = jax.random.key(0)
    table = jax.random.normal(key, (1024, 64), dtype=jnp.float32)
    queries = jax.random.normal(jax.random.key(1), (16, 64), dtype=jnp.float32)

    table_norm = rank_ops.l2_normalize(table)
    q_norm = rank_ops.l2_normalize(queries)

    ref_v, ref_i = rank_ops.rank_topk(q_norm, table_norm, 10)

    sharded_table = shard_entity_table(table_norm, mesh)
    v, i = sharded_rank_topk(q_norm, sharded_table, 10, mesh)

    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v), atol=1e-6)


def test_sharded_rank_with_duplicate_scores():
    """Tie-break parity: duplicate rows across different shards must resolve
    to the lowest global index, like single-device lax.top_k."""
    mesh = make_mesh(8, model_parallelism=4)
    base = jax.random.normal(jax.random.key(2), (256, 32), dtype=jnp.float32)
    table = jnp.concatenate([base, base, base, base], axis=0)  # dup across shards
    table_norm = rank_ops.l2_normalize(table)
    q_norm = rank_ops.l2_normalize(
        jax.random.normal(jax.random.key(3), (4, 32), dtype=jnp.float32)
    )
    ref_v, ref_i = rank_ops.rank_topk(q_norm, table_norm, 8)
    v, i = sharded_rank_topk(q_norm, shard_entity_table(table_norm, mesh), 8, mesh)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v), atol=1e-6)


def test_dp_image_generation_matches_single_device():
    """Batch-sharded DP generation must produce the same pixels as one
    device (no collectives; pure data parallelism)."""
    from probgan_tpu.models import pro_gan
    from probgan_tpu.parallel.sharded_image import dp_generate

    cfg = pro_gan.ProGANConfig(resolution=16, latent_dim=8, fmap_base=64, fmap_max=16)
    stage = cfg.num_stages - 1
    g = pro_gan.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (16, cfg.latent_dim), jnp.float32)

    mesh = make_mesh(8, model_parallelism=1)
    sharded = np.asarray(dp_generate(mesh, g, z, cfg, stage))

    from probgan_tpu.engine.image import generate_fn

    single = np.asarray(
        generate_fn(g, z, jnp.float32(1.0), cfg, stage, jnp.float32, False, None)
    )
    # Same math, possibly different per-shard fusion rounding: allow +/-1.
    diff = np.abs(sharded.astype(np.int32) - single.astype(np.int32))
    assert diff.max() <= 1
    assert sharded.shape == (16, 16, 16, 3)


def test_dp_generate_rejects_indivisible_batch():
    from probgan_tpu.models import pro_gan
    from probgan_tpu.parallel.sharded_image import dp_generate

    cfg = pro_gan.ProGANConfig(resolution=8, latent_dim=8, fmap_base=32, fmap_max=8)
    g = pro_gan.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (3, cfg.latent_dim))
    mesh = make_mesh(8, model_parallelism=1)
    with pytest.raises(ValueError, match="divisible"):
        dp_generate(mesh, g, z, cfg, cfg.num_stages - 1)


def test_sharded_rank_uneven_entity_count():
    """N not divisible by the model axis: shard_entity_table zero-pads and
    sharded_rank_topk masks the pad rows (their cosine would be exactly 0,
    beating genuinely negative scores)."""
    mesh = make_mesh(8, model_parallelism=4)
    table = jax.random.normal(jax.random.key(5), (10, 64), jnp.float32)
    table_norm = rank_ops.l2_normalize(table)
    # make all true scores negative so an unmasked pad row would win
    q_norm = rank_ops.l2_normalize(-jnp.sum(table_norm, axis=0, keepdims=True))
    q_norm = jnp.tile(q_norm, (4, 1))
    sharded = shard_entity_table(table_norm, mesh)
    assert sharded.shape[0] == 12  # padded to a multiple of tp=4
    v, i = sharded_rank_topk(q_norm, sharded, 5, mesh, num_entities=10)
    ref_v, ref_i = rank_ops.rank_topk(q_norm, table_norm, 5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v), atol=1e-6)
    assert np.asarray(i).max() < 10  # no pad index leaked


def test_cli_json_identical_single_vs_mesh(native_ckpt_path, tmp_path, capsys):
    """VERDICT r1 #4 'done' criterion: the CLI's JSON output is identical at
    1 device and on the 8-device mesh for the mesh-routed tasks."""
    import json

    from probgan_tpu.cli.infer import main as infer_main

    for task, extra in [
        ("predict_tails", ["--input_pairs", "[[0,1],[2,3],[7,4]]"]),
        ("similar_entities", ["--input_entities", "[0,7,21]"]),
    ]:
        out1 = str(tmp_path / f"{task}_1.json")
        out8 = str(tmp_path / f"{task}_8.json")
        base = ["--checkpoint_path", native_ckpt_path, "--task", task,
                "--top_k", "5", "--seed", "3"]
        infer_main(base + extra + ["--output_file", out1])
        infer_main(base + extra + ["--output_file", out8, "--mesh", "auto"])
        capsys.readouterr()
        with open(out1) as f:
            r1 = json.load(f)
        with open(out8) as f:
            r8 = json.load(f)
        assert r1 == r8, f"{task} differs between 1 device and the mesh"


def test_engine_mesh_spec_resolution(native_ckpt_path):
    from probgan_tpu.engine import InferenceEngine

    eng = InferenceEngine(native_ckpt_path, device="cpu", mesh="1")
    assert eng.mesh is None
    assert eng.get_model_info()["device"] == "cpu:0"
    eng8 = InferenceEngine(native_ckpt_path, device="cpu", mesh="auto")
    assert eng8.mesh is not None and eng8.mesh.devices.size == 8
    assert eng8.entity_norm_sharded.shape[0] % 8 == 0
    assert eng8.get_model_info()["device"].startswith("mesh(")


def test_resolve_mesh_degenerate_single_device_any_axes():
    """A prebuilt 1-device Mesh degrades to None (no mesh) even with
    non-standard axis names — the axis-name contract only applies when a
    mesh path will actually run."""
    from jax.sharding import Mesh

    from probgan_tpu.parallel.mesh import resolve_mesh

    one = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("x",))
    assert resolve_mesh(one) is None
    # multi-device with wrong axis names still rejected
    bad = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("x",))
    with pytest.raises(ValueError, match="axis names"):
        resolve_mesh(bad)
