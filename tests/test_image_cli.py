"""Image checkpoint format + generate_images CLI task tests."""

import json

import jax
import numpy as np
import pytest

from probgan_tpu.cli.infer import main
from probgan_tpu.core.image_checkpoint import (
    is_image_checkpoint,
    load_image_checkpoint,
    save_image_checkpoint,
)
from probgan_tpu.models import pro_gan

CFG = pro_gan.ProGANConfig(resolution=32, latent_dim=16, fmap_base=128, fmap_max=32)


@pytest.fixture(scope="module")
def image_ckpt_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("imgckpt") / "image_checkpoint.msgpack"
    g = jax.tree.map(np.asarray, pro_gan.init_generator(jax.random.key(0), CFG))
    d = jax.tree.map(np.asarray, pro_gan.init_discriminator(jax.random.key(1), CFG))
    save_image_checkpoint(str(path), CFG, g, d)
    return str(path)


def test_image_checkpoint_roundtrip(image_ckpt_path):
    cfg, g, d = load_image_checkpoint(image_ckpt_path)
    assert cfg == CFG
    assert g["base_dense"]["w"].shape == (CFG.latent_dim, CFG.nf(0) * 16)
    assert "from_rgb" in d


def test_non_image_checkpoint_rejected(native_ckpt_path):
    with pytest.raises(ValueError, match="Not an image-GAN checkpoint"):
        load_image_checkpoint(native_ckpt_path)


def test_is_image_checkpoint(ckpt_dict):
    assert not is_image_checkpoint(ckpt_dict)
    assert is_image_checkpoint({"image_generator": {}})


def _extract_json(out):
    start = out.index("{\n")
    return json.loads(out[start:])


def test_generate_images_cli(capsys, image_ckpt_path):
    main([
        "--checkpoint_path", image_ckpt_path,
        "--task", "generate_images",
        "--num_images", "3",
        "--device", "cpu",
        "--seed", "5",
    ])
    out = capsys.readouterr().out
    assert "Generating 3 images at 32x32" in out
    res = _extract_json(out)
    assert res["images_shape"] == [3, 32, 32, 3]
    assert res["dtype"] == "uint8"
    assert res["metadata"]["resolution"] == 32


def test_generate_images_cli_deterministic(capsys, image_ckpt_path):
    """Same seed -> same checksum (explicit RNG policy)."""
    checks = []
    for _ in range(2):
        main([
            "--checkpoint_path", image_ckpt_path,
            "--task", "generate_images",
            "--num_images", "2",
            "--device", "cpu",
            "--seed", "11",
        ])
        checks.append(_extract_json(capsys.readouterr().out)["checksum"])
    assert checks[0] == checks[1]


def test_generate_images_cli_npz_output(capsys, tmp_path, image_ckpt_path):
    npz = str(tmp_path / "imgs.npz")
    main([
        "--checkpoint_path", image_ckpt_path,
        "--task", "generate_images",
        "--num_images", "2",
        "--stage", "2",
        "--alpha", "0.5",
        "--device", "cpu",
        "--output_file", npz,
    ])
    out = capsys.readouterr().out
    assert f"Images saved to: {npz}" in out
    data = np.load(npz)["images"]
    assert data.shape == (2, 16, 16, 3)
    assert data.dtype == np.uint8


def test_image_checkpoint_prefers_ema(tmp_path):
    """load_image_checkpoint returns the EMA generator when stored (the
    serving default) and the raw iterate with prefer_ema=False."""
    path = str(tmp_path / "ema_ckpt.msgpack")
    g = jax.tree.map(np.asarray, pro_gan.init_generator(jax.random.key(2), CFG))
    ema = jax.tree.map(lambda x: x + 1.0, g)
    save_image_checkpoint(path, CFG, g, g_ema=ema)

    _, g_pref, _ = load_image_checkpoint(path)
    _, g_raw, _ = load_image_checkpoint(path, prefer_ema=False)
    np.testing.assert_array_equal(
        g_pref["base_dense"]["w"], np.asarray(g["base_dense"]["w"]) + 1.0
    )
    np.testing.assert_array_equal(g_raw["base_dense"]["w"], g["base_dense"]["w"])

    # No EMA stored -> both return the raw generator (back-compat).
    path2 = str(tmp_path / "plain_ckpt.msgpack")
    save_image_checkpoint(path2, CFG, g)
    _, g2, _ = load_image_checkpoint(path2)
    np.testing.assert_array_equal(g2["base_dense"]["w"], g["base_dense"]["w"])


def test_load_image_checkpoint_trees_names_both(tmp_path):
    """The unambiguous loader returns (raw, ema) by name so resume paths
    can't accidentally train from the EMA tree."""
    from probgan_tpu.core.image_checkpoint import load_image_checkpoint_trees

    path = str(tmp_path / "trees_ckpt.msgpack")
    g = jax.tree.map(np.asarray, pro_gan.init_generator(jax.random.key(5), CFG))
    ema = jax.tree.map(lambda x: x + 2.0, g)
    save_image_checkpoint(path, CFG, g, g_ema=ema)
    _, g_raw, g_ema, _ = load_image_checkpoint_trees(path)
    np.testing.assert_array_equal(g_raw["base_dense"]["w"], g["base_dense"]["w"])
    np.testing.assert_array_equal(
        g_ema["base_dense"]["w"], np.asarray(g["base_dense"]["w"]) + 2.0
    )

    path2 = str(tmp_path / "trees_plain.msgpack")
    save_image_checkpoint(path2, CFG, g)
    _, _, no_ema, _ = load_image_checkpoint_trees(path2)
    assert no_ema is None
