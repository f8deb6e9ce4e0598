"""Checkpoint round-trips: native msgpack, torch .pt interop, format detect."""

import os

import numpy as np
import pytest

from probgan_tpu.core.checkpoint import (
    load_checkpoint,
    params_to_torch_state,
    save_checkpoint,
    torch_state_to_params,
)


def _assert_ckpt_equal(a: dict, b: dict):
    np.testing.assert_allclose(a["node_emb"], b["node_emb"], rtol=1e-6)
    np.testing.assert_allclose(
        a["rel_emb"]["weight"], b["rel_emb"]["weight"], rtol=1e-6
    )
    for model in ("generator", "discriminator"):
        for layer in a[model]:
            np.testing.assert_allclose(
                a[model][layer]["w"], b[model][layer]["w"], rtol=1e-6
            )
            np.testing.assert_allclose(
                a[model][layer]["b"], b[model][layer]["b"], rtol=1e-6
            )
    assert float(a["best_val_hit10"]) == pytest.approx(float(b["best_val_hit10"]))
    assert int(a["best_epoch"]) == int(b["best_epoch"])
    assert dict(a["args"]) == dict(b["args"])


def test_native_roundtrip(ckpt_dict, native_ckpt_path):
    loaded = load_checkpoint(native_ckpt_path)
    _assert_ckpt_equal(ckpt_dict, loaded)


def test_torch_pt_roundtrip(ckpt_dict, torch_ckpt_path):
    """The reference artifact is a torch .pt (pro_b_gan_infer.py:74); we must
    read and write it losslessly."""
    loaded = load_checkpoint(torch_ckpt_path)
    _assert_ckpt_equal(ckpt_dict, loaded)


def test_format_detected_by_content_not_extension(tmp_path, ckpt_dict):
    """A native-format file named .pt must still load (detection is by file
    magic, not extension)."""
    path = tmp_path / "best_checkpoint.pt"
    save_checkpoint(str(path), ckpt_dict, format="native")
    loaded = load_checkpoint(str(path))
    _assert_ckpt_equal(ckpt_dict, loaded)


def test_missing_checkpoint_message():
    """Error surface matches pro_b_gan_infer.py:71-72."""
    with pytest.raises(FileNotFoundError, match="Checkpoint not found: /nope.pt"):
        load_checkpoint("/nope.pt")


def test_torch_layout_transpose_roundtrip(ckpt_dict):
    params = ckpt_dict["generator"]
    state = params_to_torch_state(params)
    # torch Linear stores [out, in]
    assert state["fc1.weight"].shape == params["fc1"]["w"].shape[::-1]
    back = torch_state_to_params(state)
    for layer in params:
        np.testing.assert_allclose(params[layer]["w"], back[layer]["w"])
        np.testing.assert_allclose(params[layer]["b"], back[layer]["b"])


def test_orbax_roundtrip(tmp_path, ckpt_dict):
    """Orbax directory backend (format='orbax' / *.orbax suffix): the
    sharded/async-capable option for tables beyond one host buffer."""
    path = str(tmp_path / "best_checkpoint.orbax")
    save_checkpoint(path, ckpt_dict, format="orbax")
    loaded = load_checkpoint(path)
    _assert_ckpt_equal(ckpt_dict, loaded)


def test_orbax_auto_by_suffix(tmp_path, ckpt_dict):
    path = str(tmp_path / "ckpt.orbax")
    save_checkpoint(path, ckpt_dict)  # auto -> orbax by suffix
    import os as _os

    assert _os.path.isdir(path)
    loaded = load_checkpoint(path)
    _assert_ckpt_equal(ckpt_dict, loaded)


def test_engine_loads_orbax_checkpoint(tmp_path, ckpt_dict):
    from probgan_tpu.engine import InferenceEngine

    path = str(tmp_path / "e.orbax")
    save_checkpoint(path, ckpt_dict, format="orbax")
    engine = InferenceEngine(path, device="cpu")
    assert engine.num_entities == 50


def test_msgpack_fixmap_not_sniffed_as_torch(tmp_path):
    """A native msgpack whose first byte is 0x80 (empty fixmap) must not be
    classified as a legacy torch pickle: the sniff requires a valid pickle
    protocol byte (2..5) after the PROTO opcode."""
    from probgan_tpu.core.checkpoint import _looks_like_torch

    path = str(tmp_path / "fixmap.msgpack")
    with open(path, "wb") as f:
        f.write(b"\x80\xa3foo")  # msgpack: {} then a str tag — not pickle
    assert not _looks_like_torch(path)
    # And real legacy-pickle bytes still sniff as torch.
    pk = str(tmp_path / "legacy.bin")
    with open(pk, "wb") as f:
        f.write(b"\x80\x02}q\x00.")
    assert _looks_like_torch(pk)


def test_torch_load_is_weights_only(tmp_path, ckpt_dict, monkeypatch):
    """Loading a .pt goes through torch.load(weights_only=True); a pickle
    carrying arbitrary objects is rejected unless explicitly opted in."""
    import pickle

    from probgan_tpu.core.checkpoint import load_checkpoint, save_checkpoint

    # Normal C17 .pt loads fine under weights_only.
    ok = str(tmp_path / "ok.pt")
    save_checkpoint(ok, ckpt_dict, format="torch")
    assert load_checkpoint(ok)["best_epoch"] == ckpt_dict["best_epoch"]

    # A pickle with a non-tensor payload class is refused without the opt-in.
    evil = str(tmp_path / "evil.pt")
    with open(evil, "wb") as f:
        pickle.dump({"node_emb": os.system}, f, protocol=2)
    monkeypatch.delenv("PROBGAN_TORCH_UNSAFE_LOAD", raising=False)
    with pytest.raises(Exception):
        load_checkpoint(evil)
