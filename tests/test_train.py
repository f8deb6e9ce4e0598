"""Training-step tests: one G/D step for both model families updates params
and produces finite losses; the KG trainer CLI runs end-to-end on a tiny
synthetic dataset and writes a checkpoint the inference engine loads."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probgan_tpu.engine import train as train_engine
from probgan_tpu.models import pro_gan


def _tree_any_changed(a, b) -> bool:
    leaves = zip(jax.tree.leaves(a), jax.tree.leaves(b))
    return any(not np.array_equal(np.asarray(x), np.asarray(y)) for x, y in leaves)


def test_progan_train_step_updates_both_nets():
    cfg = pro_gan.ProGANConfig(resolution=16, latent_dim=8, fmap_base=64, fmap_max=16)
    state = train_engine.progan_init_state(jax.random.key(0), cfg, lr=1e-3)
    stage = cfg.num_stages - 1
    r = pro_gan.stage_resolution(stage)
    real = jax.random.uniform(jax.random.key(1), (4, r, r, 3), minval=-1, maxval=1)
    z = jax.random.normal(jax.random.key(2), (4, cfg.latent_dim))

    new_state, metrics = train_engine.progan_train_step(
        state, real, z, jnp.float32(0.7), cfg, stage
    )
    for v in metrics.values():
        assert np.isfinite(float(v))
    assert _tree_any_changed(state.g_params, new_state.g_params)
    assert _tree_any_changed(state.d_params, new_state.d_params)


def test_progan_d_loss_decreases_on_repeat():
    """A few D steps on the same batch must reduce d_loss (sanity: gradients
    point the right way)."""
    cfg = pro_gan.ProGANConfig(resolution=8, latent_dim=8, fmap_base=64, fmap_max=16)
    state = train_engine.progan_init_state(jax.random.key(0), cfg, lr=5e-3)
    stage = cfg.num_stages - 1
    r = pro_gan.stage_resolution(stage)
    real = jax.random.uniform(jax.random.key(1), (8, r, r, 3), minval=-1, maxval=1)
    z = jax.random.normal(jax.random.key(2), (8, cfg.latent_dim))

    first = None
    for _ in range(5):
        state, metrics = train_engine.progan_train_step(
            state, real, z, jnp.float32(1.0), cfg, stage
        )
        if first is None:
            first = float(metrics["d_loss"])
    assert float(metrics["d_loss"]) < first


def test_kg_train_step_and_eval():
    state = train_engine.kg_init_state(
        jax.random.key(0), num_entities=30, num_relations=5,
        embed_dim=16, noise_dim=8, hidden_dim=32,
    )
    trips = jnp.asarray(
        np.random.RandomState(0).randint(0, [30, 5, 30], size=(64, 3)), jnp.int32
    )
    new_state, metrics = train_engine.kg_train_step(state, trips, jax.random.key(1))
    for v in metrics.values():
        assert np.isfinite(float(v))
    assert _tree_any_changed(state.node_emb, new_state.node_emb)
    assert _tree_any_changed(state.g_params, new_state.g_params)

    z = jax.random.normal(jax.random.key(2), (64, 8))
    hit = train_engine.kg_eval_hits(
        new_state.g_params, new_state.node_emb, new_state.rel_emb, trips, z, 10
    )
    assert 0.0 <= float(hit) <= 1.0


def test_kg_eval_hits_perfect_generator():
    """If predictions equal the true tail embeddings exactly, Hit@1 is 1
    (modulo duplicate embeddings, which random init avoids)."""
    node = jax.random.normal(jax.random.key(3), (20, 16))
    rel = jax.random.normal(jax.random.key(4), (3, 16))

    # identity "generator": weights that copy h through? Instead, eval rank
    # math directly: pred == t_emb -> true tail similarity is maximal.
    from probgan_tpu.ops import rank as rank_ops

    trips = jnp.asarray([[0, 0, 5], [1, 2, 7], [19, 1, 0]], jnp.int32)
    pred = node[trips[:, 2]]
    sims = rank_ops.cosine_scores(
        rank_ops.l2_normalize(pred), rank_ops.l2_normalize(node)
    )
    true_sim = jnp.take_along_axis(sims, trips[:, 2:3], axis=1)
    rank = 1 + jnp.sum(sims > true_sim, axis=1)
    assert np.all(np.asarray(rank) == 1)


# -- trainer CLI end-to-end ----------------------------------------------------

@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """A learnable synthetic KG: tail = (head + rel) mod N, 40 entities."""
    root = tmp_path_factory.mktemp("kgdata")
    rng = np.random.RandomState(0)
    n, r = 40, 4
    rows = []
    for h in range(n):
        for rel in range(r):
            rows.append((h, rel, (h + rel + 1) % n))
    rng.shuffle(rows)
    split = int(0.9 * len(rows))
    with open(root / "train.txt", "w") as f:
        for h, rel, t in rows[:split]:
            f.write(f"{h}\t{rel}\t{t}\n")
    with open(root / "valid.txt", "w") as f:
        for h, rel, t in rows[split:]:
            f.write(f"{h}\t{rel}\t{t}\n")
    return str(root)


def test_trainer_cli_end_to_end(tiny_dataset, tmp_path, capsys):
    from probgan_tpu.cli.train import main as train_main

    out_dir = str(tmp_path / "results")
    rc = train_main([
        "--data_root", tiny_dataset,
        "--epochs", "3",
        "--batch_size", "32",
        "--embed_dim", "16",
        "--noise_dim", "8",
        "--hidden_dim", "32",
        "--device", "cpu",
        "--output_dir", out_dir,
        "--checkpoint_format", "native",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Training complete!" in out
    assert "Best validation Hit@10:" in out

    ckpt_path = os.path.join(out_dir, "best_checkpoint.msgpack")
    assert os.path.exists(ckpt_path)

    # The artifact must load in the inference engine (C17 schema contract).
    from probgan_tpu.engine import InferenceEngine

    engine = InferenceEngine(ckpt_path, device="cpu")
    assert engine.num_entities == 40
    assert engine.num_relations == 4
    res = engine.predict_tails([(0, 1)], top_k=5)
    assert len(res["predictions"][0]) == 5


def test_trainer_string_vocab(tmp_path, capsys):
    """String entity/relation names get a vocabulary and vocab.json."""
    from probgan_tpu.cli.train import main as train_main

    root = tmp_path / "strdata"
    root.mkdir()
    with open(root / "train.txt", "w") as f:
        for i in range(30):
            f.write(f"ent{i % 5}\trel{i % 2}\tent{(i + 1) % 5}\n")
    out_dir = str(tmp_path / "results")
    rc = train_main([
        "--data_root", str(root),
        "--epochs", "1",
        "--batch_size", "16",
        "--embed_dim", "8",
        "--noise_dim", "4",
        "--hidden_dim", "16",
        "--device", "cpu",
        "--output_dir", out_dir,
        "--checkpoint_format", "native",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "vocab.json"))


def test_trainer_missing_data_errors(tmp_path):
    from probgan_tpu.cli.train import main as train_main

    with pytest.raises(FileNotFoundError, match="Training data not found"):
        train_main(["--data_root", str(tmp_path / "nope"), "--device", "cpu"])


def test_native_loader_used_for_int_files(tiny_dataset):
    """Integer triplet files take the native C parser path (with numpy
    fallback) and match a Python parse."""
    import numpy as np

    from probgan_tpu.cli.train import load_triplets

    train, valid, n_ent, n_rel, vocab = load_triplets(tiny_dataset)
    assert vocab is None
    ref = np.loadtxt(f"{tiny_dataset}/train.txt", dtype=np.int32)
    np.testing.assert_array_equal(train, ref)
    assert n_ent == 40 and n_rel == 4


def test_image_trainer_end_to_end(tmp_path, capsys):
    """Progressive image training (synthetic data) writes a loadable image
    checkpoint; the CLI's generate_images task renders from it."""
    from probgan_tpu.cli.train import main as train_main

    out_dir = str(tmp_path / "img_results")
    rc = train_main([
        "--model", "image",
        "--synthetic", "8",
        "--resolution", "16",
        "--latent_dim", "8",
        "--fmap_base", "64",
        "--fmap_max", "16",
        "--epochs_per_stage", "1",
        "--batch_size", "4",
        "--device", "cpu",
        "--output_dir", out_dir,
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Stage 0 (4²)" in out and "Stage 2 (16²)" in out
    assert "Training complete!" in out

    ckpt = os.path.join(out_dir, "image_checkpoint.msgpack")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))

    from probgan_tpu.cli.infer import main as infer_main

    infer_main([
        "--checkpoint_path", ckpt,
        "--task", "generate_images",
        "--num_images", "2",
        "--device", "cpu",
    ])
    out = capsys.readouterr().out
    assert "Generating 2 images at 16x16" in out


def test_trainer_resume(tiny_dataset, tmp_path, capsys):
    """--resume continues from the saved full train state (params + optimizer
    + loop metadata) instead of restarting."""
    from probgan_tpu.cli.train import main as train_main

    out_dir = str(tmp_path / "resume_results")
    common = [
        "--data_root", tiny_dataset,
        "--batch_size", "32",
        "--embed_dim", "16",
        "--noise_dim", "8",
        "--hidden_dim", "32",
        "--device", "cpu",
        "--output_dir", out_dir,
        "--checkpoint_format", "native",
    ]
    assert train_main(common + ["--epochs", "2"]) == 0
    capsys.readouterr()
    assert os.path.exists(os.path.join(out_dir, "train_state.msgpack"))

    assert train_main(common + ["--epochs", "4", "--resume"]) == 0
    out = capsys.readouterr().out
    assert "Resumed from epoch 2" in out
    assert "Epoch 3/4" in out and "Epoch 4/4" in out
    assert "Epoch 1/4" not in out  # did not restart


def test_image_trainer_resume(tmp_path, capsys):
    from probgan_tpu.cli.train_image import main as image_main

    out_dir = str(tmp_path / "img_resume")
    common = [
        "--synthetic", "8", "--resolution", "16", "--latent_dim", "8",
        "--fmap_base", "64", "--fmap_max", "16", "--epochs_per_stage", "1",
        "--batch_size", "4", "--device", "cpu", "--output_dir", out_dir,
    ]
    assert image_main(common) == 0
    capsys.readouterr()
    assert image_main(common + ["--resume"]) == 0
    out = capsys.readouterr().out
    # All stages already done -> resume is a no-op completion.
    assert "Resumed after stage 2" in out
    assert "Stage 0" not in out


def test_image_trainer_fast_preset(tmp_path, capsys):
    """--fast (the production training preset) implies --bf16 --packed_d
    --packed_g and trains end-to-end to a loadable checkpoint — the flag
    group VERDICT r3 #4 asked to package, exercised on the tiny CPU
    schedule (packed kernels interpret; bf16 step dtype is real)."""
    from probgan_tpu.cli.train_image import build_parser, main as image_main

    out_dir = str(tmp_path / "img_fast")
    rc = image_main([
        "--synthetic", "8", "--resolution", "16", "--latent_dim", "8",
        "--fmap_base", "64", "--fmap_max", "16", "--epochs_per_stage", "1",
        "--batch_size", "4", "--device", "cpu", "--output_dir", out_dir,
        "--fast",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Training complete!" in out
    assert os.path.exists(os.path.join(out_dir, "image_checkpoint.msgpack"))
    # the preset flag itself parses alongside an explicit grade override
    args = build_parser().parse_args(["--fast", "--packed_mode", "mid"])
    assert args.fast and args.packed_mode == "mid"


def test_kg_eval_hits_chunking_equivalence():
    """Chunked eval (as the trainer runs it) must equal one unchunked call."""
    import jax.numpy as jnp

    state = train_engine.kg_init_state(
        jax.random.key(5), num_entities=50, num_relations=4,
        embed_dim=16, noise_dim=8, hidden_dim=32,
    )
    trips = jnp.asarray(
        np.random.RandomState(3).randint(0, [50, 4, 50], size=(40, 3)), jnp.int32
    )
    z = jax.random.normal(jax.random.key(6), (40, 8))
    full = float(train_engine.kg_eval_hits(
        state.g_params, state.node_emb, state.rel_emb, trips, z, 10
    ))
    hits, seen = 0.0, 0
    for off in range(0, 40, 16):
        vb, zb = trips[off:off + 16], z[off:off + 16]
        hits += float(train_engine.kg_eval_hits(
            state.g_params, state.node_emb, state.rel_emb, vb, zb, 10
        )) * len(vb)
        seen += len(vb)
    assert abs(hits / seen - full) < 1e-6


def test_native_parser_rejects_string_ids(tmp_path):
    """The C tokenizer raises on non-integer bytes instead of silently
    stripping them ('GO:0005737' must not become 5737) — the whole-file
    validation behind the cheap prefix sniff in cli/train.py."""
    from probgan_tpu import native

    if not native.native_available():
        pytest.skip("native extension unavailable")
    p = tmp_path / "train.txt"
    # Numeric for the first lines (so a prefix sniff would pass), stringy later.
    p.write_text("1 0 2\n" * 10 + "GO:0005737 0 3\n")
    with pytest.raises(ValueError):
        native.parse_triplets(str(p))


def test_native_parser_rejects_int32_overflow(tmp_path):
    from probgan_tpu import native

    if not native.native_available():
        pytest.skip("native extension unavailable")
    p = tmp_path / "train.txt"
    p.write_text("1 0 2\n3 0 2147483648\n")  # INT32_MAX + 1
    with pytest.raises(ValueError):
        native.parse_triplets(str(p))


def test_trainer_falls_back_to_vocab_on_late_strings(tmp_path):
    """A file whose first 64 KiB is numeric but contains string ids later
    must route to the vocabulary path, not silently corrupt (ADVICE r1)."""
    from probgan_tpu.cli.train import load_triplets

    root = tmp_path / "data"
    root.mkdir()
    # > 64 KiB of pure-int lines, then string ids.
    lines = ["%d 0 %d" % (i % 7, (i + 1) % 7) for i in range(12000)]
    lines.append("GO:0005737 0 GO:0001234")
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    train, valid, n_ent, n_rel, vocab = load_triplets(str(root))
    assert vocab is not None  # vocabulary path was taken
    assert len(train) == 12001


def test_kg_train_step_with_negatives_and_sampled_ce():
    """The corrupted-negative D loss and sampled-softmax CE run and update
    every component; sampled CE must track full CE closely when the sample
    covers most entities."""
    state = train_engine.kg_init_state(
        jax.random.key(0), num_entities=40, num_relations=5,
        embed_dim=16, noise_dim=8, hidden_dim=32,
    )
    trips = jnp.asarray(
        np.random.RandomState(0).randint(0, [40, 5, 40], size=(16, 3)), jnp.int32
    )
    negs = jnp.asarray(
        np.random.RandomState(1).randint(0, [40, 5], size=(16, 2)), jnp.int32
    )
    ce_ids = jnp.asarray(np.arange(40), jnp.int32)  # full coverage
    s1, m1 = train_engine.kg_train_step(
        state, trips, jax.random.key(1), negatives=negs, ce_negatives=ce_ids
    )
    assert np.isfinite(float(m1["d_loss"])) and np.isfinite(float(m1["g_loss"]))
    # params actually moved
    assert not np.allclose(np.asarray(s1.d_params["fc1"]["w"]),
                           np.asarray(state.d_params["fc1"]["w"]))

    # sampled CE with full coverage == full softmax CE (same loss value)
    h = state.node_emb[trips[:, 0]]
    r = state.rel_emb[trips[:, 1]]
    z = jnp.zeros((16, 8), jnp.float32)
    from probgan_tpu.models import kg_gan as kgm

    pred = kgm.generator_apply(state.g_params, h, r, z)
    full = float(train_engine._rank_ce(pred, state.node_emb, trips[:, 2]))
    sampled = float(
        train_engine._sampled_rank_ce(pred, state.node_emb, trips[:, 2], ce_ids)
    )
    np.testing.assert_allclose(sampled, full, rtol=1e-5)


def test_negative_sampling_calibrates_relation_analysis():
    """VERDICT r1 #5 'done' criterion: after training WITH corrupted
    negatives, the discriminator ranks the true relation of held-out pairs
    above random. Tiny structured KG: relation r maps h -> (h + 7*(r+1)) % N."""
    n_ent, n_rel = 30, 4
    rng = np.random.RandomState(0)
    heads = rng.randint(0, n_ent, size=600)
    rels = rng.randint(0, n_rel, size=600)
    tails = (heads + 7 * (rels + 1)) % n_ent
    trips = np.stack([heads, rels, tails], axis=1).astype(np.int32)

    state = train_engine.kg_init_state(
        jax.random.key(3), num_entities=n_ent, num_relations=n_rel,
        embed_dim=16, noise_dim=8, hidden_dim=32, lr=5e-3,
    )
    bs = 64
    for step in range(150):
        idx = rng.randint(0, len(trips), size=bs)
        batch = jnp.asarray(trips[idx])
        negs = jnp.asarray(
            np.stack([
                rng.randint(0, n_ent, size=bs),
                rng.randint(0, n_rel, size=bs),
            ], axis=1).astype(np.int32)
        )
        state, _ = train_engine.kg_train_step(
            state, batch, jax.random.fold_in(jax.random.key(4), step),
            lr=5e-3, negatives=negs,
        )

    # held-out pairs: true relation's D logit should beat the mean of others
    from probgan_tpu.models import kg_gan as kgm

    test_h = jnp.arange(n_ent, dtype=jnp.int32)
    wins = 0
    for r_true in range(n_rel):
        t = (test_h + 7 * (r_true + 1)) % n_ent
        logits = []
        for r in range(n_rel):
            logits.append(np.asarray(kgm.discriminator_apply(
                state.d_params,
                state.node_emb[test_h],
                jnp.tile(state.rel_emb[r][None], (n_ent, 1)),
                state.node_emb[t],
            )))
        logits = np.stack(logits, axis=1)  # [n_ent, n_rel]
        wins += int((logits[:, r_true] > np.median(logits, axis=1)).sum())
    # true relation above the median relation score for most pairs
    assert wins > 0.7 * n_ent * n_rel, f"wins={wins}/{n_ent * n_rel}"


def test_make_synthetic_kg_tool(tmp_path):
    import subprocess
    import sys as _sys

    out = tmp_path / "kg"
    res = subprocess.run(
        [_sys.executable, "tools/make_synthetic_kg.py", "--out", str(out),
         "--entities", "500", "--relations", "11", "--triplets", "3000",
         "--types", "20"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr
    train = np.loadtxt(out / "train.txt", dtype=np.int64)
    valid = np.loadtxt(out / "valid.txt", dtype=np.int64)
    assert train[:, [0, 2]].max() < 500 and train[:, 1].max() < 11
    assert len(valid) > 0
    # many-to-many: some (h, r) should have multiple distinct tails
    key = train[:, 0].astype(np.int64) * 1000 + train[:, 1]
    _, counts = np.unique(key, return_counts=True)
    assert (counts > 1).any()


def test_progan_train_step_updates_ema():
    """g_ema must move toward the new params by exactly (1 - beta) of the
    step delta, and ema_beta=0 must pin it to the raw iterate."""
    cfg = pro_gan.ProGANConfig(resolution=8, latent_dim=8, fmap_base=64, fmap_max=16)
    state = train_engine.progan_init_state(jax.random.key(0), cfg, lr=1e-2)
    stage = cfg.num_stages - 1
    r = pro_gan.stage_resolution(stage)
    real = jax.random.uniform(jax.random.key(1), (4, r, r, 3), minval=-1, maxval=1)
    z = jax.random.normal(jax.random.key(2), (4, cfg.latent_dim))

    beta = 0.9
    new_state, _ = train_engine.progan_train_step(
        state, real, z, jnp.float32(1.0), cfg, stage, ema_beta=beta
    )
    # init seeds ema = params, so after one step: ema = beta*p0 + (1-beta)*p1
    want = jax.tree.map(
        lambda p0, p1: beta * p0 + (1 - beta) * p1,
        state.g_params, new_state.g_params,
    )
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(new_state.g_ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    raw_state, _ = train_engine.progan_train_step(
        state, real, z, jnp.float32(1.0), cfg, stage, ema_beta=0.0
    )
    for a, b in zip(
        jax.tree.leaves(raw_state.g_params), jax.tree.leaves(raw_state.g_ema)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_progan_pre_ema_train_state_upgrades_on_resume(tmp_path):
    """A train_state.msgpack written before the g_ema field existed must
    resume via load_train_state's alias_missing upgrade (the trainer passes
    {"g_ema": "g_params"}); without the alias the mismatch still raises."""
    from flax import serialization

    from probgan_tpu.core.train_state import load_train_state, save_train_state

    cfg = pro_gan.ProGANConfig(resolution=8, latent_dim=8, fmap_base=64, fmap_max=16)
    state = train_engine.progan_init_state(jax.random.key(0), cfg, lr=1e-3)
    path = str(tmp_path / "train_state.msgpack")
    save_train_state(path, state, {"stage": 0, "history": {}})

    # Strip g_ema to simulate the legacy file.
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    del payload["state"]["g_ema"]
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))

    with pytest.raises(ValueError):
        load_train_state(path, state)

    restored, meta = load_train_state(
        path, state, alias_missing={"g_ema": "g_params"}
    )
    assert meta["stage"] == 0
    for a, b in zip(
        jax.tree.leaves(restored.g_ema), jax.tree.leaves(restored.g_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_progan_train_state_grow_restore(tmp_path):
    """grow=True pours a lower-resolution train state into a taller
    template: every trained leaf restores exactly, the new stage's
    params/EMA/Adam moments keep the template's fresh-init values, and
    incompatible files (foreign keys, reshaped leaves) still raise."""
    from probgan_tpu.core.train_state import load_train_state, save_train_state

    cfg8 = pro_gan.ProGANConfig(resolution=8, latent_dim=8, fmap_base=64, fmap_max=16)
    cfg16 = pro_gan.ProGANConfig(resolution=16, latent_dim=8, fmap_base=64, fmap_max=16)
    small = train_engine.progan_init_state(jax.random.key(0), cfg8, lr=1e-3)
    # Make the trained values distinguishable from any fresh init.
    small = small._replace(
        g_params=jax.tree.map(lambda x: x + 7.0, small.g_params),
        g_ema=jax.tree.map(lambda x: x + 9.0, small.g_ema),
    )
    path = str(tmp_path / "train_state.msgpack")
    save_train_state(path, small, {"stage": cfg8.num_stages - 1, "history": {}})

    template = train_engine.progan_init_state(jax.random.key(1), cfg16, lr=1e-3)
    # Without grow the structures mismatch (extra stage) and must raise.
    with pytest.raises((ValueError, KeyError)):
        load_train_state(path, template)

    grown, meta = load_train_state(path, template, grow=True)
    assert meta["stage"] == cfg8.num_stages - 1
    # Trained stages restore exactly (blocks list: stages 1..n-1).
    n_small_blocks = cfg8.num_stages - 1
    for i in range(n_small_blocks):
        np.testing.assert_array_equal(
            np.asarray(grown.g_params["blocks"][i]["conv1"]["w"]),
            np.asarray(small.g_params["blocks"][i]["conv1"]["w"]),
        )
        np.testing.assert_array_equal(
            np.asarray(grown.g_ema["blocks"][i]["conv1"]["w"]),
            np.asarray(small.g_ema["blocks"][i]["conv1"]["w"]),
        )
    # The new stage keeps the template's fresh init — not the +7 offset.
    np.testing.assert_array_equal(
        np.asarray(grown.g_params["blocks"][n_small_blocks]["conv1"]["w"]),
        np.asarray(template.g_params["blocks"][n_small_blocks]["conv1"]["w"]),
    )
    # A reshaped leaf (different fmap ladder) is an error, not a growth.
    cfg_wide = pro_gan.ProGANConfig(
        resolution=16, latent_dim=8, fmap_base=128, fmap_max=32)
    wide = train_engine.progan_init_state(jax.random.key(2), cfg_wide, lr=1e-3)
    with pytest.raises(ValueError, match="shape"):
        load_train_state(path, wide, grow=True)


def test_image_trainer_grow_resume(tmp_path, capsys):
    """--resume --grow extends a finished low-resolution run to a taller
    schedule, training only the new stage (the 512²→1024² chip workflow,
    on the tiny CPU ladder)."""
    from probgan_tpu.cli.train_image import main as image_main
    from probgan_tpu.core.image_checkpoint import load_image_checkpoint

    out_dir = str(tmp_path / "img_grow")
    common = [
        "--synthetic", "8", "--latent_dim", "8",
        "--fmap_base", "64", "--fmap_max", "16", "--epochs_per_stage", "1",
        "--batch_size", "4", "--device", "cpu", "--output_dir", out_dir,
    ]
    assert image_main(common + ["--resolution", "8"]) == 0
    capsys.readouterr()
    assert image_main(
        common + ["--resolution", "16", "--resume", "--grow"]) == 0
    out = capsys.readouterr().out
    assert "Resumed after stage 1" in out
    assert "Stage 2 (16²)" in out and "Stage 0" not in out
    cfg, _, _ = load_image_checkpoint(
        str(tmp_path / "img_grow" / "image_checkpoint.msgpack"))
    assert cfg.resolution == 16


def test_image_trainer_data_placement_parity(tmp_path):
    """--data_placement device (HBM-resident uint8 dataset, on-device
    downscale + batch gather + mirror) must train the same model as the
    classic host pipeline: the placement only moves WHERE batches are
    assembled, never their values. Loss parity to float epsilon over a
    multi-stage run with --mirror engaged covers the downscale, the
    permuted gather, and the flip mask."""
    import json

    from probgan_tpu.cli.train_image import main as image_main

    losses = {}
    for placement in ("host", "device"):
        out_dir = str(tmp_path / f"img_{placement}")
        assert image_main([
            "--synthetic", "12", "--resolution", "8", "--latent_dim", "8",
            "--fmap_base", "64", "--fmap_max", "16", "--epochs_per_stage",
            "2", "--batch_size", "4", "--device", "cpu", "--output_dir",
            out_dir, "--data_placement", placement, "--mirror",
            "--seed", "3",
        ]) == 0
        with open(os.path.join(out_dir, "metrics.jsonl")) as f:
            losses[placement] = [json.loads(line) for line in f]
    assert len(losses["host"]) == len(losses["device"]) == 4
    for h, d in zip(losses["host"], losses["device"]):
        assert abs(h["d_loss"] - d["d_loss"]) < 5e-4
        assert abs(h["g_loss"] - d["g_loss"]) < 5e-3


def test_progan_train_step_packed_fake_flag():
    """packed_fake=True must be bitwise-identical to False when the packed
    gate declines the config (tiny resolution) — the flag only reroutes the
    stop-gradient fake render, never the differentiated paths."""
    cfg = pro_gan.ProGANConfig(resolution=16, latent_dim=8, fmap_base=64, fmap_max=16)
    state = train_engine.progan_init_state(jax.random.key(0), cfg, lr=1e-3)
    stage = cfg.num_stages - 1
    r = pro_gan.stage_resolution(stage)
    real = jax.random.uniform(jax.random.key(1), (4, r, r, 3), minval=-1, maxval=1)
    z = jax.random.normal(jax.random.key(2), (4, cfg.latent_dim))

    s1, m1 = train_engine.progan_train_step(
        state, real, z, jnp.float32(1.0), cfg, stage, packed_fake=False
    )
    s2, m2 = train_engine.progan_train_step(
        state, real, z, jnp.float32(1.0), cfg, stage, packed_fake=True
    )
    assert float(m1["d_loss"]) == float(m2["d_loss"])
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _flat_concat(tree):
    return np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree.leaves(tree)]
    )


def test_bf16_train_step_gradient_parity():
    """Mixed-precision (dtype=bfloat16) gradients must agree in direction
    with the fp32 gradients — the parity evidence behind the bf16 training
    path (convs bf16 on the MXU; params/loss math fp32)."""
    cfg = pro_gan.ProGANConfig(resolution=16, latent_dim=8, fmap_base=64,
                               fmap_max=16)
    stage = cfg.num_stages - 1
    r = pro_gan.stage_resolution(stage)
    state = train_engine.progan_init_state(jax.random.key(0), cfg, lr=1e-3)
    real = jax.random.uniform(jax.random.key(1), (8, r, r, 3), minval=-1,
                              maxval=1)
    z = jax.random.normal(jax.random.key(2), (8, cfg.latent_dim))

    def d_grads(dtype):
        def loss(d_params):
            fake = pro_gan.generator_rgb(state.g_params, z, cfg, stage, 1.0,
                                         dtype)
            rl = pro_gan.discriminator_apply(
                d_params, real.astype(dtype), cfg, stage, 1.0, dtype
            ).astype(jnp.float32)
            fl = pro_gan.discriminator_apply(
                d_params, jax.lax.stop_gradient(fake), cfg, stage, 1.0, dtype
            ).astype(jnp.float32)
            return jnp.mean(jax.nn.softplus(-rl)) + jnp.mean(jax.nn.softplus(fl))

        return jax.grad(loss)(state.d_params)

    g32 = _flat_concat(d_grads(jnp.float32))
    g16 = _flat_concat(d_grads(jnp.bfloat16))
    assert g16.dtype == np.float64 and np.all(np.isfinite(g16))
    cos = np.dot(g32, g16) / (np.linalg.norm(g32) * np.linalg.norm(g16))
    assert cos > 0.99, cos
    rel = np.linalg.norm(g32 - g16) / np.linalg.norm(g32)
    assert rel < 0.15, rel


def test_bf16_train_loss_curve_matches_fp32():
    """A short bf16 training run must track the fp32 loss curve (loss-curve
    equivalence for the mixed-precision path) and keep fp32 params."""
    cfg = pro_gan.ProGANConfig(resolution=8, latent_dim=8, fmap_base=64,
                               fmap_max=16)
    stage = cfg.num_stages - 1
    r = pro_gan.stage_resolution(stage)
    real = jax.random.uniform(jax.random.key(1), (8, r, r, 3), minval=-1,
                              maxval=1)

    curves = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        state = train_engine.progan_init_state(jax.random.key(0), cfg, lr=1e-3)
        losses = []
        for step in range(6):
            z = jax.random.normal(jax.random.fold_in(jax.random.key(2), step),
                                  (8, cfg.latent_dim))
            state, metrics = train_engine.progan_train_step(
                state, real, z, jnp.float32(1.0), cfg, stage, 1e-3,
                dtype=dtype,
            )
            losses.append(float(metrics["d_loss"]))
        curves[dtype] = losses
        assert all(
            leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(state.g_params)
        )
    diff = np.abs(np.asarray(curves[jnp.float32]) -
                  np.asarray(curves[jnp.bfloat16]))
    assert diff.max() < 0.1, curves


def test_image_trainer_mesh(tmp_path, capsys):
    """--mesh trains data-parallel over the 8-device CPU mesh end-to-end and
    the checkpoint interchanges with single-device --resume (replicated
    updates == single-device math, parallel/dp_train.py)."""
    from probgan_tpu.cli.train_image import main as image_main

    out_dir = str(tmp_path / "img_mesh")
    common = [
        "--synthetic", "8", "--resolution", "16", "--latent_dim", "8",
        "--fmap_base", "64", "--fmap_max", "16", "--epochs_per_stage", "1",
        "--batch_size", "8", "--output_dir", out_dir,
    ]
    assert image_main(common + ["--mesh", "8"]) == 0
    out = capsys.readouterr().out
    assert "Mesh: 8 devices" in out and "Training complete!" in out
    assert os.path.exists(os.path.join(out_dir, "image_checkpoint.msgpack"))

    # resume WITHOUT the mesh: states interchange freely
    assert image_main(common + ["--resume"]) == 0
    assert "Resumed after stage 2" in capsys.readouterr().out


def test_image_trainer_mesh_rejects_bad_batch(tmp_path, capsys):
    from probgan_tpu.cli.train_image import main as image_main

    rc = image_main([
        "--synthetic", "8", "--resolution", "8", "--batch_size", "6",
        "--mesh", "8", "--output_dir", str(tmp_path / "x"),
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert "divisible" in out


def test_kg_trainer_mesh(tiny_dataset, tmp_path, capsys):
    """--mesh shards the entity table (TP) + batches (DP) through the same
    trainer loop; resume interchanges with the single-device path."""
    from probgan_tpu.cli.train import main as train_main

    out_dir = str(tmp_path / "kg_mesh")
    common = [
        "--data_root", tiny_dataset, "--batch_size", "32",
        "--embed_dim", "16", "--noise_dim", "8", "--hidden_dim", "32",
        "--output_dir", out_dir, "--checkpoint_format", "native",
    ]
    assert train_main(common + ["--epochs", "2", "--mesh", "8"]) == 0
    out = capsys.readouterr().out
    assert "Mesh: 8 devices" in out
    assert "Epoch 2/2" in out and "Training complete!" in out

    assert train_main(common + ["--epochs", "3", "--resume"]) == 0
    out = capsys.readouterr().out
    assert "Resumed from epoch 2" in out and "Epoch 3/3" in out


def test_progan_train_step_accum_matches_plain_at_a1():
    """One microbatch (A=1) must reproduce the plain step to fp32
    reduction-order tolerance — same losses, same post-Adam params."""
    cfg = pro_gan.ProGANConfig(resolution=16, latent_dim=8, fmap_base=64,
                               fmap_max=16)
    stage = cfg.num_stages - 1
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.standard_normal((8, 16, 16, 3)) * 0.5, jnp.float32)
    z = jnp.asarray(rng.standard_normal((8, cfg.latent_dim)), jnp.float32)
    state0 = train_engine.progan_init_state(jax.random.key(1), cfg)

    s_ref, m_ref = train_engine.progan_train_step(
        state0, real, z, jnp.float32(0.7), cfg, stage, 1e-3
    )
    s_a1, m_a1 = train_engine.progan_train_step_accum(
        state0, real[None], z[None], jnp.float32(0.7), cfg, stage, 1e-3
    )
    assert float(m_ref["d_loss"]) == pytest.approx(float(m_a1["d_loss"]), abs=1e-6)
    assert float(m_ref["g_loss"]) == pytest.approx(float(m_a1["g_loss"]), abs=1e-6)
    for a, b in zip(jax.tree.leaves(s_ref.g_params), jax.tree.leaves(s_a1.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_ref.d_params), jax.tree.leaves(s_a1.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_progan_train_step_accum_averages_microbatches():
    """A=4 accumulation trains (finite losses, both nets move) and its
    reported d_loss equals the mean of the four per-microbatch D losses
    evaluated at the initial params — the accumulation contract."""
    cfg = pro_gan.ProGANConfig(resolution=16, latent_dim=8, fmap_base=64,
                               fmap_max=16)
    stage = cfg.num_stages - 1
    rng = np.random.RandomState(1)
    real = jnp.asarray(rng.standard_normal((8, 16, 16, 3)) * 0.5, jnp.float32)
    z = jnp.asarray(rng.standard_normal((8, cfg.latent_dim)), jnp.float32)
    state0 = train_engine.progan_init_state(jax.random.key(2), cfg)

    s_acc, m_acc = train_engine.progan_train_step_accum(
        state0, real.reshape(4, 2, 16, 16, 3), z.reshape(4, 2, -1),
        jnp.float32(1.0), cfg, stage, 1e-3
    )
    assert np.isfinite(float(m_acc["d_loss"]))
    assert _tree_any_changed(state0.g_params, s_acc.g_params)
    assert _tree_any_changed(state0.d_params, s_acc.d_params)

    per_micro = []
    for k in range(4):
        _, m_k = train_engine.progan_train_step(
            state0, real[2 * k : 2 * k + 2], z[2 * k : 2 * k + 2],
            jnp.float32(1.0), cfg, stage, 1e-3
        )
        per_micro.append(float(m_k["d_loss"]))
    assert float(m_acc["d_loss"]) == pytest.approx(np.mean(per_micro), abs=1e-5)


def test_image_trainer_grad_accum_cli(tmp_path, capsys):
    from probgan_tpu.cli.train_image import main as image_main

    out_dir = str(tmp_path / "img_accum")
    rc = image_main([
        "--synthetic", "8", "--resolution", "16", "--latent_dim", "8",
        "--fmap_base", "64", "--fmap_max", "16", "--epochs_per_stage", "1",
        "--batch_size", "4", "--grad_accum", "2", "--output_dir", out_dir,
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "Training complete!" in out
    assert os.path.exists(os.path.join(out_dir, "image_checkpoint.msgpack"))

    # not composable with --mesh (yet) — clean error, not a crash
    rc = image_main([
        "--synthetic", "8", "--resolution", "8", "--batch_size", "8",
        "--grad_accum", "2", "--mesh", "8",
        "--output_dir", str(tmp_path / "x"),
    ])
    out = capsys.readouterr().out
    assert rc == 1 and "not composable" in out


def test_image_trainer_mirror_augmentation(tmp_path, capsys):
    from probgan_tpu.cli.train_image import main as image_main

    out_dir = str(tmp_path / "img_mirror")
    rc = image_main([
        "--synthetic", "8", "--resolution", "16", "--latent_dim", "8",
        "--fmap_base", "64", "--fmap_max", "16", "--epochs_per_stage", "1",
        "--batch_size", "4", "--mirror", "--output_dir", out_dir,
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "Training complete!" in out


def test_progan_r1_penalty_matches_analytic():
    """d_loss with r1_gamma must exceed the plain d_loss by exactly
    gamma/2 * E[||grad_x D(x)||^2] at the initial params (computed
    independently here), and the step must also compose with packed_d —
    the penalty's second-order D pass routes through XLA while the main
    loss stays on the packed kernels."""
    cfg = pro_gan.ProGANConfig(resolution=16, latent_dim=8, fmap_base=64,
                               fmap_max=16)
    stage = cfg.num_stages - 1
    rng = np.random.RandomState(2)
    real = jnp.asarray(rng.standard_normal((4, 16, 16, 3)) * 0.5, jnp.float32)
    z = jnp.asarray(rng.standard_normal((4, cfg.latent_dim)), jnp.float32)
    state0 = train_engine.progan_init_state(jax.random.key(3), cfg)
    gamma = 10.0

    _, m_plain = train_engine.progan_train_step(
        state0, real, z, jnp.float32(1.0), cfg, stage, 1e-3
    )
    s_r1, m_r1 = train_engine.progan_train_step(
        state0, real, z, jnp.float32(1.0), cfg, stage, 1e-3, r1_gamma=gamma
    )

    def d_sum(imgs):
        return jnp.sum(pro_gan.discriminator_apply(
            state0.d_params, imgs, cfg, stage, jnp.float32(1.0)
        ))

    g = jax.grad(d_sum)(real)
    penalty = float(jnp.mean(jnp.sum(jnp.square(g), axis=(1, 2, 3))))
    assert penalty > 0
    assert float(m_r1["d_loss"]) - float(m_plain["d_loss"]) == pytest.approx(
        0.5 * gamma * penalty, rel=1e-4
    )
    assert _tree_any_changed(state0.d_params, s_r1.d_params)

    # composes with the packed-D training path (no custom-VJP 2nd-order error)
    _, m_pk = train_engine.progan_train_step(
        state0, real, z, jnp.float32(1.0), cfg, stage, 1e-3,
        packed_d=True, r1_gamma=gamma,
    )
    assert np.isfinite(float(m_pk["d_loss"]))


def test_image_trainer_r1_cli(tmp_path, capsys):
    from probgan_tpu.cli.train_image import main as image_main

    rc = image_main([
        "--synthetic", "8", "--resolution", "8", "--latent_dim", "8",
        "--fmap_base", "64", "--fmap_max", "16", "--epochs_per_stage", "2",
        "--batch_size", "4", "--r1_gamma", "10.0", "--r1_every", "2",
        "--output_dir", str(tmp_path / "img_r1"),
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "Training complete!" in out


def test_image_trainer_grow_requires_resume(tmp_path, capsys):
    """--grow without --resume errors instead of silently training the new
    (higher) resolution from scratch (ADVICE r4)."""
    from probgan_tpu.cli.train_image import main as image_main

    rc = image_main([
        "--synthetic", "8", "--resolution", "8", "--grow",
        "--output_dir", str(tmp_path / "img_g"),
    ])
    out = capsys.readouterr().out
    assert rc == 1 and "requires --resume" in out


def test_image_trainer_resume_missing_state_errors(tmp_path, capsys):
    """--resume with no train_state.msgpack errors instead of silently
    starting a from-scratch run (ADVICE r4)."""
    from probgan_tpu.cli.train_image import main as image_main

    rc = image_main([
        "--synthetic", "8", "--resolution", "8", "--resume",
        "--output_dir", str(tmp_path / "img_missing"),
    ])
    out = capsys.readouterr().out
    assert rc == 1 and "no train state" in out


def test_image_trainer_mid_stage_resume(tmp_path, capsys):
    """A train state saved mid-stage (timed --checkpoint_minutes saves)
    resumes at the saved epoch instead of redoing the stage — the property
    that bounds an outage's cost to minutes on the multi-hour 512²/1024²
    stages."""
    import json

    from flax import serialization

    from probgan_tpu.cli.train_image import main as image_main

    out_dir = str(tmp_path / "img_mid")
    common = [
        "--synthetic", "8", "--resolution", "8", "--latent_dim", "8",
        "--fmap_base", "64", "--fmap_max", "16", "--epochs_per_stage", "4",
        "--batch_size", "4", "--device", "cpu", "--output_dir", out_dir,
        # threshold ~0 -> every epoch writes a mid-stage save
        "--checkpoint_minutes", "1e-9", "--verbose",
    ]
    assert image_main(common) == 0
    out = capsys.readouterr().out
    assert "mid-stage train state saved" in out

    state_path = os.path.join(out_dir, "train_state.msgpack")
    with open(state_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    assert payload["meta"]["epoch"] == 4  # stage-end save is authoritative
    # Pretend the run died after epoch 2 of the final stage (index 1).
    payload["meta"]["epoch"] = 2
    with open(state_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))

    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    with open(metrics_path) as f:
        n_before = sum(1 for _ in f)
    assert image_main(common + ["--resume"]) == 0
    out = capsys.readouterr().out
    assert "Resumed mid-stage 1 (next: epoch 3/4)" in out
    with open(metrics_path) as f:
        rows = [json.loads(line) for line in f][n_before:]
    # Only the remaining epochs of the interrupted stage ran.
    assert [(r["stage"], r["epoch"]) for r in rows] == [(1, 3), (1, 4)]
