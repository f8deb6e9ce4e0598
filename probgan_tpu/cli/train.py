"""KG-GAN trainer CLI — the reference's missing training entry point.

The reference repo references ``python prot_b_gan.py --data_root /path/to/data
--debug --verbose`` three times (install_pro_b_gan.py:59,83,160) but ships no
trainer; only its artifact schema survives (``./modular_results/
best_checkpoint.pt`` with the C17 keys, pro_b_gan_infer.py:12,74-112;
SURVEY.md §0.1). This module supplies that trainer: it honors the advertised
flags, tracks ``best_val_hit10``/``best_epoch``/``training_history`` across
epochs (the best-tracking implied by the checkpoint keys), and writes the
exact C17 schema — by default as a torch ``.pt`` so the artifact is
interchangeable with the reference ecosystem.

Data format: ``train.txt`` (+ optional ``valid.txt``) under ``--data_root``,
one tab/space-separated ``head relation tail`` triplet per line. Integer ids
are used directly; string names are assigned ids from a vocabulary built over
all splits (id maps are saved alongside the checkpoint).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def load_triplets(data_root: str, debug: bool = False):
    """Read train/valid splits. Returns (train [n,3], valid [m,3] or None,
    num_entities, num_relations, vocab-or-None)."""
    train_path = os.path.join(data_root, "train.txt")
    if not os.path.exists(train_path):
        raise FileNotFoundError(f"Training data not found: {train_path}")
    valid_path = os.path.join(data_root, "valid.txt")

    def _is_pure_int_file(path) -> bool:
        """Cheap router: a numeric-looking prefix routes to the native int
        parser. The parser itself validates the WHOLE file and raises on any
        non-integer byte (native/triplet_loader.c), so a file that turns
        stringy after this prefix falls back to the vocabulary path below
        instead of being silently corrupted."""
        with open(path, "rb") as f:
            chunk = f.read(65536)
        return bool(chunk) and all(
            c in b"0123456789-\t\n\r " for c in chunk
        )

    pure_int = _is_pure_int_file(train_path) and (
        not os.path.exists(valid_path) or _is_pure_int_file(valid_path)
    )

    train = vocab = None
    if pure_int:
        # Native C fast path (probgan_tpu/native): one-pass tokenizer that
        # raises ValueError on any byte that is not a whitespace-separated
        # int32 — full-file validation, not just the sniffed prefix.
        from probgan_tpu import native

        try:
            train = native.parse_triplets(train_path)
            valid = (
                native.parse_triplets(valid_path)
                if os.path.exists(valid_path)
                else None
            )
        except ValueError as e:
            if debug:
                print(f"[debug] native parse rejected ({e}); using vocab path")
            train = None
    if train is None:

        def read(path):
            rows = []
            with open(path) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 3:
                        rows.append(parts[:3])
            return rows

        raw_train = read(train_path)
        raw_valid = read(valid_path) if os.path.exists(valid_path) else None
        every = raw_train + (raw_valid or [])
        ents: dict[str, int] = {}
        rels: dict[str, int] = {}
        for h, r, t in every:
            ents.setdefault(h, len(ents))
            rels.setdefault(r, len(rels))
            ents.setdefault(t, len(ents))
        vocab = {"entities": ents, "relations": rels}

        def enc(rows):
            return np.asarray(
                [[ents[h], rels[r], ents[t]] for h, r, t in rows], dtype=np.int32
            )

        train = enc(raw_train)
        valid = enc(raw_valid) if raw_valid else None

    num_entities = int(max(train[:, [0, 2]].max(), valid[:, [0, 2]].max() if valid is not None else 0)) + 1
    num_relations = int(max(train[:, 1].max(), valid[:, 1].max() if valid is not None else 0)) + 1
    if debug:
        print(f"[debug] train={len(train)} valid={0 if valid is None else len(valid)} "
              f"entities={num_entities} relations={num_relations}")
    return train, valid, num_entities, num_relations, vocab


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Prot-B-GAN Training System")
    parser.add_argument("--model", type=str, default="kg", choices=["kg", "image"],
                        help="Model family: 'kg' (link-prediction GAN, the "
                             "reference's domain) or 'image' (progressive "
                             "image GAN; see cli/train_image.py for its flags)")
    parser.add_argument("--data_root", type=str, required=True,
                        help="Directory containing train.txt (and optional valid.txt)")
    parser.add_argument("--debug", action="store_true",
                        help="Enable NaN checking and extra diagnostics")
    parser.add_argument("--verbose", action="store_true",
                        help="Per-batch progress logging")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--embed_dim", type=int, default=128)
    parser.add_argument("--noise_dim", type=int, default=64)
    parser.add_argument("--hidden_dim", type=int, default=1024)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--cosine_weight", type=float, default=1.0)
    parser.add_argument("--ce_weight", type=float, default=1.0,
                        help="Weight of the full-softmax ranking loss")
    parser.add_argument("--adv_weight", type=float, default=0.1,
                        help="Weight of the adversarial fool-D term in the generator loss")
    parser.add_argument("--ce_negatives", type=int, default=-1,
                        help="Sampled-softmax size for the ranking loss: 0 = "
                             "full softmax over all entities (O(B*N) per "
                             "step), N>0 = that many shared negatives, "
                             "-1 = auto (full softmax below 50k entities, "
                             "8192 negatives above)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output_dir", type=str, default="./modular_results",
                        help="Where best_checkpoint.pt is written "
                             "(the reference's default artifact path)")
    parser.add_argument("--checkpoint_format", type=str, default="torch",
                        choices=["torch", "native"])
    parser.add_argument("--resume", action="store_true",
                        help="Resume from <output_dir>/train_state.msgpack "
                             "(full state incl. optimizer; written every epoch)")
    parser.add_argument("--device", type=str, default="auto",
                        choices=["auto", "tpu", "cuda", "cpu"])
    parser.add_argument("--mesh", type=str, default="",
                        help="Multi-device training over a (data, model) "
                        "mesh: 'auto' (all attached devices) or a device "
                        "count. The entity table and its Adam moments "
                        "row-shard over the model axis, batches shard over "
                        "the data axis, and the jitted step partitions via "
                        "GSPMD with XLA collectives over ICI "
                        "(parallel/dp_train.shard_kg_state).")
    return parser


def main(argv: list[str] | None = None) -> int:
    import sys

    raw_argv = sys.argv[1:] if argv is None else list(argv)
    # Dispatch --model image (both "--model image" and "--model=image" forms)
    # to the image trainer, stripping the flag.
    model = None
    filtered = []
    skip_next = False
    for i, a in enumerate(raw_argv):
        if skip_next:
            skip_next = False
            continue
        if a == "--model":
            if i + 1 < len(raw_argv):
                model = raw_argv[i + 1]
                skip_next = True
            continue
        if a.startswith("--model="):
            model = a.split("=", 1)[1]
            continue
        filtered.append(a)
    if model == "image":
        from probgan_tpu.cli.train_image import main as image_main

        return image_main(filtered)

    args = build_parser().parse_args(raw_argv)

    import jax
    import jax.numpy as jnp

    if args.debug:
        jax.config.update("jax_debug_nans", True)

    from probgan_tpu.core.checkpoint import save_checkpoint
    from probgan_tpu.core.device import device_str, resolve_device
    from probgan_tpu.engine import train as train_engine

    device = resolve_device(args.device)
    print("Prot-B-GAN training...")
    print(f"Data root: {args.data_root}")
    print(f"Device: {device_str(device)}")

    mesh = None
    if args.mesh:
        from probgan_tpu.parallel import resolve_mesh

        mesh = resolve_mesh(args.mesh)
    if mesh is not None:
        print(
            f"Mesh: {mesh.devices.size} devices {dict(mesh.shape)} — "
            "entity-table TP + batch DP"
        )

    train, valid, num_entities, num_relations, vocab = load_triplets(
        args.data_root, args.debug
    )
    if valid is None:
        # hold out 5% of train for validation (best-tracking needs a signal)
        rng = np.random.RandomState(args.seed)
        perm = rng.permutation(len(train))
        n_val = max(1, len(train) // 20)
        valid, train = train[perm[:n_val]], train[perm[n_val:]]

    print(f"  - Entities: {num_entities:,}")
    print(f"  - Relations: {num_relations:,}")
    print(f"  - Train triplets: {len(train):,}")
    print(f"  - Valid triplets: {len(valid):,}")

    with jax.default_device(device):
        # Init on CPU (eager init on an accelerator costs one small remote
        # compile per weight shape), then place the state on the device.
        with jax.default_device(jax.devices("cpu")[0]):
            state = train_engine.kg_init_state(
                jax.random.key(args.seed),
                num_entities,
                num_relations,
                args.embed_dim,
                args.noise_dim,
                args.hidden_dim,
                args.lr,
            )
        if mesh is not None:
            from probgan_tpu.parallel.dp_train import (
                kg_batch_sharding, shard_kg_state,
            )

            state = shard_kg_state(mesh, state)
            batch_sharding = kg_batch_sharding(mesh)
        else:
            state = jax.device_put(state, device)
            batch_sharding = None

        from probgan_tpu.core.train_state import load_train_state, save_train_state

        history: dict[str, list] = {"val_hit10": [], "d_loss": [], "g_loss": []}
        best_hit10, best_epoch, start_epoch = 0.0, 0, 0
        os.makedirs(args.output_dir, exist_ok=True)
        train_state_path = os.path.join(args.output_dir, "train_state.msgpack")
        if args.resume and os.path.exists(train_state_path):
            state, meta = load_train_state(train_state_path, state)
            if mesh is not None:
                state = shard_kg_state(mesh, state)
            else:
                state = jax.device_put(state, device)
            history = {k: list(v) for k, v in meta["history"].items()}
            best_hit10 = float(meta["best_hit10"])
            best_epoch = int(meta["best_epoch"])
            start_epoch = int(meta["epoch"])
            print(f"Resumed from epoch {start_epoch} "
                  f"(best Hit@10 {best_hit10:.4f} at epoch {best_epoch})")
        # Structured metrics log (SURVEY.md §5.5): one JSON line per epoch
        # behind the same stdout text the reference-style prints provide.
        # On resume, drop lines past the resumed epoch — a crashed run may
        # have logged epochs after the last saved train_state, which would
        # otherwise duplicate when those epochs re-run.
        metrics_path = os.path.join(args.output_dir, "metrics.jsonl")
        if args.resume and os.path.exists(metrics_path):
            kept = []
            with open(metrics_path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    try:
                        row = json.loads(line)
                    except json.JSONDecodeError:
                        # A crashed run can leave a torn final line — that is
                        # exactly the state this pruning handles; drop it.
                        continue
                    if row.get("epoch", 0) <= start_epoch:
                        kept.append(line)
            with open(metrics_path, "w") as f:
                f.writelines(kept)
        metrics_log = open(metrics_path, "a" if args.resume else "w")
        ckpt_ext = ".pt" if args.checkpoint_format == "torch" else ".msgpack"
        ckpt_path = os.path.join(args.output_dir, f"best_checkpoint{ckpt_ext}")

        noise_dim = args.noise_dim
        valid_dev = jnp.asarray(valid)
        eval_key = jax.random.key(args.seed + 1)
        z_eval = jax.random.normal(eval_key, (len(valid), noise_dim), jnp.float32)

        def checkpoint_dict(state, hit10, epoch):
            ckpt = {
                "args": {
                    "embed_dim": args.embed_dim,
                    "noise_dim": args.noise_dim,
                    "hidden_dim": args.hidden_dim,
                },
                "node_emb": np.asarray(state.node_emb),
                "rel_emb": {"weight": np.asarray(state.rel_emb)},
                "generator": jax.tree.map(np.asarray, state.g_params),
                "discriminator": jax.tree.map(np.asarray, state.d_params),
                "best_val_hit10": float(hit10),
                "best_epoch": int(epoch),
                "training_history": history,
            }
            return ckpt

        from probgan_tpu import native

        ce_neg = args.ce_negatives
        if ce_neg < 0:
            ce_neg = 0 if num_entities <= 50_000 else 8192
        if ce_neg:
            print(f"  - Sampled-softmax ranking loss: {ce_neg} negatives")

        steps_per_epoch = max(1, len(train) // args.batch_size)
        for epoch in range(start_epoch + 1, args.epochs + 1):
            t0 = time.time()
            # Per-epoch shuffle seed: deterministic and resume-stable.
            perm = np.random.RandomState(args.seed + epoch).permutation(len(train))
            epoch_d, epoch_g = 0.0, 0.0
            for step in range(steps_per_epoch):
                idx = perm[step * args.batch_size : (step + 1) * args.batch_size]
                batch = jnp.asarray(train[idx])
                if batch_sharding is not None:
                    batch = jax.device_put(batch, batch_sharding)
                # Global-step derivation: unique for every (epoch, step) —
                # epoch*CONST+step collides across epochs once step > CONST.
                global_step = (epoch - 1) * steps_per_epoch + step
                key = jax.random.fold_in(jax.random.key(args.seed), global_step)
                # Host-side corrupted negatives from the native sampler
                # (C xorshift128+, numpy fallback): corrupted tails + rels
                # for the discriminator; the sampling overlaps device compute.
                nb = len(idx)
                negatives = jnp.asarray(np.stack([
                    native.sample_negatives(nb, num_entities, 2 * global_step),
                    native.sample_negatives(nb, num_relations, 2 * global_step + 1),
                ], axis=1))
                if batch_sharding is not None:
                    negatives = jax.device_put(negatives, batch_sharding)
                ce_ids = (
                    jnp.asarray(native.sample_negatives(
                        ce_neg, num_entities, 0x5EED0000 + global_step
                    ))
                    if ce_neg
                    else None
                )
                state, metrics = train_engine.kg_train_step(
                    state, batch, key, args.lr, args.cosine_weight, args.ce_weight,
                    args.adv_weight, negatives=negatives, ce_negatives=ce_ids,
                )
                epoch_d += float(metrics["d_loss"])
                epoch_g += float(metrics["g_loss"])
                if args.verbose:
                    print(
                        f"  epoch {epoch} step {step + 1}/{steps_per_epoch} "
                        f"d_loss={float(metrics['d_loss']):.4f} "
                        f"g_loss={float(metrics['g_loss']):.4f} "
                        f"gen_cos={float(metrics['gen_cosine']):.4f}"
                    )

            epoch_d = float(epoch_d)
            epoch_g = float(epoch_g)
            # Chunked eval: one unchunked call materializes a
            # [num_valid, num_entities] score matrix (OOM at production N) —
            # the chunk adapts so it stays <= ~2 GB.
            hits, seen = 0.0, 0
            eval_bs = max(64, min(4096, (1 << 29) // max(num_entities, 1)))
            for off in range(0, len(valid), eval_bs):
                vb = valid_dev[off : off + eval_bs]
                zb = z_eval[off : off + eval_bs]
                frac = float(
                    train_engine.kg_eval_hits(
                        state.g_params, state.node_emb, state.rel_emb, vb, zb, 10
                    )
                )
                hits += frac * len(vb)
                seen += len(vb)
            hit10 = hits / max(seen, 1)
            history["val_hit10"].append(hit10)
            history["d_loss"].append(epoch_d / steps_per_epoch)
            history["g_loss"].append(epoch_g / steps_per_epoch)
            print(
                f"Epoch {epoch}/{args.epochs}: val Hit@10={hit10:.4f} "
                f"d_loss={epoch_d / steps_per_epoch:.4f} "
                f"g_loss={epoch_g / steps_per_epoch:.4f} "
                f"({time.time() - t0:.1f}s)"
            )
            metrics_log.write(json.dumps({
                "epoch": epoch,
                "val_hit10": hit10,
                "d_loss": epoch_d / steps_per_epoch,
                "g_loss": epoch_g / steps_per_epoch,
                "seconds": round(time.time() - t0, 2),
            }) + "\n")
            metrics_log.flush()

            if hit10 >= best_hit10:
                best_hit10, best_epoch = hit10, epoch
                save_checkpoint(ckpt_path, checkpoint_dict(state, best_hit10, best_epoch))
                if args.verbose:
                    print(f"  new best; checkpoint saved to {ckpt_path}")

            save_train_state(train_state_path, state, {
                "epoch": epoch,
                "best_hit10": best_hit10,
                "best_epoch": best_epoch,
                "history": history,
            })

        metrics_log.close()
        if vocab is not None:
            with open(os.path.join(args.output_dir, "vocab.json"), "w") as f:
                json.dump(vocab, f)

        print("Training complete!")
        print(f"  - Best validation Hit@10: {best_hit10:.4f}")
        print(f"  - Achieved at epoch: {best_epoch}")
        print(f"  - Checkpoint: {ckpt_path}")
        return 0
