"""Progressive image-GAN trainer.

Trains the north-star image family (models/pro_gan.py) with the classic
progressive schedule: stages grow 4² -> target resolution; within each stage
the blend alpha ramps 0 -> 1 over the first half of the stage's epochs
(fade-in), then trains at alpha=1. One jitted train step per stage
(engine/train.py:progan_train_step); real images are average-pooled down to
the active stage's resolution.

Data: ``--data_root`` with ``images.npy``/``images.npz`` holding uint8
[N, H, W, 3] (H = W = target resolution), or ``--synthetic N`` to train
against a procedural dataset (random gaussian blobs) for smoke runs and
benchmarks. Writes the image checkpoint schema
(core/image_checkpoint.py) to ``<output_dir>/image_checkpoint.msgpack`` after
every stage, plus per-epoch metrics JSONL.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def synthetic_images(n: int, resolution: int, seed: int = 0) -> np.ndarray:
    """Procedural uint8 dataset: soft gaussian blobs on gradients — enough
    structure for losses to move without shipping a dataset."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:resolution, 0:resolution].astype(np.float32) / resolution
    imgs = np.empty((n, resolution, resolution, 3), np.float32)
    for i in range(n):
        cx, cy = rng.uniform(0.2, 0.8, 2)
        sigma = rng.uniform(0.05, 0.3)
        blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma**2))
        base = rng.uniform(0, 1, 3)[None, None, :]
        grad = (xx * rng.uniform(-1, 1) + yy * rng.uniform(-1, 1))[..., None]
        img = np.clip(base + 0.5 * grad + blob[..., None] * rng.uniform(-1, 1, 3), 0, 1)
        imgs[i] = img
    return (imgs * 255).astype(np.uint8)


def load_images(data_root: str) -> np.ndarray:
    for name in ("images.npy", "images.npz"):
        path = os.path.join(data_root, name)
        if os.path.exists(path):
            if name.endswith(".npz"):
                return np.load(path)["images"]
            return np.load(path)
    raise FileNotFoundError(
        f"No images.npy/images.npz under {data_root} "
        "(expected uint8 [N, R, R, 3])"
    )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Prot-B-GAN Image Training")
    parser.add_argument("--data_root", type=str, default="",
                        help="Directory with images.npy/images.npz (uint8 [N,R,R,3])")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="Train on N procedural synthetic images instead of --data_root")
    parser.add_argument("--resolution", type=int, default=64)
    parser.add_argument("--latent_dim", type=int, default=512)
    parser.add_argument("--fmap_base", type=int, default=8192)
    parser.add_argument("--fmap_max", type=int, default=512)
    parser.add_argument("--epochs_per_stage", type=int, default=4)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--output_dir", type=str, default="./modular_results")
    parser.add_argument("--device", type=str, default="auto",
                        choices=["auto", "tpu", "cuda", "cpu"])
    parser.add_argument("--precision", type=str, default="default",
                        choices=["default", "fast", "high", "highest"])
    parser.add_argument("--resume", action="store_true",
                        help="Resume from <output_dir>/train_state.msgpack")
    parser.add_argument("--grow", action="store_true",
                        help="With --resume: allow the saved state to come "
                        "from a LOWER-resolution schedule (progressive "
                        "growth — e.g. extend a finished 512² run to 1024² "
                        "by training only the new stage). Trained "
                        "params/EMA/Adam moments restore; the new stage's "
                        "start fresh and fade in as usual")
    parser.add_argument("--ema_beta", type=float, default=0.999,
                        help="Generator EMA decay (0 disables; EMA weights "
                        "are what generate_images serves by default)")
    parser.add_argument("--bf16", action="store_true",
                        help="Mixed-precision training: convs run bfloat16 "
                        "on the MXU (params, EMA, optimizer state and loss "
                        "math stay fp32) — measured ~25%% faster per 1024² "
                        "step with gradient parity (tests/test_train.py)")
    parser.add_argument("--packed_d", action="store_true",
                        help="Run the lane-wasteful leading D stages on the "
                        "phase-blocked Pallas kernels for forward AND "
                        "backward (custom VJPs, ops/packed_vjp.py); only "
                        "engages at stages >= 256² with nf <= 64")
    parser.add_argument("--packed_g", action="store_true",
                        help="Likewise for the generator's late-stage convs "
                        "(fused upsample+conv and conv, lrelu+PixelNorm "
                        "epilogue); toRGB/blend stay XLA")
    parser.add_argument("--packed_mode", type=str, default="default",
                        choices=["default", "mid", "high"],
                        help="MXU grade of the packed training kernels' dots "
                        "when --packed_d/--packed_g engage: 'default' is "
                        "1-pass bf16 (the same class as the XLA training "
                        "path), 'mid' drops only the weight rounding (2-term "
                        "split), 'high' is 3-pass fp32 emulation")
    parser.add_argument("--fast", action="store_true",
                        help="The measured-fast production training preset: "
                        "implies --bf16 --packed_d --packed_g (1024² b2 "
                        "step 0.518 -> 0.298 s, 1.74x; soak-validated on "
                        "full 256² and 1024² schedules — see "
                        "docs/TRAINING.md and benchmarks/RESULTS.md)")
    parser.add_argument("--r1_gamma", type=float, default=0.0,
                        help="R1 zero-centered gradient penalty on reals "
                        "(gamma/2 * E[||grad_x D||^2], the standard "
                        "progressive/style-GAN D regularizer). 0 disables. "
                        "Typical: 10. Applied lazily every --r1_every "
                        "optimizer steps with gamma pre-scaled by the "
                        "interval; the penalty's D pass runs on the XLA "
                        "path (its second-order grads are outside the "
                        "packed kernels' custom-VJP support).")
    parser.add_argument("--r1_every", type=int, default=16,
                        help="Lazy-R1 interval in optimizer steps")
    parser.add_argument("--mirror", action="store_true",
                        help="Horizontal-flip augmentation: each real image "
                        "in a batch is mirrored with probability 0.5 "
                        "(classic progressive-GAN x-flip; doubles the "
                        "effective dataset for free on symmetric domains)")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="Gradient accumulation: average N microbatches "
                        "of --batch_size under one optimizer update "
                        "(lax.scan — peak memory stays one microbatch). "
                        "Effective batch = N * batch_size; the use case is "
                        "HBM-bound resolutions (1024² fits batch 2). "
                        "Minibatch-stddev statistics are per-microbatch.")
    parser.add_argument("--checkpoint_minutes", type=float, default=10.0,
                        help="Also save the full train state mid-stage "
                        "whenever this many minutes have passed since the "
                        "last save (0 = stage-end saves only). --resume "
                        "restarts from the saved epoch instead of redoing "
                        "the whole stage — late stages run hours, and a "
                        "backend outage should cost minutes, not the stage. "
                        "The data-shuffle RNG stream restarts from --seed "
                        "on resume, so a resumed run may revisit early "
                        "permutations; latent noise is (stage,epoch,step)-"
                        "keyed and unaffected.")
    parser.add_argument("--data_placement", type=str, default="device",
                        choices=["device", "host"],
                        help="'device' (default) keeps the dataset resident "
                        "in HBM as uint8 and does per-stage downscaling + "
                        "per-step batch gather on-device — removing the "
                        "per-step host->device image upload, which dominates "
                        "epoch time on remote/tunneled devices (measured "
                        "~1.6 GB/epoch at 512² b16). 'host' is the classic "
                        "numpy pipeline. Falls back to host when the raw "
                        "dataset exceeds 4 GB or under --mesh (the DP path "
                        "shards host batches).")
    parser.add_argument("--mesh", type=str, default="",
                        help="Data-parallel training over a device mesh: "
                        "'auto' (all attached devices) or a device count. "
                        "Params/optimizer replicate, the batch shards, "
                        "gradients pmean over ICI; the packed Pallas "
                        "kernels run per-device under shard_map, so --fast "
                        "composes. Batch size must divide the device count. "
                        "Math matches single-device training on the same "
                        "global batch (parallel/dp_train.py), so "
                        "checkpoints/--resume interchange freely.")
    return parser


def _downscale(images: np.ndarray, factor: int) -> np.ndarray:
    """[N, R, R, 3] float -> average-pooled by ``factor``."""
    if factor == 1:
        return images
    n, r, _, c = images.shape
    return images.reshape(n, r // factor, factor, r // factor, factor, c).mean(
        axis=(2, 4)
    )


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.fast:
        args.bf16 = args.packed_d = args.packed_g = True
    if args.grow and not args.resume:
        # Silent-ignore would train the new resolution from scratch — the
        # expensive outcome the flag exists to prevent (ADVICE r4).
        print("Error: --grow requires --resume (it extends a saved run's "
              "train_state.msgpack to a higher resolution)")
        return 1

    import jax
    import jax.numpy as jnp

    if args.debug:
        jax.config.update("jax_debug_nans", True)

    from probgan_tpu.core.device import device_str, resolve_device
    from probgan_tpu.core.image_checkpoint import save_image_checkpoint
    from probgan_tpu.engine import train as train_engine
    from probgan_tpu.models import pro_gan

    device = resolve_device(args.device)
    print("Prot-B-GAN image training...")
    print(f"Device: {device_str(device)}")

    mesh = None
    if args.mesh:
        from probgan_tpu.parallel import resolve_mesh

        mesh = resolve_mesh(args.mesh)
    if mesh is not None:
        if args.batch_size % mesh.devices.size != 0:
            print(
                f"Error: --batch_size {args.batch_size} must be divisible "
                f"by the mesh's {mesh.devices.size} devices"
            )
            return 1
        print(
            f"Mesh: {mesh.devices.size} devices "
            f"{dict(mesh.shape)} — data-parallel training"
        )

    if args.synthetic > 0:
        raw = synthetic_images(args.synthetic, args.resolution, args.seed)
        print(f"  - Synthetic dataset: {len(raw)} images @ {args.resolution}²")
    else:
        if not args.data_root:
            print("Error: --data_root or --synthetic required")
            return 1
        raw = load_images(args.data_root)
        print(f"  - Dataset: {len(raw)} images {raw.shape[1:]} from {args.data_root}")
        if raw.shape[1] != args.resolution:
            raise ValueError(
                f"images are {raw.shape[1]}², --resolution is {args.resolution}"
            )

    # Device-resident data: one uint8 upload, per-stage downscale and
    # per-step gather stay in HBM (the host pipeline re-uploads every batch,
    # which dominates epoch time over a tunneled device link).
    dev_raw = None
    if (args.data_placement == "device" and mesh is None
            and raw.nbytes <= 4 * 1024**3):
        dev_raw = jax.device_put(jnp.asarray(raw), device)
    elif args.data_placement == "device":
        print("  - data_placement=device unavailable "
              f"({'mesh training' if mesh is not None else 'dataset > 4 GB'})"
              "; using the host pipeline")

    # [-1, 1] float once; per-stage downscaled views are built lazily.
    real_full = None if dev_raw is not None else raw.astype(np.float32) / 127.5 - 1.0

    config = pro_gan.ProGANConfig(
        resolution=args.resolution,
        latent_dim=args.latent_dim,
        fmap_base=args.fmap_base,
        fmap_max=args.fmap_max,
    )
    from probgan_tpu.core.train_state import load_train_state, save_train_state

    def _dealias(tree):
        # The fused device step donates the train state, and donation
        # rejects one buffer appearing twice in a call — which happens
        # whenever g_ema aliases g_params (fresh init, and pre-EMA resumes
        # via alias_missing). Copy repeated leaf objects BEFORE device_put:
        # afterwards the aliased leaves become distinct Array objects over
        # one buffer and no backend-portable way to detect that exists.
        seen: set[int] = set()

        def f(x):
            if id(x) in seen:
                return np.array(x, copy=True)
            seen.add(id(x))
            return x

        return jax.tree.map(f, tree)

    with jax.default_device(jax.devices("cpu")[0]):
        state = train_engine.progan_init_state(jax.random.key(args.seed), config, args.lr)
    state = _dealias(state)
    if mesh is not None:
        from probgan_tpu.parallel.dp_train import replicate_state

        state = replicate_state(mesh, state)
    else:
        state = jax.device_put(state, device)

    os.makedirs(args.output_dir, exist_ok=True)
    ckpt_path = os.path.join(args.output_dir, "image_checkpoint.msgpack")
    train_state_path = os.path.join(args.output_dir, "train_state.msgpack")
    start_stage = 0
    start_epoch = 0
    history: dict[str, list] = {"d_loss": [], "g_loss": []}
    if args.resume:
        if not os.path.exists(train_state_path):
            # A missing state file must not silently become a from-scratch
            # run at the (higher) resolution (ADVICE r4).
            print(f"Error: --resume: no train state at {train_state_path}")
            return 1
        # alias_missing: pre-EMA train_state files seed g_ema from the saved
        # raw generator (core/train_state.py).
        state, meta = load_train_state(
            train_state_path, state, alias_missing={"g_ema": "g_params"},
            grow=args.grow,
        )
        state = _dealias(state)
        if mesh is not None:
            from probgan_tpu.parallel.dp_train import replicate_state

            state = replicate_state(mesh, state)
        else:
            state = jax.device_put(state, device)
        history = {k: list(v) for k, v in meta["history"].items()}
        # Pre-mid-stage-save files carry no "epoch" key: the save always
        # happened at a stage boundary, i.e. the stage is complete.
        done_epochs = int(meta.get("epoch", args.epochs_per_stage))
        if done_epochs < args.epochs_per_stage:
            start_stage = int(meta["stage"])
            start_epoch = done_epochs
            print(
                f"Resumed mid-stage {start_stage} "
                f"(next: epoch {start_epoch + 1}/{args.epochs_per_stage})"
            )
        else:
            start_stage = int(meta["stage"]) + 1
            print(f"Resumed after stage {meta['stage']} (next: stage {start_stage})")
    metrics_log = open(os.path.join(args.output_dir, "metrics.jsonl"), "a" if args.resume else "w")
    rng = np.random.RandomState(args.seed)

    # Fake rendering for the D step can use the packed inference kernels
    # (constant w.r.t. the differentiated params — engine/train.py).
    from probgan_tpu.engine.image import packed_default

    packed_fake = packed_default()

    accum = max(1, args.grad_accum)
    if accum > 1 and mesh is not None:
        print("Error: --grad_accum and --mesh are not composable yet; "
              "use a larger per-device batch on the mesh instead")
        return 1
    n = len(raw)
    consume = args.batch_size * accum
    if n < consume:
        # Erroring beats the silent alternative: with n < batch_size every
        # epoch would skip its only (short) batch and log losses of 0.0 as if
        # training had happened.
        print(
            f"Error: dataset has {n} images but each optimizer step needs "
            f"{consume} (--batch_size {args.batch_size} x --grad_accum "
            f"{accum}); reduce one of them"
        )
        return 1
    steps_per_epoch = max(1, n // consume)
    fade_epochs = max(1, args.epochs_per_stage // 2)
    # Global optimizer-step counter (lazy-R1 cadence); on resume, rebuilt
    # from the resumed position so the R1 interval phase is preserved.
    opt_steps = (start_stage * args.epochs_per_stage + start_epoch) * steps_per_epoch
    last_save = time.time()

    import functools

    # Fused device step: batch assembly (uint8 gather -> normalize ->
    # downscale -> flip) lives INSIDE the train-step program. A separate
    # assembly program hands the step an XLA-chosen input layout, which at
    # 512² costs >1.4 GB of layout-copy temps (measured: the split-program
    # stage-7 step needs 17.2 G HBM vs the 15.75 G chip); fusing keeps one
    # dispatch per step and lets the old iterate's state buffers be donated.
    # Downscale-then-flip equals flip-then-downscale exactly (2x2 mean
    # pooling blocks are contiguous and order-invariant), so parity with
    # the host pipeline is preserved.
    @functools.partial(
        jax.jit,
        static_argnames=("factor", "mirror", "accum", "config", "stage",
                         "lr", "dtype", "ema_beta", "packed_fake",
                         "packed_d", "packed_g", "packed_train_mode",
                         "r1_gamma"),
        donate_argnums=(0,),
    )
    def _fused_device_step(state, raw_u8, idx, flip, z, alpha, factor,
                           mirror, accum, config, stage, lr, **step_kwargs):
        x = raw_u8[idx].astype(jnp.float32) / 127.5 - 1.0
        if factor > 1:
            nn, r, _, c = x.shape
            x = x.reshape(
                nn, r // factor, factor, r // factor, factor, c
            ).mean(axis=(2, 4))
        if mirror:
            x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
        if accum > 1:
            return train_engine.progan_train_step_accum(
                state, x.reshape(accum, -1, *x.shape[1:]),
                z.reshape(accum, -1, z.shape[-1]), alpha, config, stage, lr,
                **step_kwargs,
            )
        return train_engine.progan_train_step(
            state, x, z, alpha, config, stage, lr, **step_kwargs,
        )

    no_flip = (jnp.zeros(consume, jnp.bool_) if dev_raw is not None
               else None)

    for stage in range(start_stage, config.num_stages):
        res = pro_gan.stage_resolution(stage)
        if dev_raw is None:
            reals = _downscale(real_full, args.resolution // res)
        print(f"Stage {stage} ({res}²): {args.epochs_per_stage} epochs")
        first_epoch = start_epoch if stage == start_stage else 0
        for epoch in range(first_epoch, args.epochs_per_stage):
            # alpha ramps 0 -> 1 over the stage's first half (fade-in), then 1.
            alpha = 1.0 if stage == 0 else min(1.0, (epoch + 1) / fade_epochs)
            t0 = time.time()
            d_sum = jnp.float32(0.0)  # device-side accumulation: see train.py
            g_sum = jnp.float32(0.0)
            perm = rng.permutation(n)
            for step in range(steps_per_epoch):
                idx = perm[step * consume : (step + 1) * consume]
                if len(idx) < consume:
                    break
                if dev_raw is not None:
                    # Batch assembly happens inside _fused_device_step; the
                    # only per-step host->device bytes are indices + flips.
                    batch = None
                    flip_mask = (jnp.asarray(rng.rand(len(idx)) < 0.5)
                                 if args.mirror else no_flip)
                else:
                    batch_np = reals[idx]
                    if args.mirror:
                        # host-side x-flip on the selected rows (cheap vs
                        # the step; keeps the jitted graph augmentation-free)
                        flip = rng.rand(len(idx)) < 0.5
                        batch_np = np.where(
                            flip[:, None, None, None],
                            batch_np[:, :, ::-1], batch_np,
                        )
                    batch = jnp.asarray(batch_np)
                zkey = jax.random.fold_in(
                    jax.random.key(args.seed + 1),
                    (stage * 1000 + epoch) * 100003 + step,
                )
                z = jax.random.normal(zkey, (consume, config.latent_dim))
                # Lazy R1: the penalty graph compiles once and runs every
                # r1_every-th step with gamma pre-scaled by the interval
                # (equivalent regularization strength, ~1/r1_every the cost).
                r1_now = (
                    args.r1_gamma * args.r1_every
                    if args.r1_gamma > 0 and opt_steps % args.r1_every == 0
                    else 0.0
                )
                opt_steps += 1
                step_kwargs = dict(
                    dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                    ema_beta=args.ema_beta,
                    packed_fake=packed_fake,
                    packed_d=args.packed_d,
                    packed_g=args.packed_g,
                    packed_train_mode=args.packed_mode,
                    r1_gamma=r1_now,
                )
                if dev_raw is not None:
                    state, metrics = _fused_device_step(
                        state, dev_raw, jnp.asarray(idx, jnp.int32),
                        flip_mask, z, jnp.float32(alpha),
                        args.resolution // res, args.mirror, accum,
                        config, stage, args.lr, **step_kwargs,
                    )
                elif mesh is not None:
                    from probgan_tpu.parallel.dp_train import (
                        dp_progan_train_step,
                    )

                    state, metrics = dp_progan_train_step(
                        mesh, state, batch, z, alpha, config, stage,
                        args.lr, **step_kwargs,
                    )
                elif accum > 1:
                    state, metrics = train_engine.progan_train_step_accum(
                        state,
                        batch.reshape(accum, args.batch_size, *batch.shape[1:]),
                        z.reshape(accum, args.batch_size, -1),
                        jnp.float32(alpha), config, stage, args.lr,
                        **step_kwargs,
                    )
                else:
                    state, metrics = train_engine.progan_train_step(
                        state, batch, z, jnp.float32(alpha), config, stage,
                        args.lr, **step_kwargs,
                    )
                d_sum = d_sum + metrics["d_loss"]
                g_sum = g_sum + metrics["g_loss"]
                if args.verbose:
                    print(
                        f"  stage {stage} epoch {epoch + 1} step {step + 1}: "
                        f"d={float(metrics['d_loss']):.4f} "
                        f"g={float(metrics['g_loss']):.4f} alpha={alpha:.2f}"
                    )
            d_avg = float(d_sum) / steps_per_epoch
            g_avg = float(g_sum) / steps_per_epoch
            history["d_loss"].append(d_avg)
            history["g_loss"].append(g_avg)
            print(
                f"  stage {stage} epoch {epoch + 1}/{args.epochs_per_stage}: "
                f"d_loss={d_avg:.4f} g_loss={g_avg:.4f} alpha={alpha:.2f} "
                f"({time.time() - t0:.1f}s)"
            )
            metrics_log.write(json.dumps({
                "stage": stage, "epoch": epoch + 1, "alpha": alpha,
                "d_loss": d_avg, "g_loss": g_avg,
                "seconds": round(time.time() - t0, 2),
            }) + "\n")
            metrics_log.flush()
            mid_stage = epoch + 1 < args.epochs_per_stage
            if (args.checkpoint_minutes > 0 and mid_stage
                    and time.time() - last_save > args.checkpoint_minutes * 60):
                save_train_state(train_state_path, state, {
                    "stage": stage, "epoch": epoch + 1, "history": history,
                })
                last_save = time.time()
                if args.verbose:
                    print(f"  mid-stage train state saved (epoch {epoch + 1})")

        save_image_checkpoint(
            ckpt_path, config,
            jax.tree.map(np.asarray, state.g_params),
            jax.tree.map(np.asarray, state.d_params),
            training_history=history,
            g_ema=(
                jax.tree.map(np.asarray, state.g_ema)
                if args.ema_beta > 0 else None
            ),
        )
        save_train_state(train_state_path, state, {
            "stage": stage, "epoch": args.epochs_per_stage, "history": history,
        })
        last_save = time.time()
        if args.verbose:
            print(f"  checkpoint saved to {ckpt_path}")

    metrics_log.close()
    print("Training complete!")
    print(f"  - Checkpoint: {ckpt_path}")
    return 0
