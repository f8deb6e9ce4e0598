#!/usr/bin/env python3
"""The five BASELINE.json benchmark configs, as a runnable harness.

    1. 64²   single image, fixed-seed latent, batch 1 (CPU-reference parity
             config — also computes PSNR vs the torch fp32 reference)
    2. 128²  generation, batch-32 latent grid sweep
    3. 256²  progressive stage alpha fade-in (toRGB blend path; one compiled
             graph serves the whole alpha sweep)
    4. 512²  latent-interpolation sequence, 64 frames (z-walk)
    5. 1024² full stack + discriminator scoring + one G/D training step

Usage:
    python benchmarks/run_configs.py [--configs 1,2,3] [--seconds 5]

Prints one JSON line per config:
    {"config": N, "name": ..., "value": ..., "unit": ..., ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Allow `python benchmarks/run_configs.py` from the repo root (the script's
# own dir shadows the cwd on sys.path).
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

SEED = 7


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _sync(x):
    """Hard device sync: fetch a device-computed checksum scalar.
    (block_until_ready can return early through relayed device transports.)"""
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def _timed(fn, seconds: float, units_per_call: int):
    """Run fn repeatedly for ~seconds; returns (units/sec, p50 sec/call)."""
    fn()  # warmup (post-compile)
    lat, n = [], 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        t1 = time.perf_counter()
        fn()
        lat.append(time.perf_counter() - t1)
        n += units_per_call
    return n / (time.perf_counter() - t0), float(np.percentile(lat, 50))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", type=str, default="1,2,3,4,5")
    parser.add_argument("--seconds", type=float, default=5.0)
    parser.add_argument("--train_batch", type=int, default=2,
                        help="batch for config 5's train-step timings "
                        "(2 = the BASELINE shape)")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--precision", type=str, default="high",
                        choices=["default", "fast", "high", "highest"],
                        help="MXU precision; 'high' is the parity-grade "
                             "setting; 'fast' is the cheapest grade above "
                             "the 50 dB bar (packed 1-pass bf16 late stages "
                             "under HIGH early stages)")
    args = parser.parse_args()
    which = {int(c) for c in args.configs.split(",")}

    import jax
    import jax.numpy as jnp

    from probgan_tpu.engine import train as train_engine
    from probgan_tpu.engine.image import (generate_fn, latent_walk_fn,
                                          packed_default, score_fn)
    from probgan_tpu.models import pro_gan

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    precision = args.precision
    use_pallas = os.environ.get("PROBGAN_PALLAS_UINT8", "0") == "1"
    # The production serving path: phase-blocked packed Pallas kernels for
    # eligible stages (same gate the engine uses).
    use_pallas_packed = packed_default() and dtype == jnp.float32
    rng = np.random.RandomState(SEED)
    results = []

    def emit(payload):
        results.append(payload)
        print(json.dumps(payload), flush=True)

    def make(res):
        cfg = pro_gan.ProGANConfig(resolution=res)
        # Init on CPU (eager per-weight init on the accelerator costs one
        # remote compile per weight shape), then move the finished pytree.
        with jax.default_device(jax.devices("cpu")[0]):
            params = pro_gan.init_generator(jax.random.key(SEED), cfg)
        params = jax.device_put(params, jax.devices()[0])
        return cfg, cfg.num_stages - 1, params

    if 1 in which:
        # 64² fixed-seed single image + PSNR parity vs torch CPU reference.
        cfg, stage, params = make(64)
        z = jnp.asarray(rng.standard_normal((1, cfg.latent_dim)), jnp.float32)
        img = np.asarray(
            generate_fn(
                params, z, jnp.float32(1.0), cfg, stage, dtype, use_pallas,
                precision, use_pallas_packed,
            )
        )
        ips, p50 = _timed(
            lambda: _sync(generate_fn(
                params, z, jnp.float32(1.0), cfg, stage, dtype, use_pallas,
                precision, use_pallas_packed,
            )),
            args.seconds,
            1,
        )
        psnr = None
        try:
            import torch

            from benchmarks import torch_reference as tref

            ref = tref.generator_uint8(
                tref.convert_params(params),
                torch.from_numpy(np.asarray(z)),
                cfg.nf(0),
                stage,
            )
            mse = np.mean((img.astype(np.float64) - ref.astype(np.float64)) ** 2)
            psnr = float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)
        except Exception as e:  # noqa: BLE001
            log(f"psnr check skipped: {e}")
        emit({
            "config": 1, "name": "64x64_single_fixed_seed_b1",
            "value": round(ips, 3), "unit": "images/sec",
            "p50_ms": round(1000 * p50, 3),
            "psnr_vs_cpu_reference_db": None if psnr is None else round(psnr, 1),
        })

    if 2 in which:
        cfg, stage, params = make(128)
        z = jnp.asarray(rng.standard_normal((32, cfg.latent_dim)), jnp.float32)
        ips, p50 = _timed(
            lambda: _sync(generate_fn(
                params, z, jnp.float32(1.0), cfg, stage, dtype, use_pallas,
                precision, use_pallas_packed,
            )),
            args.seconds,
            32,
        )
        emit({
            "config": 2, "name": "128x128_batch32_grid_sweep",
            "value": round(ips, 3), "unit": "images/sec",
            "p50_ms_per_batch": round(1000 * p50, 3),
        })

    if 3 in which:
        # 256² fade-in: alpha is traced — the sweep reuses ONE compiled graph.
        cfg, stage, params = make(256)
        z = jnp.asarray(rng.standard_normal((8, cfg.latent_dim)), jnp.float32)
        import itertools

        alphas = np.linspace(0.0, 1.0, 11, dtype=np.float32)
        ai = itertools.cycle(alphas)

        def step():
            _sync(generate_fn(
                params, z, jnp.float32(next(ai)), cfg, stage, dtype, use_pallas,
                precision, use_pallas_packed,
            ))

        ips, p50 = _timed(step, args.seconds, 8)
        emit({
            "config": 3, "name": "256x256_alpha_fade_in_blend",
            "value": round(ips, 3), "unit": "images/sec",
            "p50_ms_per_batch": round(1000 * p50, 3),
            "alphas_per_compiled_graph": len(alphas),
        })

    if 4 in which:
        cfg, stage, params = make(512)
        z0 = jnp.asarray(rng.standard_normal(cfg.latent_dim), jnp.float32)
        z1 = jnp.asarray(rng.standard_normal(cfg.latent_dim), jnp.float32)
        ips, p50 = _timed(
            lambda: _sync(latent_walk_fn(
                params, z0, z1, jnp.float32(1.0), cfg, stage, 64, dtype, use_pallas,
                precision, 8, use_pallas_packed,
            )),
            args.seconds,
            64,
        )
        emit({
            "config": 4, "name": "512x512_z_walk_64_frames",
            "value": round(ips, 3), "unit": "frames/sec",
            "p50_ms_per_walk": round(1000 * p50, 3),
        })

    if 5 in which:
        cfg, stage, params = make(1024)
        with jax.default_device(jax.devices("cpu")[0]):
            d_params = pro_gan.init_discriminator(jax.random.key(SEED + 1), cfg)
        d_params = jax.device_put(d_params, jax.devices()[0])
        z = jnp.asarray(rng.standard_normal((2, cfg.latent_dim)), jnp.float32)

        gen_ips, _ = _timed(
            lambda: _sync(generate_fn(
                params, z, jnp.float32(1.0), cfg, stage, dtype, use_pallas,
                precision, use_pallas_packed,
            )),
            args.seconds,
            2,
        )
        imgs = (
            np.asarray(
                generate_fn(
                    params, z, jnp.float32(1.0), cfg, stage, dtype, use_pallas,
                    precision, use_pallas_packed,
                )
            ).astype(np.float32)
            / 127.5
            - 1.0
        )
        imgs = jnp.asarray(imgs)
        score_ips, _ = _timed(
            lambda: _sync(score_fn(
                d_params, imgs, jnp.float32(1.0), cfg, stage, dtype, precision,
                use_pallas_packed,
            )),
            args.seconds,
            2,
        )
        # --train_batch: the train-step measurements' batch (the serving
        # configs above stay at the BASELINE shapes). b2 is the BASELINE
        # config-5 shape; larger batches amortize per-step overhead and are
        # the realistic training configuration.
        tb = args.train_batch
        reps = -(-tb // imgs.shape[0])
        imgs_t = jnp.tile(imgs, (reps, 1, 1, 1))[:tb]
        z_t = jnp.asarray(
            rng.standard_normal((tb, cfg.latent_dim)), jnp.float32
        )

        def time_train(step_dtype, packed_d=False, packed_g=False,
                       mode="default"):
            """(first-call s, steady min s, final d_loss) at step_dtype."""
            with jax.default_device(jax.devices("cpu")[0]):
                state = train_engine.progan_init_state(
                    jax.random.key(SEED + 2), cfg
                )
            state = jax.device_put(state, jax.devices()[0])
            t0 = time.perf_counter()
            state, metrics = train_engine.progan_train_step(
                state, imgs_t, z_t, jnp.float32(1.0), cfg, stage, 1e-3,
                step_dtype, packed_fake=use_pallas_packed, packed_d=packed_d,
                packed_g=packed_g, packed_train_mode=mode,
            )
            float(metrics["d_loss"])  # hard sync
            first_s = time.perf_counter() - t0
            # steady-state step cost (the number that matters for a
            # training run; the first call above is compile-dominated)
            steady = []
            for _ in range(5):
                t1 = time.perf_counter()
                state, metrics = train_engine.progan_train_step(
                    state, imgs_t, z_t, jnp.float32(1.0), cfg, stage, 1e-3,
                    step_dtype, packed_fake=use_pallas_packed,
                    packed_d=packed_d, packed_g=packed_g,
                    packed_train_mode=mode,
                )
                float(metrics["d_loss"])
                steady.append(time.perf_counter() - t1)
            return first_s, min(steady), float(metrics["d_loss"])

        train_s, steady_s, d_loss = time_train(dtype)
        # The mixed-precision step (--bf16 in the trainer): bf16 convs on
        # the MXU, fp32 params/loss/EMA. Measured alongside fp32 so the
        # speedup is one run's apples-to-apples.
        _, steady_bf16_s, _ = time_train(jnp.bfloat16)
        # --packed_d: the late-stage D fwd+bwd on the phase-blocked Pallas
        # kernels (custom VJPs) on top of the bf16 step.
        _, steady_pkd_s, _ = time_train(jnp.bfloat16, packed_d=True)
        # --packed_g on top: the generator's late-stage convs too.
        _, steady_pkdg_s, _ = time_train(jnp.bfloat16, packed_d=True,
                                         packed_g=True)
        # --packed_mode mid: the 2-term split grade (weight-rounding error
        # removed; ~1.5 MXU passes per dot) on the same packed_dg step —
        # the cost of one grade up from the 1-pass "default" train grade.
        _, steady_pkdg_mid_s, _ = time_train(jnp.bfloat16, packed_d=True,
                                             packed_g=True, mode="mid")
        emit({
            "config": 5, "name": "1024x1024_full_stack",
            "value": round(gen_ips, 3), "unit": "images/sec",
            "disc_scores_per_sec": round(score_ips, 3),
            "train_step_first_call_s": round(train_s, 2),
            "train_step_steady_s": round(steady_s, 3),
            "train_step_steady_bf16_s": round(steady_bf16_s, 3),
            "train_step_steady_bf16_packed_d_s": round(steady_pkd_s, 3),
            "train_step_steady_bf16_packed_dg_s": round(steady_pkdg_s, 3),
            "train_step_steady_bf16_packed_dg_mid_s": round(
                steady_pkdg_mid_s, 3),
            "train_batch": tb,
            "d_loss": round(d_loss, 4),
        })

    log(f"done: {len(results)} configs")


if __name__ == "__main__":
    main()
