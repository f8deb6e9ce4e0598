#!/usr/bin/env python3
"""PSNR of the packed Pallas generator path per kernel mode, with sweeps.

Renders the same latents through (a) the XLA NHWC path at parity-grade
precision ("high", the round-1 production path verified at 72.8 dB vs the
fp32 CPU torch reference) and (b) the packed late-stage Pallas path in each
kernel mode, and reports uint8 PSNR of (b) vs (a). Because (a) itself sits
at ~73 dB vs the CPU reference, a mode scoring >=70 dB here is at the same
parity grade end-to-end; the 50 dB north-star bar (BASELINE.json) leaves a
wide margin.

Sweeps (VERDICT r3 #2 — the fast grade's margin must rest on more than two
points): ``--seeds``, ``--batches`` and ``--alphas`` take comma lists; every
(seed, batch, alpha) cell re-inits the GENERATOR WEIGHTS from the seed (not
just the latents), so the sweep covers weight-distribution variation. The
JSON line reports min/mean/max per mode over all cells plus the per-cell
table. Compile note: each distinct batch size is one compile per mode; seeds
and alphas reuse the jit cache (alpha is traced).

Usage: python benchmarks/packed_psnr.py [--res 1024] [--batches 1,2,8]
       [--seeds 7] [--alphas 1.0] [--modes highest,high,mid,default]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=1024)
    parser.add_argument("--batches", default=None,
                        help="comma list of batch sizes (default: --batch)")
    parser.add_argument("--batch", type=int, default=2,
                        help="single batch size (legacy; ignored if --batches)")
    parser.add_argument("--modes", default="highest,exact6,high,mid,default")
    parser.add_argument("--seeds", default=None,
                        help="comma list of weight seeds (default: --seed)")
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--alphas", default="1.0",
                        help="comma list of blend alphas")
    args = parser.parse_args()

    batches = ([int(b) for b in args.batches.split(",")]
               if args.batches else [args.batch])
    seeds = ([int(s) for s in args.seeds.split(",")]
             if args.seeds else [args.seed])
    alphas = [float(a) for a in args.alphas.split(",")]
    modes = args.modes.split(",")

    import jax
    import jax.numpy as jnp

    from probgan_tpu.models import pro_gan

    cfg = pro_gan.ProGANConfig(resolution=args.res)
    stage = cfg.num_stages - 1
    dev = jax.devices()[0]

    # One jitted render per (packed, mode) — batch is a shape change (new
    # compile per batch size), alpha/params are traced.
    def make_render(packed: bool, mode_override: str | None):
        saved = dict(pro_gan._PACKED_MODES)
        if mode_override is not None:
            for key in list(pro_gan._PACKED_MODES):
                pro_gan._PACKED_MODES[key] = mode_override
        try:
            # Trace-time capture: _PACKED_MODES is read when the jit traces,
            # so each mode needs its own jit wrapper object.
            fn = jax.jit(
                lambda p, zz, a: pro_gan.generator_apply(
                    p, zz, cfg, stage, a, jnp.float32, "high", packed=packed
                )
            )

            def render(params, z, alpha):
                s = dict(pro_gan._PACKED_MODES)
                if mode_override is not None:
                    for key in list(pro_gan._PACKED_MODES):
                        pro_gan._PACKED_MODES[key] = mode_override
                try:
                    return np.asarray(fn(params, z, jnp.float32(alpha)))
                finally:
                    pro_gan._PACKED_MODES.clear()
                    pro_gan._PACKED_MODES.update(s)

            return render
        finally:
            pro_gan._PACKED_MODES.clear()
            pro_gan._PACKED_MODES.update(saved)

    render_ref = make_render(False, None)
    render_mode = {m: make_render(True, m) for m in modes}

    cells = []
    stats: dict[str, list[float]] = {m: [] for m in modes}
    for seed in seeds:
        with jax.default_device(jax.devices("cpu")[0]):
            params = pro_gan.init_generator(jax.random.key(seed), cfg)
        params = jax.device_put(params, dev)
        for batch in batches:
            z = jax.device_put(
                jax.random.normal(
                    jax.random.key(seed + 1), (batch, cfg.latent_dim),
                    jnp.float32,
                ),
                dev,
            )
            for alpha in alphas:
                t0 = time.perf_counter()
                ref = render_ref(params, z, alpha).astype(np.float64)
                log(f"seed={seed} b={batch} a={alpha}: ref "
                    f"{time.perf_counter() - t0:.1f}s")
                cell = {"seed": seed, "batch": batch, "alpha": alpha}
                for m in modes:
                    t0 = time.perf_counter()
                    img = render_mode[m](params, z, alpha).astype(np.float64)
                    mse = float(np.mean((img - ref) ** 2))
                    psnr = (float("inf") if mse == 0
                            else 10 * np.log10(255.0**2 / mse))
                    cell[m] = "identical" if mse == 0 else round(psnr, 1)
                    if mse != 0:
                        stats[m].append(psnr)
                    log(f"  mode={m}: {cell[m]} dB "
                        f"({time.perf_counter() - t0:.1f}s)")
                cells.append(cell)

    summary = {}
    for m in modes:
        vals = stats[m]
        summary[m] = (
            "identical"
            if not vals
            else {
                "min": round(min(vals), 1),
                "mean": round(float(np.mean(vals)), 1),
                "max": round(max(vals), 1),
                "n": len(vals),
            }
        )

    print(json.dumps({
        "metric": f"packed_mode_psnr_vs_xla_high_{args.res}",
        "unit": "dB_uint8",
        "summary": summary,
        "cells": cells,
    }), flush=True)


if __name__ == "__main__":
    main()
