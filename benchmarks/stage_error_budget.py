#!/usr/bin/env python3
"""Per-stage precision error budget for the fast serving grade (VERDICT r3 #3).

The fast grade's throughput gap to the all-default ceiling (172.6 vs
225 img/s at 1024², benchmarks/RESULTS.md) is the early XLA stages running
3-pass HIGH. This study answers: WHICH early stage's precision actually
moves end-to-end PSNR, so the grade can drop every stage that doesn't
matter to 1-pass DEFAULT and keep a minimal HIGH guard band.

Method: render the ENTIRE pipeline on the plain XLA path with a per-stage
precision assignment, where each stage (0 = base dense+conv, 1..S = blocks;
toRGB convs follow their stage) runs either "high" (on CPU: exact fp32 — a
faithful stand-in for TPU 3-pass HIGH, whose 2^-21 error is invisible next
to bf16's 2^-8) or "emulate_bf16" (both conv operands rounded to bf16, fp32
accumulation — the TPU MXU's 1-pass DEFAULT arithmetic, see
models/pro_gan._maybe_emulate_bf16). PSNR is measured on uint8 output vs
the all-fp32 reference. The packed Pallas kernels' "default" mode is the
same 1-pass bf16 arithmetic class, so a stage's sensitivity measured here
transfers to the production mix (the TPU-side packed_psnr.py sweep is the
end-to-end confirmation).

Variants, with the late stages (>= s0) always emulated (they are packed
"default" in the fast grade):
  fast-today   early all-high                 (the current fast grade)
  all-default  early all-emulated             (measured ~48 dB on TPU)
  guard>=k     stages k..s0-1 high, rest emulated, k = 1..s0-1
  solo-k       only stage k high
  loo-k        early all-high except stage k  (per-stage sensitivity)

Usage: python benchmarks/stage_error_budget.py [--res 1024] [--batch 2]
         [--seeds 7,11] [--alphas 1.0,0.5] [--scan guard,loo,solo]
CPU-runnable (that is the point); on TPU the emulated dots also reproduce
DEFAULT's arithmetic, so numbers agree across backends up to HIGH-vs-fp32.
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
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--seeds", default="7,11")
    parser.add_argument("--alphas", default="1.0,0.5")
    parser.add_argument("--scan", default="guard,loo,solo")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from probgan_tpu.models import pro_gan

    cfg = pro_gan.ProGANConfig(resolution=args.res)
    stage = cfg.num_stages - 1
    s0 = pro_gan.packed_start_stage(cfg, stage)
    assert s0 is not None, "config has no packed segment; nothing to study"
    seeds = [int(s) for s in args.seeds.split(",")]
    alphas = [float(a) for a in args.alphas.split(",")]
    scans = args.scan.split(",")

    HIGH, EMU = "high", "emulate_bf16"

    def render_fn(precs: tuple):
        """Full-XLA render with per-stage precision ``precs[0..stage]``;
        the final-stage toRGB pair + blend follow precs[stage]."""

        def fwd(params, z, alpha):
            x = pro_gan._g_base(params, z, cfg, jnp.float32, precs[0])
            prev = None
            for s in range(1, stage + 1):
                prev = x
                x = pro_gan._g_block(params["blocks"][s - 1], x, precs[s])
            rgb = pro_gan.eq_conv(params["to_rgb"][stage], x, gain=1.0,
                                  precision=precs[stage])
            rgb_prev = pro_gan.upsample_nearest_2x(
                pro_gan.eq_conv(params["to_rgb"][stage - 1], prev, gain=1.0,
                                precision=precs[stage])
            )
            a = jnp.asarray(alpha, rgb.dtype)
            return pro_gan.to_uint8(rgb_prev + a * (rgb - rgb_prev))

        return jax.jit(fwd)

    late = tuple(EMU for _ in range(s0, stage + 1))

    variants: dict[str, tuple] = {}
    variants["fast-today"] = tuple(HIGH for _ in range(s0)) + late
    variants["all-default"] = tuple(EMU for _ in range(s0)) + late
    if "guard" in scans:
        for k in range(1, s0):
            variants[f"guard>={k}"] = (
                tuple(EMU for _ in range(k))
                + tuple(HIGH for _ in range(k, s0)) + late
            )
    if "lowguard" in scans:
        # Keep the CHEAP early stages (low FLOPs: base..k-1) at HIGH and
        # drop the expensive tail of the XLA segment to DEFAULT — at 1024²
        # stages 4..6 are ~20% of default-pass FLOPs each while 0..3 are
        # < 5% combined, so this is the throughput-relevant direction.
        for k in range(1, s0):
            variants[f"lowguard<{k}"] = (
                tuple(HIGH for _ in range(k))
                + tuple(EMU for _ in range(k, s0)) + late
            )
    if "solo" in scans:
        for k in range(s0):
            variants[f"solo-{k}"] = tuple(
                HIGH if s == k else EMU for s in range(s0)
            ) + late
    if "loo" in scans:
        for k in range(s0):
            variants[f"loo-{k}"] = tuple(
                EMU if s == k else HIGH for s in range(s0)
            ) + late

    ref_fn = render_fn(tuple("highest" for _ in range(stage + 1)))
    fns = {name: render_fn(p) for name, p in variants.items()}

    rows: dict[str, list[float]] = {n: [] for n in variants}
    cells = []
    for seed in seeds:
        params = pro_gan.init_generator(jax.random.key(seed), cfg)
        z = jax.random.normal(jax.random.key(seed + 1),
                              (args.batch, cfg.latent_dim), jnp.float32)
        for alpha in alphas:
            t0 = time.perf_counter()
            ref = np.asarray(ref_fn(params, z, alpha)).astype(np.float64)
            log(f"seed={seed} a={alpha}: ref {time.perf_counter()-t0:.1f}s")
            cell = {"seed": seed, "alpha": alpha}
            for name, fn in fns.items():
                img = np.asarray(fn(params, z, alpha)).astype(np.float64)
                mse = float(np.mean((img - ref) ** 2))
                psnr = float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)
                cell[name] = round(psnr, 1)
                rows[name].append(psnr)
                log(f"  {name}: {cell[name]} dB")
            cells.append(cell)

    summary = {
        name: {
            "min": round(min(v), 1),
            "mean": round(float(np.mean(v)), 1),
            "precs": "".join("H" if p == HIGH else
                             ("6" if p == "highest" else "d")
                             for p in variants[name]),
        }
        for name, v in rows.items()
    }
    print(json.dumps({
        "metric": f"stage_error_budget_{args.res}",
        "unit": "dB_uint8_vs_fp32",
        "s0": s0,
        "summary": summary,
        "cells": cells,
    }), flush=True)


if __name__ == "__main__":
    main()
