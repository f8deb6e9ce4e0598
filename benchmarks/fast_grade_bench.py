#!/usr/bin/env python3
"""Fast-grade candidate mixes: on-chip PSNR + throughput per variant.

Closes VERDICT r3 #3: the fast serving grade (early XLA stages at 3-pass
HIGH + packed late stages at 1-pass "default") measures 172.6 img/s while
the all-default pipeline measures ~225 img/s — the gap is early-stage
precision. This bench renders each candidate mix ON CHIP (real MXU
arithmetic, no emulation), reports uint8 PSNR vs the XLA parity path
("high", the 73 dB anchor every prior PSNR number is quoted against), and
slope-times the full forward (benchmarks/_timing.py methodology), so the
cheapest mix clearing the 50 dB bar can be read off one table.

Variant grammar (--variants comma list):
  fast        early all-HIGH, packed s0 at "default"   (the grade today)
  alldef      early all-DEFAULT, packed "default"      (the 225 img/s ceiling)
  guardK      early stages < K DEFAULT, K..s0-1 HIGH   (K = 1..s0-1)
  s6fast      like fast but packed segment starts at stage 6 (nf=128 —
              re-measures the round-2 packed-gate boundary in 1-pass mode,
              where the fp32-grade measurement that excluded stage 6 does
              not bind)
  s6guardK    guardK with the packed segment starting at stage 6
  midlate     early all-DEFAULT, packed late stages at "mid" (2-term split:
              weight-rounding only — can 1.5-pass late stages buy back the
              dB the early DEFAULT stages spend?)
  bf16early   early stages in bf16 DTYPE (halved activation bandwidth for
              the launch/bandwidth-bound small stages) at DEFAULT precision,
              cast to fp32 at the packed entry
  finalmid    like fast but ONLY the final packed stage runs kernel mode
              "mid" (per-stage mix "default+mid"): the error budget is
              ~uniform per stage, so one mid stage buys ~+1 dB worst-case
              for about half of all-mid's 19% cost (VERDICT r4 #2)
  fm:NAME     prefix form of the same mix for any variant NAME

CPU-study priors (benchmarks/stage_error_budget.py, 512², 2 seeds x 2
alphas): per-stage bf16 error contributions are UNIFORM (~1.5e-6 rel MSE
per dropped stage; every solo/loo within 0.3 dB of each other), so the mix
choice is a pure time question — drop the stages with the largest
HIGH-DEFAULT time delta. Predicted dB for dropping k early stages:
k=1 -> ~52.8 mean, k=2 -> ~51.7, k=3 -> ~50.9, k=7 (all) -> ~48.4.

Sweep mode (--seeds/--batches/--alphas comma lists): PSNR-only (timing is
the single-cell ladder's job), every (seed, batch, alpha) cell re-inits the
generator WEIGHTS from the seed — the same protocol as packed_psnr.py's
sweep — and the JSON reports min/mean/max per variant over all cells. This
is the margin evidence a serving-grade flip rests on: the ladder's one-cell
PSNR says which mix is cheapest; the sweep says whether its margin over the
50 dB bar survives weight/batch/alpha variation.

Usage: python benchmarks/fast_grade_bench.py [--res 1024] [--batch 8]
         [--variants fast,alldef,guard4,guard5,s6fast,midlate] [--seed 7]
       python benchmarks/fast_grade_bench.py --variants fast,s6fast \
         --seeds 7,11,23 --batches 1,8 --alphas 0.3,1.0   # sweep mode
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--chains", type=int, default=4)
    parser.add_argument(
        "--variants",
        default="fast,alldef,guard3,guard4,guard5,guard6,s6fast,s6guard5,midlate",
    )
    parser.add_argument("--skip_time", action="store_true",
                        help="PSNR only (quick)")
    parser.add_argument("--seeds", default=None,
                        help="comma list of weight seeds -> sweep mode")
    parser.add_argument("--batches", default=None,
                        help="comma list of batch sizes (sweep mode)")
    parser.add_argument("--alphas", default=None,
                        help="comma list of blend alphas (sweep mode)")
    parser.add_argument("--fmap_base", type=int, default=8192,
                        help="shrink with --fmap_max for CPU smoke tests")
    parser.add_argument("--fmap_max", type=int, default=512)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks._timing import slope_timed_ms
    from probgan_tpu.models import pro_gan

    cfg = pro_gan.ProGANConfig(resolution=args.res, fmap_base=args.fmap_base,
                               fmap_max=args.fmap_max)
    stage = cfg.num_stages - 1
    s0_gate = pro_gan.packed_start_stage(cfg, stage)
    assert s0_gate is not None

    def spec(name: str):
        """-> (early_precs dict over stages 0..s0-1, s0, late_mode).

        Optional prefixes compose: "mid:" runs the packed late stages in
        kernel mode "mid" (2-term split, ~+2 dB floor at ~2x the late-stage
        MXU passes), "s6" starts the packed segment at stage 6."""
        late_mode = "default"
        if name.startswith("mid:"):
            late_mode = "mid"
            name = name[4:]
        if name.startswith("fm:"):
            # per-stage mix: non-final packed stages "default", FINAL stage
            # "mid" — the half-cost margin candidate (VERDICT r4 #2)
            late_mode = "default+mid"
            name = name[3:]
        if name == "finalmid":
            name, late_mode = "fast", "default+mid"
        s0 = s0_gate
        if name.startswith("s6"):
            s0 = 6
            name = name[2:]
        if name == "midlate":
            name, late_mode = "alldef", "mid"
        if name == "bf16early":
            return {s: "bf16" for s in range(s0)}, s0, late_mode
        if name == "fast":
            early = {s: "high" for s in range(s0)}
        elif name == "alldef":
            early = {s: None for s in range(s0)}
        elif m := re.fullmatch(r"guard(\d+)", name):
            k = int(m.group(1))
            early = {s: ("high" if s >= k else None) for s in range(s0)}
        elif m := re.fullmatch(r"lowguard(\d+)", name):
            # stages < K at HIGH (cheap, low-FLOP), >= K at DEFAULT
            k = int(m.group(1))
            early = {s: ("high" if s < k else None) for s in range(s0)}
        else:
            raise AssertionError(f"unknown variant {name}")
        return early, s0, late_mode

    # _g_late_packed maps precision -> kernel mode via _PACKED_MODES; a raw
    # mode string is not a ladder key, so patch the whole ladder to the
    # variant's mode INSIDE the traced body (trace-time capture — survives
    # re-traces under slope_timed_ms's outer jit) and restore after.
    saved_modes = dict(pro_gan._PACKED_MODES)

    def make_render_mode(early, s0, late_mode):
        def fwd(params, z, alpha):
            for k in list(pro_gan._PACKED_MODES):
                pro_gan._PACKED_MODES[k] = late_mode
            try:
                bf16_early = early[0] == "bf16"
                dt = jnp.bfloat16 if bf16_early else jnp.float32
                pr = {s: (None if p == "bf16" else p) for s, p in early.items()}
                x = pro_gan._g_base(params, z, cfg, dt, pr[0])
                for s in range(1, s0):
                    x = pro_gan._g_block(params["blocks"][s - 1], x, pr[s])
                return pro_gan._g_late_packed(
                    params, x, cfg, s0, stage, alpha, None,
                    emit="uint8",
                )
            finally:
                pro_gan._PACKED_MODES.clear()
                pro_gan._PACKED_MODES.update(saved_modes)
        return fwd

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    def init_on(seed, batch):
        with jax.default_device(cpu):
            params = pro_gan.init_generator(jax.random.key(seed), cfg)
        z = jax.random.normal(jax.random.key(seed + 1),
                              (batch, cfg.latent_dim), jnp.float32)
        return jax.device_put(params, dev), jax.device_put(z, dev)

    ref_fn = jax.jit(lambda p, zz, a: pro_gan.generator_apply(
        p, zz, cfg, stage, a, jnp.float32, "high", packed=False))

    def psnr_of(img, ref):
        mse = float(np.mean((img.astype(np.float64) - ref) ** 2))
        return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)

    variants = args.variants.split(",")

    if args.seeds or args.batches or args.alphas:
        # Sweep mode: PSNR only, weights re-initialized per seed.
        seeds = [int(s) for s in (args.seeds or str(args.seed)).split(",")]
        batch_list = [int(b) for b in
                      (args.batches or str(args.batch)).split(",")]
        alphas = [float(a) for a in (args.alphas or "1.0").split(",")]
        fwds = {}
        for name in variants:
            early, s0, late_mode = spec(name)
            fwds[name] = (jax.jit(make_render_mode(early, s0, late_mode)),
                          s0, late_mode)
        cells = {name: [] for name in variants}
        for batch in batch_list:  # batch outermost: one compile per (v, b)
            for seed in seeds:
                params, z = init_on(seed, batch)
                for alpha in alphas:
                    a = jnp.float32(alpha)
                    ref = np.asarray(ref_fn(params, z, a)).astype(np.float64)
                    for name in variants:
                        fwd, s0, late_mode = fwds[name]
                        db = psnr_of(np.asarray(fwd(params, z, a)), ref)
                        cells[name].append(
                            {"seed": seed, "batch": batch, "alpha": alpha,
                             "psnr_db": round(db, 1)})
                        log(f"s{seed} b{batch} a{alpha} {name}: {db:.1f} dB")
        rows = {}
        for name in variants:
            vals = [c["psnr_db"] for c in cells[name]]
            _, s0, late_mode = fwds[name]
            rows[name] = {
                "s0": s0, "late_mode": late_mode, "n": len(vals),
                "min_db": round(min(vals), 1),
                "mean_db": round(float(np.mean(vals)), 1),
                "max_db": round(max(vals), 1),
                "cells": cells[name],
            }
        print(json.dumps({
            "metric": f"fast_grade_sweep_{args.res}",
            "seeds": seeds, "batches": batch_list, "alphas": alphas,
            "psnr_ref": "xla_high (73 dB anchor vs fp32 CPU reference)",
            "variants": rows,
        }), flush=True)
        return

    params, z = init_on(args.seed, args.batch)
    a1 = jnp.float32(1.0)
    ref = np.asarray(ref_fn(params, z, a1)).astype(np.float64)
    log("reference (XLA high) rendered")

    rows = {}
    for name in variants:
        early, s0, late_mode = spec(name)
        fwd = jax.jit(make_render_mode(early, s0, late_mode))
        psnr = psnr_of(np.asarray(fwd(params, z, a1)), ref)
        row = {"psnr_db": round(psnr, 1), "s0": s0, "late_mode": late_mode}
        if not args.skip_time:
            def step(zc, fwd=fwd):
                out = fwd(params, zc, a1)
                return zc + (jnp.mean(out.astype(jnp.float32))
                             - 127.0) * 1e-6
            ms = slope_timed_ms(step, z, chains=args.chains)
            row["ms_per_fwd"] = round(ms, 2)
            row["img_per_sec"] = round(1000.0 * args.batch / ms, 1)
        rows[name] = row
        log(f"{name}: {row}")

    print(json.dumps({
        "metric": f"fast_grade_variants_{args.res}",
        "batch": args.batch,
        "psnr_ref": "xla_high (73 dB anchor vs fp32 CPU reference)",
        "variants": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
