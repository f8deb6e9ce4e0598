#!/usr/bin/env python3
"""PSNR of the packed Pallas generator path per kernel mode, at full 1024².

Renders the same latents through (a) the XLA NHWC path at parity-grade
precision ("high", the round-1 production path verified at 72.8 dB vs the
fp32 CPU torch reference) and (b) the packed late-stage Pallas path in each
kernel mode, and reports uint8 PSNR of (b) vs (a). Because (a) itself sits
at ~73 dB vs the CPU reference, a mode scoring >=70 dB here is at the same
parity grade end-to-end; the 50 dB north-star bar (BASELINE.json) leaves a
wide margin.

Usage: python benchmarks/packed_psnr.py [--res 1024] [--batch 2]
       [--modes highest,exact6,high,default]
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
    parser.add_argument("--modes", default="highest,exact6,high,mid,default")
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from probgan_tpu.models import pro_gan

    cfg = pro_gan.ProGANConfig(resolution=args.res)
    stage = cfg.num_stages - 1
    with jax.default_device(jax.devices("cpu")[0]):
        params = pro_gan.init_generator(jax.random.key(args.seed), cfg)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    z = jax.device_put(
        jax.random.normal(
            jax.random.key(args.seed + 1), (args.batch, cfg.latent_dim),
            jnp.float32,
        ),
        dev,
    )

    def render(packed: bool, mode_override: str | None):
        # Temporarily remap the ladder so generator_rgb's packed path uses
        # the requested kernel mode (the ladder maps "high" -> one mode).
        saved = dict(pro_gan._PACKED_MODES)
        if mode_override is not None:
            for key in list(pro_gan._PACKED_MODES):
                pro_gan._PACKED_MODES[key] = mode_override
        try:
            fn = jax.jit(
                lambda p, zz: pro_gan.generator_apply(
                    p, zz, cfg, stage, 1.0, jnp.float32, "high", packed=packed
                )
            )
            t0 = time.perf_counter()
            out = np.asarray(fn(params, z))
            log(f"  render packed={packed} mode={mode_override}: "
                f"{time.perf_counter() - t0:.1f}s (incl compile)")
        finally:
            pro_gan._PACKED_MODES.clear()
            pro_gan._PACKED_MODES.update(saved)
        return out

    log("rendering XLA parity-grade reference...")
    ref = render(False, None).astype(np.float64)

    results = {}
    for mode in args.modes.split(","):
        log(f"rendering packed mode={mode}...")
        img = render(True, mode).astype(np.float64)
        mse = float(np.mean((img - ref) ** 2))
        # "identical" (not Infinity) keeps the output line valid JSON.
        results[mode] = (
            "identical" if mse == 0 else round(10 * np.log10(255.0**2 / mse), 1)
        )
        log(f"  PSNR vs XLA-high: {results[mode]} dB")

    print(json.dumps({
        "metric": f"packed_mode_psnr_vs_xla_high_{args.res}",
        "unit": "dB_uint8",
        "batch": args.batch,
        "psnr": results,
    }), flush=True)


if __name__ == "__main__":
    main()
