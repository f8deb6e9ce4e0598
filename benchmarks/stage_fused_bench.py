#!/usr/bin/env python3
"""Stage-fused kernel (packed_upconv_conv) vs the two-kernel pair, per mode.

Times one full generator stage (upsample2x -> conv1+act+norm -> conv2+act+
norm) at the production stage-7 and stage-8 shapes, slope-timed over chained
scans (benchmarks/RESULTS.md round-2 methodology). The fusion eliminates the
conv1 feature tensor's HBM round-trip, so it should win exactly where the
kernels are bandwidth-bound ("default"/"high") and tie-or-lose where they
are MXU-pass-bound ("highest").

Usage: python benchmarks/stage_fused_bench.py [--batch 8] [--chains 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--chains", type=int, default=4)
    parser.add_argument("--modes", default="highest,high,default")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from probgan_tpu.ops import pallas_packed as pk

    dev = jax.devices()[0]
    rng = np.random.RandomState(0)

    # (name, cin, c1, c2, h_in, w_in, p_in) — production 1024² late stages
    # (stage6 is the XLA/packed boundary candidate: nf=128 wastes no NHWC
    # lanes, so XLA is at its best there — measured 8.4 ms at b8)
    shapes = [
        ("stage6_128to256", 256, 128, 128, 128, 128, 1),
        ("stage7_256to512", 128, 64, 64, 256, 256, 1),
        ("stage8_512to1024", 64, 32, 32, 512, 512, 2),
    ]

    from benchmarks._timing import slope_timed_ms

    def timed(fn, x0):
        # re-derive an input-shaped tensor so the loop can't hoist
        return slope_timed_ms(
            lambda x: x * (1.0 + 1e-12 * jnp.mean(fn(x))), x0,
            chains=args.chains,
        )

    for name, cin, c1, c2, h, w, p_in in shapes:
        x0 = jax.device_put(
            jnp.asarray(rng.standard_normal(
                (args.batch, cin, h, w)).astype(np.float32)), dev)
        w1 = jnp.asarray(rng.standard_normal((3, 3, cin, c1)).astype(np.float32) * 0.1)
        b1 = jnp.asarray(rng.standard_normal((c1,)).astype(np.float32))
        w2 = jnp.asarray(rng.standard_normal((3, 3, c1, c2)).astype(np.float32) * 0.1)
        b2 = jnp.asarray(rng.standard_normal((c2,)).astype(np.float32))
        # payload: read x + write out (the fused kernel's ideal traffic)
        payload_gb = 4 * args.batch * h * w * (cin + 4 * c2) / 1e9

        for mode in args.modes.split(","):
            def unfused(x, m=mode):
                f = pk.packed_upconv(x, w1, b1, p_in, mode=m)
                return pk.packed_conv(f, w2, b2, 2 * p_in, mode=m)

            def fused(x, m=mode):
                return pk.packed_upconv_conv(x, w1, b1, w2, b2, p_in, mode=m)

            def measure(fn):
                try:
                    return timed(fn, x0)
                except Exception as e:  # e.g. VMEM OOM at large shapes
                    print(f"  {name}/{mode}: {type(e).__name__}: "
                          f"{str(e)[:120]}", file=sys.stderr, flush=True)
                    return None

            ms_u = measure(unfused)
            ms_f = measure(fused)
            print(json.dumps({
                "shape": name, "mode": mode, "batch": args.batch,
                "ms_unfused": ms_u and round(ms_u, 2),
                "ms_fused": ms_f and round(ms_f, 2),
                "speedup": (ms_u and ms_f) and round(ms_u / ms_f, 3),
                "fused_payload_GBps":
                    ms_f and round(1000 * payload_gb / ms_f, 1),
            }), flush=True)

        # XLA reference chain on the same stage (NHWC, HIGHEST precision) —
        # the path the generator uses when the packed gate declines a stage.
        from probgan_tpu.models import pro_gan

        def xla_chain(x_nhwc):
            scale1 = 1.0  # weights here are synthetic; eq-LR scale folded in
            y = jax.lax.conv_general_dilated(
                pro_gan.upsample_nearest_2x(x_nhwc), w1, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            ) + b1
            y = pro_gan.pixel_norm(pro_gan.lrelu(y)) * scale1
            y = jax.lax.conv_general_dilated(
                y, w2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            ) + b2
            return pro_gan.pixel_norm(pro_gan.lrelu(y))

        x_nhwc = jnp.transpose(x0, (0, 2, 3, 1))  # packed P=1 -> NHWC
        try:
            ms_x = timed(xla_chain, x_nhwc)
            print(json.dumps({
                "shape": name, "mode": "xla_highest_nhwc",
                "batch": args.batch, "ms": round(ms_x, 2),
            }), flush=True)
        except Exception as e:
            print(f"  {name}/xla: {type(e).__name__}", file=sys.stderr)


if __name__ == "__main__":
    main()
