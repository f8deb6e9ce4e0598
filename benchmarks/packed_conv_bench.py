#!/usr/bin/env python3
"""Micro-benchmark: the phase-blocked packed Pallas conv block vs the XLA
NHWC chain at the generator's final-stage shape (the round-1 61%-of-forward
hotspot, benchmarks/RESULTS.md "per-stage cost").

Compares one fused stage-block op (conv3x3 + bias + LeakyReLU + PixelNorm)
at [H=1024, W=1024, C=32 -> 32]:
  a) XLA on NHWC (C=32 lane-pads every HBM access 4x), and
  b) ops/pallas_packed.packed_conv on the phase-blocked [C, H, W] layout.

Timing methodology (round-2 fix): each scan step feeds the PREVIOUS step's
output back as input, so XLA cannot hoist the op out of the loop — a
loop-invariant chain measures ONE execution plus the ~34 ms relay RPC floor,
which is exactly the mistake the round-1 numbers made (both sides measured
~4 ms regardless of the op). Per-step cost is the slope between two chain
lengths, cancelling the floor.

Usage: python benchmarks/packed_conv_bench.py [--h 1024] [--c 32] [--w 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--h", type=int, default=1024)
    parser.add_argument("--w", type=int, default=1024)
    parser.add_argument("--c", type=int, default=32)
    parser.add_argument("--p", type=int, default=4, help="column phase count")
    parser.add_argument("--seconds", type=float, default=5.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from probgan_tpu.models import pro_gan
    from probgan_tpu.ops import pallas_packed as pk

    h, wd, c = args.h, args.w, args.c
    dev = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        rng = np.random.RandomState(0)
        x0 = rng.standard_normal((1, c, h, wd)).astype(np.float32)
        w = (rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32)
        b = rng.standard_normal(c).astype(np.float32)
    x0 = jax.device_put(jnp.asarray(x0), dev)
    w_d = jax.device_put(jnp.asarray(w), dev)
    b_d = jax.device_put(jnp.asarray(b), dev)

    def xla_chain_native(x):  # stays NHWC (no transposes): the fair baseline
        y = jax.lax.conv_general_dilated(
            x, w_d, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ) + b_d
        return pro_gan.pixel_norm(pro_gan.lrelu(y))

    def packed(x, mode):
        return pk.packed_conv(x, w_d, b_d, args.p, mode=mode)

    def chain_time(fn, x_in, reps):
        @jax.jit
        def cs(x):
            def step(xc, _):
                return fn(xc), None
            y, _ = jax.lax.scan(step, x, None, length=reps)
            return jnp.sum(y)

        float(cs(x_in)); float(cs(x_in))
        t0 = time.perf_counter()
        it = 0
        while time.perf_counter() - t0 < args.seconds:
            float(cs(x_in)); it += 1
        return (time.perf_counter() - t0) / it

    payload_gb = 4 * 2 * c * h * wd / 1e9
    results = {}

    def bench(tag, fn, x_in):
        t4 = chain_time(fn, x_in, 4)
        t20 = chain_time(fn, x_in, 20)
        per = (t20 - t4) / 16
        results[tag] = per
        print(json.dumps({
            "kernel": tag, "ms_per_op": round(1000 * per, 3),
            "payload_GBps": round(payload_gb / per, 1),
        }), flush=True)

    bench("xla_nhwc_highest", xla_chain_native,
          jnp.transpose(x0, (0, 2, 3, 1)))
    for mode in ("highest", "exact6", "high", "default"):
        bench(f"pallas_packed_{mode}", lambda x, m=mode: packed(x, m), x0)
    print(json.dumps({
        "speedup_packed_highest_vs_xla":
            round(results["xla_nhwc_highest"] / results["pallas_packed_highest"], 2)
    }))


if __name__ == "__main__":
    main()
