#!/usr/bin/env python3
"""Micro-benchmark: packed-layout fused conv block vs the XLA NHWC chain at
the generator's final-stage shape (the 61%-of-forward hotspot —
see RESULTS.md "per-stage cost").

Compares one stage-block op sequence (conv3x3 + bias + LeakyReLU + PixelNorm)
at [H=1024, W=1024, C=32 -> 32]:
  a) XLA on NHWC (the current generator path; C=32 lane-pads 4x), and
  b) the experimental Pallas kernel on packed [H, C, W]
     (ops/pallas_packed_conv.py; zero padding waste).

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
    parser.add_argument("--cout", type=int, default=32)
    parser.add_argument("--seconds", type=float, default=6.0)
    parser.add_argument("--chain", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from probgan_tpu.models import pro_gan
    from probgan_tpu.ops.pallas_packed_conv import packed_conv_block

    h, wd, c, cout = args.h, args.w, args.c, args.cout
    dev = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        rng = np.random.RandomState(0)
        x_hcw = rng.standard_normal((h, c, wd)).astype(np.float32)
        w = (rng.standard_normal((3, 3, c, cout)) * 0.1).astype(np.float32)
        b = rng.standard_normal(cout).astype(np.float32)
    x_hcw = jax.device_put(x_hcw, dev)
    x_nhwc = jnp.transpose(x_hcw, (0, 2, 1))[None]
    w_d = jax.device_put(w, dev)
    b_d = jax.device_put(b, dev)
    interpret = jax.default_backend() != "tpu"

    def xla_chain(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ) + b
        return pro_gan.pixel_norm(pro_gan.lrelu(y))

    def bench(tag, fn, x):
        @jax.jit
        def cs(x, w, b):
            def step(acc, _):
                return acc + jnp.sum(fn(x, w, b)), None
            return jax.lax.scan(step, jnp.float32(0.0), None, length=args.chain)[0]

        float(cs(x, w_d, b_d)); float(cs(x, w_d, b_d))
        t0 = time.perf_counter()
        it = 0
        while time.perf_counter() - t0 < args.seconds:
            float(cs(x, w_d, b_d))
            it += 1
        per_call_ms = 1000 * (time.perf_counter() - t0) / (it * args.chain)
        payload = 4 * (h * wd * c + h * wd * cout) / 1e9
        print(json.dumps({
            "kernel": tag, "ms_per_op": round(per_call_ms, 3),
            "payload_GBps": round(payload / (per_call_ms / 1000), 1),
        }), flush=True)
        return per_call_ms

    t_xla = bench("xla_nhwc_chain", xla_chain, x_nhwc)
    t_packed = bench(
        "pallas_packed",
        lambda x, w, b: packed_conv_block(x, w, b, interpret=interpret),
        x_hcw,
    )
    print(json.dumps({"speedup_packed_vs_xla": round(t_xla / t_packed, 2)}))


if __name__ == "__main__":
    main()
