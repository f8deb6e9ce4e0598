#!/usr/bin/env python3
"""Discriminator scoring throughput at 1024², packed Pallas vs XLA.

The D mirror of the generator's packed late stages: at 1024² the leading D
blocks run at nf=32/64 where NHWC wastes 4x/2x of every HBM access.
Slope-timed over chained scans (RESULTS.md round-2 methodology).

Usage: python benchmarks/d_score_bench.py [--batch 8] [--precision high]
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
    parser.add_argument("--res", type=int, default=1024)
    parser.add_argument("--precision", default="high")
    parser.add_argument("--chains", type=int, default=4)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from probgan_tpu.models import pro_gan

    cfg = pro_gan.ProGANConfig(resolution=args.res)
    stage = cfg.num_stages - 1
    n_packed = pro_gan.packed_d_stage_count(cfg, stage, args.precision)
    print(f"packed D stages: {n_packed}", file=sys.stderr, flush=True)

    with jax.default_device(jax.devices("cpu")[0]):
        d_params = pro_gan.init_discriminator(jax.random.key(0), cfg)
    dev = jax.devices()[0]
    d_params = jax.device_put(d_params, dev)
    img0 = jax.device_put(
        jax.random.uniform(
            jax.random.key(1), (args.batch, args.res, args.res, 3),
            jnp.float32, -1.0, 1.0,
        ),
        dev,
    )

    from benchmarks._timing import slope_timed_ms

    def timed(packed: bool) -> float:
        def step(img):
            logits = pro_gan.discriminator_apply(
                d_params, img, cfg, stage, 1.0, jnp.float32,
                args.precision, packed=packed,
            )
            return img * (1.0 + 1e-12 * jnp.mean(logits))

        return slope_timed_ms(step, img0, chains=args.chains)

    ms_pk = timed(True)
    ms_x = timed(False)
    print(json.dumps({
        "metric": f"d_score_per_sec_{args.res}",
        "batch": args.batch,
        "precision": args.precision,
        "packed_stages": n_packed,
        "ms_per_batch_packed": round(ms_pk, 2),
        "ms_per_batch_xla": round(ms_x, 2),
        "scores_per_sec_packed": round(1000 * args.batch / ms_pk, 1),
        "scores_per_sec_xla": round(1000 * args.batch / ms_x, 1),
        "speedup": round(ms_x / ms_pk, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
