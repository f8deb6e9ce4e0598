#!/usr/bin/env python3
"""Per-stage cost profile of the production (packed) 1024² generator forward.

Times the full generator_rgb(packed=True) cut off at each stage s (the cut
itself is the production graph for resolution 4*2**s), so successive deltas
attribute cost to each stage. Slope-timed over chained distinct-latent scans
to cancel the ~34 ms relay RPC floor (benchmarks/RESULTS.md round-2
methodology).

Usage: python benchmarks/stage_profile.py [--batch 8] [--precision high]
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
    parser.add_argument("--precision", default="high")
    parser.add_argument("--res", type=int, default=1024)
    parser.add_argument("--chains", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from probgan_tpu.models import pro_gan

    cfg = pro_gan.ProGANConfig(resolution=args.res)
    top = cfg.num_stages - 1
    with jax.default_device(jax.devices("cpu")[0]):
        params = pro_gan.init_generator(jax.random.key(0), cfg)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)

    from benchmarks._timing import slope_timed_ms

    z0 = jax.device_put(
        jax.random.normal(
            jax.random.key(1), (args.batch, cfg.latent_dim), jnp.float32
        ),
        dev,
    )

    def timed(stage: int) -> float:
        """ms per forward at ``stage``, slope between two chain lengths."""

        def step(z):
            rgb = pro_gan.generator_apply(
                params, z, cfg, stage, 1.0, jnp.float32,
                args.precision, packed=True,
            )
            # feed a digest of the output back into the next latent so
            # XLA cannot hoist the loop body (methodology note above)
            return z + jnp.mean(rgb.astype(jnp.float32)) * 1e-6

        return slope_timed_ms(step, z0, chains=args.chains)

    rows = {}
    prev = 0.0
    for stage in range(4, top + 1):
        ms = timed(stage)
        rows[f"stage{stage}_{4 * 2**stage}px"] = {
            "cum_ms_per_fwd": round(ms, 2),
            "delta_ms": round(ms - prev, 2),
        }
        print(f"stage {stage} ({4 * 2**stage}²): cumulative {ms:.2f} ms, "
              f"delta {ms - prev:+.2f} ms", file=sys.stderr, flush=True)
        prev = ms
    print(json.dumps({
        "metric": f"generator_stage_profile_{args.res}",
        "batch": args.batch,
        "precision": args.precision,
        "stages": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
