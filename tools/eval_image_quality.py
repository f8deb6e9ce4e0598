#!/usr/bin/env python3
"""Evaluate an image-GAN checkpoint's synthesis quality.

Loads the checkpoint's EMA and raw generators, renders samples from each,
and reports the benchmarks/image_quality.py signals against the training
dataset (``--synthetic N`` regenerates the procedural set the trainer used,
byte-identical for the same seed/resolution; or ``--data_root``). Writes a
sample grid artifact per generator and prints one JSON line.

Usage:
  python tools/eval_image_quality.py --checkpoint ./img/image_checkpoint.msgpack \
      --synthetic 256 --resolution 128 [--num_samples 64] [--out_prefix benchmarks/artifacts/run]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--resolution", type=int, default=128)
    parser.add_argument("--data_root", type=str, default="")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--sample_seed", type=int, default=1234)
    parser.add_argument("--num_samples", type=int, default=64)
    parser.add_argument("--grid", type=int, default=16,
                        help="images in the saved sample grid")
    parser.add_argument("--out_prefix", type=str,
                        default="benchmarks/artifacts/image_quality")
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()

    from benchmarks.image_quality import (channel_wasserstein, logit_gap,
                                          sample_grid)
    from probgan_tpu.cli.train_image import load_images, synthetic_images
    from probgan_tpu.core.image_checkpoint import load_image_checkpoint_trees
    from probgan_tpu.engine.image import ImageGANEngine

    if args.synthetic > 0:
        dataset = synthetic_images(args.synthetic, args.resolution, args.seed)
    elif args.data_root:
        dataset = load_images(args.data_root)
    else:
        print("Error: --synthetic or --data_root required", file=sys.stderr)
        return 1

    cfg, g_raw, g_ema, d_params = load_image_checkpoint_trees(args.checkpoint)
    os.makedirs(os.path.dirname(args.out_prefix) or ".", exist_ok=True)

    def render(g_params, tag):
        eng = ImageGANEngine(cfg, g_params=g_params, d_params=d_params or None,
                             seed=args.sample_seed)
        outs = []
        for i in range(0, args.num_samples, args.batch):
            n = min(args.batch, args.num_samples - i)
            z = eng.sample_latents(n)
            outs.append(eng.generate(z))
        fake = np.concatenate(outs, axis=0)
        grid_path = sample_grid(fake[: args.grid], f"{args.out_prefix}_{tag}")
        metrics = {"w1_color": round(channel_wasserstein(fake, dataset), 3),
                   "grid": grid_path}
        if d_params:
            k = min(len(dataset), len(fake))
            metrics["d_logit_gap"] = round(
                logit_gap(eng.score, dataset[:k], fake[:k]), 4
            )
        return metrics

    result = {
        "checkpoint": args.checkpoint,
        "resolution": cfg.resolution,
        "num_samples": args.num_samples,
        # dataset self-distance (two halves): the noise floor for w1_color
        "w1_color_dataset_floor": round(
            channel_wasserstein(dataset[: len(dataset) // 2],
                                dataset[len(dataset) // 2 :]), 3
        ),
        "ema": render(g_ema, "ema") if g_ema is not None else None,
        "raw": render(g_raw, "raw"),
    }
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
