#!/usr/bin/env python3
"""Convert KG-GAN checkpoints between the torch ``.pt`` artifact format and
the native msgpack format (both directions; SURVEY.md §5.4: "a converter
that ingests a reference .pt so seeds/checkpoints are shared").

Usage:
    python tools/convert_checkpoint.py IN OUT [--format torch|native]

The output format defaults by extension (.pt -> torch, else native). The
logical schema (C17 key set) is preserved exactly; only the physical encoding
and weight layout (torch [out,in] vs JAX [in,out]) change.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from probgan_tpu.core.checkpoint import load_checkpoint, save_checkpoint  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser(description="Prot-B-GAN checkpoint converter")
    parser.add_argument("input", help="Source checkpoint (.pt or msgpack)")
    parser.add_argument("output", help="Destination path")
    parser.add_argument(
        "--format",
        choices=["auto", "torch", "native"],
        default="auto",
        help="Output format (default: by output extension)",
    )
    args = parser.parse_args()

    ckpt = load_checkpoint(args.input)
    save_checkpoint(args.output, ckpt, format=args.format)
    n, d = ckpt["node_emb"].shape
    print(f"Converted {args.input} -> {args.output}")
    print(f"  entities={n:,} embed_dim={d} "
          f"relations={ckpt['rel_emb']['weight'].shape[0]:,} "
          f"best_val_hit10={float(ckpt.get('best_val_hit10', 0.0)):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
