"""CLI entry / task dispatch, mirroring the reference argparse surface
(pro_b_gan_infer.py:434-511) with two repairs documented in SURVEY.md §0.3:

- ``analyze_relations`` is in the reference's ``--task`` choices (:441) but
  ``main()`` never dispatches it, silently printing nothing. Here it is wired
  up via two NEW flags ``--input_heads`` / ``--input_tails`` (pure additions —
  no existing task's inputs or outputs change).
- The reference crashes with ``NameError`` on load (:93-94 instantiate
  undefined names); this engine uses one consistent model API.

Additional TPU-native flags (pure additions): ``--seed`` (explicit generator
noise seed, see core/rng.py) and ``--profile_dir`` (jax.profiler trace,
SURVEY.md §5.1).
"""

from __future__ import annotations

import argparse
import json

from probgan_tpu.cli.repl import interactive_mode
from probgan_tpu.engine import InferenceEngine
from probgan_tpu.utils.profiling import maybe_profile

TASKS = (
    "predict_tails",
    "score_triplets",
    "similar_entities",
    "analyze_relations",
    "interactive",
    "model_info",
    "generate_images",
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Prot-B-GAN Inference System")
    parser.add_argument(
        "--checkpoint_path",
        type=str,
        required=True,
        help="Path to trained model checkpoint",
    )
    parser.add_argument(
        "--task",
        type=str,
        default="interactive",
        choices=list(TASKS),
        help="Inference task to perform",
    )
    parser.add_argument(
        "--input_triplets",
        type=str,
        default="",
        help='Input triplets as JSON string (e.g., "[[0,1,2],[3,4,5]]")',
    )
    parser.add_argument(
        "--input_pairs",
        type=str,
        default="",
        help='Input head-relation pairs as JSON string (e.g., "[[0,1],[2,3]]")',
    )
    parser.add_argument(
        "--input_entities",
        type=str,
        default="",
        help='Input entity IDs as JSON string (e.g., "[0,1,2,3]")',
    )
    parser.add_argument(
        "--input_heads",
        type=str,
        default="",
        help='Head entity IDs for analyze_relations as JSON string (e.g., "[0,1]")',
    )
    parser.add_argument(
        "--input_tails",
        type=str,
        default="",
        help='Tail entity IDs for analyze_relations as JSON string (e.g., "[2,3]")',
    )
    parser.add_argument(
        "--top_k", type=int, default=10, help="Number of top results to return"
    )
    parser.add_argument(
        "--output_file",
        type=str,
        default="",
        help="Output file to save results (JSON format)",
    )
    parser.add_argument(
        "--device",
        type=str,
        default="auto",
        choices=["auto", "tpu", "cuda", "cpu"],
        help="Device to use for inference ('cuda' is a compatibility alias "
        "for the attached accelerator)",
    )
    parser.add_argument(
        "--seed", type=int, default=0, help="Seed for generator noise"
    )
    parser.add_argument(
        "--num_images", type=int, default=1,
        help="Number of images for the generate_images task",
    )
    parser.add_argument(
        "--stage", type=int, default=-1,
        help="Progressive stage for generate_images (-1 = final resolution)",
    )
    parser.add_argument(
        "--alpha", type=float, default=1.0,
        help="Progressive fade-in alpha for generate_images",
    )
    parser.add_argument(
        "--raw_generator", action="store_true",
        help="generate_images: use the raw adversarial iterate even when "
        "the checkpoint stores EMA generator weights (default prefers EMA)",
    )
    parser.add_argument(
        "--precision", type=str, default="high",
        choices=["default", "fast", "high", "highest"],
        help="Image-task serving grade (generate_images): 'high' is the "
        "parity-grade production default; 'fast' is the cheapest grade "
        "measured above the 50 dB parity bar (~1.4x faster than 'high'; "
        "see benchmarks/RESULTS.md); 'default' is 1-pass bf16 (below the "
        "bar)",
    )
    parser.add_argument(
        "--profile_dir",
        type=str,
        default="",
        help="If set, capture a jax.profiler trace of the task into this dir",
    )
    parser.add_argument(
        "--mesh",
        type=str,
        default="",
        help="Multi-device mesh: 'auto' (all attached devices) or a device "
        "count. predict_tails/similar_entities rank against the entity "
        "table sharded over the mesh's model axis; generate_images runs "
        "data-parallel. Results are identical to single-device.",
    )
    return parser


def run_generate_images(args: argparse.Namespace):
    """Image-synthesis task on an image-GAN checkpoint (the north-star model
    family; no reference file:line — the reference ships no image ops). The
    JSON result carries shape/checksum metadata; pass an ``--output_file``
    ending in .npz to also save the raw uint8 images."""
    import numpy as np

    from probgan_tpu.core.image_checkpoint import load_image_checkpoint
    from probgan_tpu.engine.image import ImageGANEngine

    config, g_params, d_params = load_image_checkpoint(
        args.checkpoint_path, prefer_ema=not args.raw_generator
    )
    engine = ImageGANEngine(
        config, g_params=g_params, d_params=d_params or None,
        device=args.device, seed=args.seed, mesh=args.mesh,
        precision=None if args.precision == "default" else args.precision,
    )
    stage = engine.final_stage if args.stage < 0 else args.stage
    print(
        f"Generating {args.num_images} images at "
        f"{4 * 2 ** stage}x{4 * 2 ** stage} (alpha={args.alpha})..."
    )
    z = engine.sample_latents(args.num_images)
    images = engine.generate(z, stage=stage, alpha=args.alpha)

    npz_path = ""
    if args.output_file.endswith(".npz"):
        np.savez_compressed(args.output_file, images=images)
        npz_path = args.output_file

    return {
        "images_shape": list(images.shape),
        "dtype": "uint8",
        "checksum": int(images.astype(np.int64).sum()),
        "images_file": npz_path,
        "metadata": {
            "num_images": args.num_images,
            "stage": stage,
            "alpha": args.alpha,
            "resolution": int(4 * 2 ** stage),
            "seed": args.seed,
        },
    }


def run_task(engine: InferenceEngine, args: argparse.Namespace):
    """Dispatch a non-interactive task. Returns the result dict or None (the
    reference prints nothing when results are None, pro_b_gan_infer.py:502)."""
    if args.task == "model_info":
        return engine.get_model_info()

    if args.task == "predict_tails":
        if not args.input_pairs:
            print("Error: --input_pairs required for predict_tails task")
            return None
        pairs = json.loads(args.input_pairs)
        return engine.predict_tails(pairs, args.top_k, return_scores=True)

    if args.task == "score_triplets":
        if not args.input_triplets:
            print("Error: --input_triplets required for score_triplets task")
            return None
        triplets = json.loads(args.input_triplets)
        return engine.score_triplets(triplets, method="both")

    if args.task == "similar_entities":
        if not args.input_entities:
            print("Error: --input_entities required for similar_entities task")
            return None
        entities = json.loads(args.input_entities)
        return engine.find_similar_entities(entities, args.top_k)

    if args.task == "analyze_relations":
        if not args.input_heads or not args.input_tails:
            print(
                "Error: --input_heads and --input_tails required for "
                "analyze_relations task"
            )
            return None
        heads = json.loads(args.input_heads)
        tails = json.loads(args.input_tails)
        return engine.analyze_relations(heads, tails, args.top_k)

    return None


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)

    if args.task == "generate_images":
        with maybe_profile(args.profile_dir):
            results = run_generate_images(args)
        if results:
            if results.get("images_file"):
                print(f"Images saved to: {results['images_file']}")
                print(json.dumps(results, indent=2))
            elif args.output_file:
                with open(args.output_file, "w") as f:
                    json.dump(results, f, indent=2)
                print(f"Results saved to: {args.output_file}")
            else:
                print(json.dumps(results, indent=2))
        return

    engine = InferenceEngine(
        args.checkpoint_path, args.device, seed=args.seed, mesh=args.mesh
    )

    if args.task == "interactive":
        interactive_mode(engine)
        return

    with maybe_profile(args.profile_dir):
        results = run_task(engine, args)

    if results:
        if args.output_file:
            with open(args.output_file, "w") as f:
                json.dump(results, f, indent=2)
            print(f"Results saved to: {args.output_file}")
        else:
            print(json.dumps(results, indent=2))
