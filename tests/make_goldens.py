"""Regenerate the golden JSON files for tests/test_golden.py.

Usage:  python tests/make_goldens.py
Run from the repo root; forces the CPU backend like conftest does.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import tempfile  # noqa: E402

from probgan_tpu.core.checkpoint import save_checkpoint  # noqa: E402
from probgan_tpu.engine import InferenceEngine  # noqa: E402
from tests.conftest import make_checkpoint_dict  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.msgpack")
        save_checkpoint(path, make_checkpoint_dict(), format="native")
        engine = InferenceEngine(path, device="cpu", seed=0)

        # RNG keys are task-derived (core/rng.py), so each task's FIRST call
        # on a fresh engine is reproducible regardless of the order the other
        # tasks run in — goldens survive test reordering.
        results = {
            "predict_tails.json": engine.predict_tails(
                [(0, 1), (2, 3)], top_k=5, return_scores=True
            ),
            "score_triplets.json": engine.score_triplets(
                [(0, 1, 2), (3, 4, 5)], method="both"
            ),
            "similar_entities.json": engine.find_similar_entities([0, 7], top_k=4),
            "analyze_relations.json": engine.analyze_relations([1], [2], top_k=3),
            "model_info.json": engine.get_model_info(),
        }
    for name, res in results.items():
        with open(os.path.join(GOLDEN_DIR, name), "w") as f:
            json.dump(res, f, indent=2, sort_keys=False)
        print("wrote", name)


if __name__ == "__main__":
    main()
