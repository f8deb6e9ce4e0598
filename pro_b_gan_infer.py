"""
Prot-B-GAN Inference Script (TPU-native)
========================================

Standalone inference entry point for the Prot-B-GAN system, re-implemented
TPU-first on JAX/XLA (see probgan_tpu/). Loads trained checkpoints (native
msgpack or reference torch ``.pt``) and performs the same inference tasks with
the same CLI flags, printed output, and JSON result shapes as the reference
``pro_b_gan_infer.py``.

Usage Examples:

    # Predict top-k tails for given head-relation pairs
    python pro_b_gan_infer.py \
        --checkpoint_path "./modular_results/best_checkpoint.pt" \
        --task predict_tails \
        --input_pairs "[[0, 1], [2, 3]]" \
        --top_k 10

    # Score existing triplets
    python pro_b_gan_infer.py \
        --checkpoint_path "./modular_results/best_checkpoint.pt" \
        --task score_triplets \
        --input_triplets "[[0, 1, 2], [3, 4, 5]]"

    # Interactive mode
    python pro_b_gan_infer.py \
        --checkpoint_path "./modular_results/best_checkpoint.pt" \
        --task interactive
"""

from probgan_tpu.cli.infer import main

if __name__ == "__main__":
    main()
