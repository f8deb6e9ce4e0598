#!/usr/bin/env python3
"""
Prot-B-GAN Training Script (TPU-native)
=======================================

The training entry point the reference installer advertises
(``python prot_b_gan.py --data_root /path/to/data --debug --verbose``,
install_pro_b_gan.py:59,83,160) but whose implementation is absent from the
reference repo. Trains the KG-GAN (generator + discriminator + embedding
tables) on (head, relation, tail) triplets and writes the reference's
checkpoint schema to ``<output_dir>/best_checkpoint.pt``, loadable by both
this framework's ``pro_b_gan_infer.py`` and torch-based consumers.
"""

import sys

from probgan_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
