#!/usr/bin/env python3
"""
Prot-B-GAN Installation Script (TPU-native)
===========================================

Installs the dependencies for the TPU-native Prot-B-GAN stack (JAX/XLA) with
the same CLI surface as the reference installer.

Usage:
    # In Google Colab (TPU runtime):
    !python install_pro_b_gan.py --colab

    # Local installation:
    python install_pro_b_gan.py --local

    # Check installation:
    python install_pro_b_gan.py --check
"""

import sys

from probgan_tpu.cli.install import main

if __name__ == "__main__":
    sys.exit(main())
