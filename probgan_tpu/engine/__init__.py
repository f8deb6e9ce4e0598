"""Jitted task engine behind the public inference API."""

from probgan_tpu.engine.inference import InferenceEngine

__all__ = ["InferenceEngine"]
