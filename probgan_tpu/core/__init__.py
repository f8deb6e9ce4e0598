"""Runtime core: device selection, RNG policy, checkpoint I/O."""

from probgan_tpu.core.device import resolve_device, device_str, device_report
from probgan_tpu.core.rng import RngStream
from probgan_tpu.core.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    CHECKPOINT_KEYS,
)

__all__ = [
    "resolve_device",
    "device_str",
    "device_report",
    "RngStream",
    "load_checkpoint",
    "save_checkpoint",
    "CHECKPOINT_KEYS",
]
