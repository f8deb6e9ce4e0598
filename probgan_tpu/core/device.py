"""Device selection policy.

Mirrors the reference's device policy (pro_b_gan_infer.py:54):
``'auto'`` picks the accelerator when one is available, else CPU; an explicit
device string forces that platform. The reference's accepted strings are
``auto|cuda|cpu`` (pro_b_gan_infer.py:459-461); on TPU we accept
``auto|tpu|cpu`` and keep ``cuda`` as a compatibility alias for "the
accelerator" so existing reference invocations keep working.
"""

from __future__ import annotations

import jax

_ACCEL_ALIASES = ("tpu", "cuda", "gpu")


def _accelerators() -> list[jax.Device]:
    return [d for d in jax.devices() if d.platform != "cpu"]


def resolve_device(spec: str = "auto") -> jax.Device:
    """Resolve a device spec string to a concrete jax.Device.

    Args:
        spec: 'auto', 'cpu', 'tpu', or the compatibility aliases 'cuda'/'gpu'.

    Returns:
        The selected jax.Device.

    Raises:
        RuntimeError: if an accelerator was requested but none is attached.
        ValueError: for an unknown spec.
    """
    spec = (spec or "auto").lower()
    if spec == "auto":
        accels = _accelerators()
        if accels:
            return accels[0]
        return jax.devices("cpu")[0]
    if spec == "cpu":
        return jax.devices("cpu")[0]
    if spec in _ACCEL_ALIASES:
        accels = _accelerators()
        if not accels:
            raise RuntimeError(
                f"Device '{spec}' requested but no accelerator is attached "
                f"(available: {[d.platform for d in jax.devices()]})"
            )
        return accels[0]
    raise ValueError(f"Unknown device spec: {spec!r}")


def device_str(device: jax.Device) -> str:
    """Short human-readable device name, e.g. 'tpu:0' or 'cpu:0'.

    Used where the reference prints ``str(torch.device)``
    (pro_b_gan_infer.py:59,337).
    """
    return f"{device.platform}:{device.id}"


def device_report() -> dict:
    """Structured report of the attached devices (for the installer doctor,
    the TPU analog of install_pro_b_gan.py:137-145)."""
    devices = jax.devices()
    accels = _accelerators()
    return {
        "backend": jax.default_backend(),
        "device_count": len(devices),
        "accelerator_count": len(accels),
        "devices": [
            {
                "id": d.id,
                "platform": d.platform,
                "kind": getattr(d, "device_kind", "unknown"),
            }
            for d in devices
        ],
    }
