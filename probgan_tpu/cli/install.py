"""Installer / environment doctor for the TPU stack.

Mirrors the reference installer's surface and semantics
(install_pro_b_gan.py:25-188): ``--colab`` / ``--local`` / ``--check`` flags,
a shell command runner that prints success/failure and continues past errors
aggregating the result, an import-probe doctor with version reporting and an
accelerator report, and exit codes 0/1 (no flag -> usage + 1).

TPU-native differences: the dependency set is the JAX TPU stack
(``jax[tpu]``, flax, optax, orbax-checkpoint) instead of torch cu118 + PyG
wheels (install_pro_b_gan.py:44-48), and the accelerator report enumerates
``jax.devices()`` instead of ``torch.cuda.*`` (install_pro_b_gan.py:137-145).
The reference's NumPy<2.0 pin was a torch-2.0 compatibility constraint; the
JAX stack has no such pin, so the doctor instead verifies jax/jaxlib version
agreement (the analogous wheel-compat failure mode on TPU).
"""

from __future__ import annotations

import argparse
import subprocess
import sys


def run_command(cmd: str, description: str = "") -> bool:
    """Run a shell command, print outcome, return success
    (install_pro_b_gan.py:25-36 semantics)."""
    print(f" {description}")
    print(f"   Running: {cmd}")
    try:
        subprocess.run(cmd, shell=True, check=True, capture_output=True, text=True)
        print("   Success")
        return True
    except subprocess.CalledProcessError as e:
        print(f"   Failed: {e}")
        print(f"   Error output: {e.stderr}")
        return False


_COMMON_STEPS = [
    (
        "pip install flax optax orbax-checkpoint chex einops",
        "Installing JAX neural-network libraries",
    ),
    (
        "pip install scikit-learn pandas matplotlib tqdm",
        "Installing additional dependencies",
    ),
]


def install_colab() -> bool:
    """Install for a hosted TPU runtime (Colab/Kaggle TPU VM)."""
    print(" Installing Prot-B-GAN dependencies for Google Colab (TPU)...")
    steps = [
        (
            'pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html',
            "Installing JAX with TPU support",
        ),
    ] + _COMMON_STEPS
    return _run_steps(steps)


def install_local() -> bool:
    """Install for a local environment (CPU fallback unless a TPU is attached)."""
    print(" Installing Prot-B-GAN dependencies for local environment...")
    steps = [("pip install jax", "Installing JAX")] + _COMMON_STEPS
    return _run_steps(steps)


def _run_steps(steps: list[tuple[str, str]]) -> bool:
    success = True
    for cmd, desc in steps:
        if not run_command(cmd, desc):
            success = False
    if success:
        print("\n Installation completed successfully!")
        print(
            " You can now run: python prot_b_gan.py --data_root /path/to/data --debug --verbose"
        )
    else:
        print("\n Some installations failed. Please check the error messages above.")
    return success


# ---------------------------------------------------------------------------
# doctor
# ---------------------------------------------------------------------------

_PROBES = [
    ("numpy", "NumPy"),
    ("jax", "JAX"),
    ("jaxlib", "jaxlib"),
    ("flax", "Flax"),
    ("optax", "Optax"),
    ("orbax.checkpoint", "Orbax"),
    ("tqdm", "tqdm"),
]


def check_installation() -> bool:
    """Import-probe the stack, report versions and TPU devices
    (install_pro_b_gan.py:89-164 semantics on the JAX stack)."""
    print("Checking Prot-B-GAN installation...")

    import importlib

    success = True
    versions: dict[str, str] = {}

    for module_name, display in _PROBES:
        try:
            mod = importlib.import_module(module_name)
            print(f" {display} - OK")
            version = getattr(mod, "__version__", None)
            if version:
                versions[display] = version
        except ImportError as e:
            print(f" {display} - FAILED: {e}")
            success = False

    print("\n Version Information:")
    for package, version in versions.items():
        print(f"   {package}: {version}")

    # Accelerator report (the TPU analog of the reference's CUDA report).
    try:
        from probgan_tpu.core.device import device_report

        report = device_report()
        print("\n JAX Configuration:")
        print(f"   Default backend: {report['backend']}")
        print(f"   Device count: {report['device_count']}")
        print(f"   Accelerator count: {report['accelerator_count']}")
        for dev in report["devices"]:
            print(f"   Device {dev['id']}: {dev['platform']} ({dev['kind']})")

        # jax/jaxlib must agree (wheel-compat check, the TPU analog of the
        # reference's NumPy<2 pin at install_pro_b_gan.py:148-152).
        if "JAX" in versions and "jaxlib" in versions:
            jax_mm = tuple(versions["JAX"].split(".")[:2])
            jaxlib_mm = tuple(versions["jaxlib"].split(".")[:2])
            if jax_mm != jaxlib_mm:
                print(
                    f" WARNING: jax {versions['JAX']} and jaxlib "
                    f"{versions['jaxlib']} disagree"
                )
                print("      This may cause compatibility issues")
                success = False
    except Exception as e:  # noqa: BLE001 — doctor must report, not crash
        print(f"JAX configuration check failed: {e}")
        success = False

    if success:
        print("\nAll checks passed! Prot-B-GAN is ready to use.")
        print("Try running: python prot_b_gan.py --help")
    else:
        print("\n Some checks failed. Please reinstall the problematic packages.")

    return success


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Install Prot-B-GAN dependencies")
    parser.add_argument(
        "--colab", action="store_true", help="Install for Google Colab (TPU runtime)"
    )
    parser.add_argument(
        "--local", action="store_true", help="Install for local environment"
    )
    parser.add_argument("--check", action="store_true", help="Check installation")
    args = parser.parse_args(argv)

    if args.colab:
        return 0 if install_colab() else 1
    if args.local:
        return 0 if install_local() else 1
    if args.check:
        return 0 if check_installation() else 1

    print("Please specify installation target:")
    print("  --colab   Install for Google Colab")
    print("  --local   Install for local environment")
    print("  --check   Check existing installation")
    return 1


if __name__ == "__main__":
    sys.exit(main())
