"""Native runtime components (C), with pure-numpy fallbacks.

The TPU compute path is JAX/XLA/Pallas; the runtime around it uses native
code where it pays: here, the training data loader (native/triplet_loader.c).
``parse_triplets`` / ``sample_negatives`` dispatch to the C extension when it
can be imported or built, else to numpy implementations (``parse_triplets``
is value-identical on both paths; ``sample_negatives`` is deterministic per
seed on each path but the two paths use different PRNG streams).

Build: the first import attempts an on-demand build with the system compiler
into ``native/`` (cached by mtime); set ``PROBGAN_NO_NATIVE=1`` to force the
numpy path.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, os.pardir)
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SRC = os.path.join(_NATIVE_DIR, "triplet_loader.c")

_native = None


def _try_build() -> None:
    """Compile the extension in-place with the system cc (one .c file)."""
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_NATIVE_DIR, f"probgan_native{ext_suffix}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", f"-I{include}", _SRC, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def _load():
    global _native
    if _native is not None or os.environ.get("PROBGAN_NO_NATIVE"):
        return _native
    try:
        if _NATIVE_DIR not in sys.path:
            sys.path.insert(0, _NATIVE_DIR)
        try:
            import probgan_native  # noqa: F401
        except ImportError:
            _try_build()
            import probgan_native  # noqa: F401
        _native = probgan_native
    except Exception:  # noqa: BLE001 — any build/import failure -> numpy path
        _native = None
    return _native


def native_available() -> bool:
    return _load() is not None


def parse_triplets(path: str) -> np.ndarray:
    """Parse a triplet text file ('h r t' per line, integer ids) into an
    int32 [n, 3] array. C fast path, numpy fallback."""
    native = _load()
    if native is not None:
        with open(path, "rb") as f:
            data = f.read()
        flat = np.frombuffer(native.parse_triplets(data), dtype=np.int32)
        return flat.reshape(-1, 3)
    return np.loadtxt(path, dtype=np.int32, ndmin=2).reshape(-1, 3)


def sample_negatives(n: int, num_entities: int, seed: int) -> np.ndarray:
    """n uniform entity ids. C fast path (xorshift128+); the numpy fallback
    uses PCG64 — both are deterministic per seed but are different streams."""
    native = _load()
    if native is not None:
        return np.frombuffer(
            native.sample_negatives(n, num_entities, seed), dtype=np.int32
        ).copy()
    return np.random.default_rng(seed).integers(
        0, num_entities, size=n, dtype=np.int32
    )
