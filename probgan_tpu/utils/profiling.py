"""Tracing / profiling hooks.

The reference has no instrumentation beyond ``print`` banners (SURVEY.md §5.1).
Here every engine task runs inside a named ``jax.profiler`` annotation, and an
optional ``--profile_dir`` flag on the CLI wraps the whole task in a real
profiler trace viewable in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def task_trace(name: str):
    """Annotate a task region on the device timeline."""
    with jax.profiler.TraceAnnotation(f"probgan/{name}"):
        yield


@contextlib.contextmanager
def maybe_profile(profile_dir: str | None):
    """Capture a full profiler trace into ``profile_dir`` when set.

    Degrades gracefully: some device transports (e.g. relayed/remote TPU
    plugins) reject profiling with a backend error — the task must still
    complete, just without a trace."""
    if not profile_dir:
        yield
        return
    try:
        ctx = jax.profiler.trace(profile_dir)
        ctx.__enter__()
    except Exception as e:  # noqa: BLE001 — profiling must never kill a task
        print(f"Warning: profiler unavailable ({e}); continuing without trace")
        yield
        return
    try:
        yield
    finally:
        try:
            ctx.__exit__(None, None, None)
        except Exception as e:  # noqa: BLE001
            print(f"Warning: profiler trace capture failed ({e})")
