"""Profiling hooks (SURVEY.md §5.1): the --profile_dir capture writes a trace."""

import os

from probgan_tpu.utils.profiling import maybe_profile, task_trace


def test_task_trace_is_usable():
    with task_trace("unit_test"):
        pass  # annotation must not raise outside a capture


def test_maybe_profile_none_is_noop():
    with maybe_profile(None):
        pass
    with maybe_profile(""):
        pass


def test_maybe_profile_writes_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "trace")
    with maybe_profile(d):
        with task_trace("profiled_op"):
            jnp.sum(jnp.ones((8, 8))).block_until_ready()
    # jax writes plugins/profile/<ts>/*.xplane.pb under the dir
    found = []
    for root, _, files in os.walk(d):
        found.extend(f for f in files if f.endswith(".xplane.pb"))
    assert found, f"no trace files written under {d}"
