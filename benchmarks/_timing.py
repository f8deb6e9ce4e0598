"""Shared slope-timing harness for the round-2 benchmark methodology.

Chained identical-input ops get hoisted out of `lax.scan` by XLA (which is
how round 1's packed-conv micro-numbers both measured ≈ the ~34 ms relay
RPC floor — RESULTS.md "Timing-methodology correction"). The harness here
feeds each step's output back into the next step's input (not hoistable)
and reports the SLOPE between two chain lengths, cancelling the RPC floor
and the constant scan overhead.
"""

from __future__ import annotations

import time
from typing import Callable


def slope_timed_ms(
    step: Callable, x0, chains: int = 4, reps: int = 3
) -> float:
    """Milliseconds per application of ``step``.

    ``step`` maps a carry pytree to a carry of the same structure/shape —
    benches fold their op's output into the carry through a tiny
    perturbation (e.g. ``x * (1 + 1e-12 * mean(out))``) so every scan
    iteration depends on the previous one. Each chain length is compiled
    once and timed ``reps`` times (min taken); the returned value is the
    slope between chain lengths ``chains`` and ``2 * chains``.
    """
    import jax
    import jax.numpy as jnp

    def chain(n: int) -> float:
        f = jax.jit(
            lambda x: jax.tree.reduce(
                lambda a, b: a + jnp.sum(b),
                jax.lax.scan(lambda c, _: (step(c), None), x, None, length=n)[0],
                jnp.float32(0.0),
            )
        )
        float(f(x0))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = chains, 2 * chains
    t1, t2 = chain(n1), chain(n2)
    return 1000.0 * (t2 - t1) / (n2 - n1)
