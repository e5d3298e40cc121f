"""Honest device synchronization for wall-clock measurement.

`jax.block_until_ready` is a NO-OP under the axon remote-TPU backend in
this environment (measured 2026-08-20: a 200-matmul jitted chain
"completed" in 0.3 ms by block_until_ready while the value read took
10.35 s; execution is async-eager -- dispatched work runs in the
background and only a VALUE READ waits for completion).  Every timed
section must therefore close over `sync(result)`, which materializes
all array leaves to host memory, and warm-up calls must be synced the
same way or their queue drain leaks into the next timed section.

On CPU/standard backends `jax.device_get` is equivalent to
block_until_ready + transfer, so using sync() everywhere keeps one
code path.
"""
from __future__ import annotations

import jax


def sync(tree):
    """Materialize every array leaf of `tree` on host; returns the
    numpy pytree.  The only reliable execution barrier on the axon
    remote backend (see module docstring)."""
    return jax.device_get(tree)
