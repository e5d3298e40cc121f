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


def sync_packed(tree):
    """Like `sync`, but delivers the whole tree in ONE device->host
    transfer.

    `jax.device_get` fetches one leaf per RPC; through the remote
    tunnel each fetch costs ~35-60 ms of latency, so a 15-leaf result
    pytree pays ~0.5-0.9 s regardless of size (profiled on the conic
    batch result: 101 ms of device compute vs 945 ms of fetch).  Here
    every leaf is raveled, cast to f64 (exact for int32/bool counts),
    and concatenated ON DEVICE (async dispatches -- nothing blocks
    until the single value read), then split/reshaped/recast on host.
    On directly-attached backends this is a wash; through the tunnel it
    replaces N latency hits with one."""
    import numpy as np
    import jax.numpy as jnp

    if not jax.config.x64_enabled:
        # Without x64, jnp.float64 silently means float32 and the packing
        # would corrupt f64/int32 leaves; plain device_get stays exact.
        return sync(tree)

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    arrs = [jnp.asarray(x) for x in leaves]
    # f64 packing is exact for f32/f64/int32/bool but lossy for 64-bit
    # ints above 2^53 -- route those leaves through plain device_get.
    packable = [x.dtype.itemsize < 8 or jnp.issubdtype(x.dtype, jnp.floating)
                for x in arrs]
    pk = [x for x, ok in zip(arrs, packable) if ok]
    flat = np.asarray(jnp.concatenate([x.ravel().astype(jnp.float64) for x in pk])) \
        if pk else np.zeros((0,))
    out, off = [], 0
    for x, ok in zip(arrs, packable):
        if not ok:
            out.append(jax.device_get(x))
            continue
        k = int(np.prod(x.shape)) if x.shape else 1
        out.append(flat[off:off + k].reshape(x.shape).astype(x.dtype))
        off += k
    return jax.tree_util.tree_unflatten(treedef, out)
