"""Sharded single-instance kernels: block-row SpMV + distributed PCG.

For LPs too large for one chip, A is sharded block-row across a mesh axis
(`rows`): each device owns A_d (m_local, n) and the matching slice of y.
The normal-equations operator

    G y = rho_y * y + A (A^T y)

becomes: local t_d = A_d^T y_d, then `psum(t_d)` over ICI (the all-reduce
that replaces the reference's single-socket SpMV, SURVEY.md section 3.4),
then local A_d t.  CG inner products are local partials + `psum` scalars.
All under `shard_map`, so XLA overlaps the collective with compute.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_normal_matvec(A_local, y_local, rho_y, axis_name="rows"):
    """G y = rho_y y + A A^T y with A block-row sharded over `axis_name`.

    Call inside shard_map.  y_local: this shard's rows of y.
    """
    t = jax.lax.psum(A_local.T @ y_local, axis_name)  # A^T y, replicated
    return rho_y * y_local + A_local @ t


def _pdot(a, b, axis_name):
    return jax.lax.psum(jnp.dot(a, b), axis_name)


def sharded_pcg(A_local, b_local, M_local, rho_y, tol, max_iters,
                axis_name="rows"):
    """Jacobi-PCG on (rho_y I + A A^T) x = b, all operands row-sharded.

    Mirrors the reference PCG (`src/abip-lp/linsys/indirect.c:321-391`)
    with every reduction a `psum` collective.
    """

    def G(y):
        return sharded_normal_matvec(A_local, y, rho_y, axis_name)

    x = jnp.zeros_like(b_local)
    r = b_local - G(x)
    z = M_local * r
    p = z
    ipzr = _pdot(z, r, axis_name)

    def cond(carry):
        x, r, p, ipzr, i = carry
        return (jnp.sqrt(_pdot(r, r, axis_name)) >= tol) & (i < max_iters)

    def body(carry):
        x, r, p, ipzr, i = carry
        Gp = G(p)
        a = ipzr / _pdot(p, Gp, axis_name)
        x = x + a * p
        r = r - a * Gp
        z = M_local * r
        new = _pdot(z, r, axis_name)
        p = z + (new / ipzr) * p
        return (x, r, p, new, i + 1)

    x, r, p, ipzr, iters = jax.lax.while_loop(
        cond, body, (x, r, p, ipzr, jnp.zeros((), jnp.int32))
    )
    return x, iters


def make_sharded_kkt_solver(A, rho_y, mesh: Mesh, axis_name="rows",
                            tol=1e-9, max_iters=500):
    """Build a jitted KKT solver with A block-row sharded over `mesh`.

    Returns solve(w_y, w_x) -> (z_y, z_x) for the LP KKT system
    [[rho_y I, A],[A', -I]], with w_y/z_y row-sharded and w_x/z_x
    replicated -- the seam the reference exposes at
    `src/abip-lp/include/linsys.h:12-20`.
    """
    m, n = A.shape
    ndev = mesh.devices.size
    if m % ndev != 0:
        raise ValueError(f"m={m} must divide the mesh size {ndev} (pad rows)")

    row_sharding = NamedSharding(mesh, P(axis_name))
    A_sh = jax.device_put(A, NamedSharding(mesh, P(axis_name, None)))
    M = 1.0 / (rho_y + jnp.sum(A * A, axis=1))  # Jacobi diag of AA^T
    M_sh = jax.device_put(M, row_sharding)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P(axis_name), P(None)),
        out_specs=(P(axis_name), P(None), P()),
        check_vma=False,
    )
    def _solve(A_local, M_local, w_y_local, w_x):
        # fold x-part into the y rhs: rhs = w_y + A w_x  (`indirect.c:415`)
        rhs_local = w_y_local + A_local @ w_x
        z_y_local, iters = sharded_pcg(A_local, rhs_local, M_local, rho_y,
                                       tol, max_iters, axis_name)
        # back-substitute (`indirect.c:419-420`)
        z_x = jax.lax.psum(A_local.T @ z_y_local, axis_name) - w_x
        return z_y_local, z_x, iters

    @jax.jit
    def solve(w_y, w_x):
        return _solve(A_sh, M_sh, w_y, w_x)

    return solve
