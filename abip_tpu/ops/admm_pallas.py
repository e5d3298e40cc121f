"""Fused ADMM sprint: T whole LP iterations in ONE Pallas kernel launch.

The measured wall on TPU is kernel count (~10-15 launches x ~30us fixed
cost per ADMM iteration).  This kernel keeps A, the explicit normal-matrix
inverse, and the iterate resident in VMEM and runs T complete iterations
-- projection (rank-1 tau correction + fold + N^-1 apply + back-subst),
barrier prox, dual update -- inside one `fori_loop`, so per-iteration cost
approaches pure compute.

f32 only (Mosaic has no f64): intended as the inner engine of the
anchored mixed-precision scheme -- sprint T f32 iterations on VMEM, then
re-anchor/correct in f64 outside (see `parallel/batched.py` docstring).
Sized for problems whose operands fit VMEM (A: m x n f32 <= ~8 MB).

Validated in interpret mode on CPU; compiled-TPU validation pending
(PARITY.md known gaps).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_TINY = 1e-30


def _prox(t, lam):
    pos = 0.5 * (t + jnp.sqrt(t * t + 4.0 * lam))
    neg = 2.0 * lam / (-t * (1.0 + jnp.sqrt(1.0 + 4.0 * lam / (t * t + _TINY))) + _TINY)
    return jnp.where(t >= 0, pos, neg)


def _sprint_ref(A, Ninv, h, g, scalars, u, v, T, m):
    """Reference implementation (plain jnp) of the T-iteration sprint."""
    rho_y, inv_gth1, lam, alpha = scalars
    n = A.shape[1]
    l = m + n + 1
    hv = h[: l - 1]
    gv = g[: l - 1]

    def body(_, carry):
        u, v = carry
        r = u + v
        q = jnp.concatenate([rho_y * r[:m], r[m : l - 1]])
        q = q - r[l - 1] * hv
        q = q - (jnp.dot(q, gv) * inv_gth1) * hv
        wx = -q[m:]
        rhs = q[:m] + A @ wx
        z_y = Ninv @ rhs
        z_x = A.T @ z_y - wx
        tau_t = r[l - 1] + jnp.dot(z_y, hv[:m]) + jnp.dot(z_x, hv[m:])
        u_t = jnp.concatenate([z_y, z_x, tau_t[None]])
        head = u_t[:m] - v[:m]
        t = alpha * u_t[m:] + (1 - alpha) * u[m:] - v[m:]
        tail = _prox(t, lam)
        u_new = jnp.concatenate([head, tail])
        v_new = v.at[m:].add(tail - alpha * u_t[m:] - (1 - alpha) * u[m:])
        return (u_new, v_new)

    return jax.lax.fori_loop(0, T, body, (u, v))


def _sprint_kernel(scal_ref, A_ref, Ninv_ref, h_ref, g_ref, u_ref, v_ref,
                   uo_ref, vo_ref, *, T, m):
    scalars = (scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3])
    u, v = _sprint_ref(A_ref[:], Ninv_ref[:], h_ref[:], g_ref[:], scalars,
                       u_ref[:], v_ref[:], T, m)
    uo_ref[:] = u
    vo_ref[:] = v


@partial(jax.jit, static_argnames=("T", "interpret", "use_pallas"))
def fused_admm_sprint(A32, Ninv32, h32, g32, rho_y, g_th, lam, alpha,
                      u32, v32, T=32, interpret=False, use_pallas=None):
    """Run T f32 ADMM iterations in one launch; returns (u, v).

    A32 (m, n), Ninv32 (m, m) = (rho_y I + A A')^-1, h32/g32 (l,) the HSD
    rank-1 data (`abip.c:1917-1924`), lam = mu/beta.

    use_pallas=None resolves by backend (kernel on TPU, identical-math
    XLA fallback elsewhere).
    """
    if use_pallas is None:
        from .spmv_pallas import pallas_default

        use_pallas = pallas_default()
    m = A32.shape[0]
    scalars = jnp.stack([
        jnp.asarray(rho_y, jnp.float32),
        1.0 / (jnp.asarray(g_th, jnp.float32) + 1.0),
        jnp.asarray(lam, jnp.float32),
        jnp.asarray(alpha, jnp.float32),
    ])
    if not (use_pallas and _HAVE_PALLAS):
        return _sprint_ref(A32, Ninv32, h32, g32,
                           (scalars[0], scalars[1], scalars[2], scalars[3]),
                           u32, v32, T, m)
    return pl.pallas_call(
        partial(_sprint_kernel, T=T, m=m),
        out_shape=(
            jax.ShapeDtypeStruct(u32.shape, jnp.float32),
            jax.ShapeDtypeStruct(v32.shape, jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(scalars, A32, Ninv32, h32, g32, u32, v32)
