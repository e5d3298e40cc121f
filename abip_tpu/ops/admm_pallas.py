"""Fused ADMM sprint: T whole LP iterations in ONE Pallas kernel launch.

The measured wall on TPU is per-op latency, not FLOPs: one ADMM iteration
lowers to ~50 small sequential XLA ops and costs ~270-340 us almost
independently of batch size (tools/tpu_microbench.py, round 2).  This
kernel keeps A, the explicit normal-matrix inverse, and the iterate
resident in VMEM and runs T complete iterations -- projection (rank-1 tau
correction + fold + N^-1 apply + back-subst), barrier prox, dual update --
inside one `fori_loop`, so per-iteration cost approaches pure compute.

Mosaic layout (learned on real TPU v5e, round 2): everything is 2-D
(rows, 128)-tiled f32 in VMEM -- 1-D refs, `pl.ANY` loads, f64, and
concatenated (y|x|tau) vectors all fail to lower.  The HSD iterate is
therefore SPLIT into blocks: y/vy as (1, mp), x/vx as (1, np), tau/kappa
as loop-carried scalars; h and g likewise.  Zero padding is
contamination-free: A/Ninv are zero-padded (so z pads stay zero) and every
reduction runs against zero-padded h/g.

f32 only (Mosaic has no f64): intended as the inner engine of the
anchored mixed-precision scheme -- sprint T f32 iterations on VMEM, then
re-anchor/correct in f64 outside (see `parallel/batched.py` docstring).
Sized for problems whose operands fit VMEM (A: mp x np f32 <= ~8 MB).

Reference hot loop this fuses: `src/abip-lp/src/abip.c:2131-2215`
(project_lin_sys :539, project_barrier :717, update_dual_vars :567).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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
    """Reference implementation (plain jnp) of the T-iteration sprint.

    Traced under default_matmul_precision('highest'): on TPU the default
    f32 matmul rounds operands to bf16 (see _dot_t), which diverges the
    trajectory -- the fallback must match the kernel's true-f32 math."""
    with jax.default_matmul_precision("highest"):
        return _sprint_ref_inner(A, Ninv, h, g, scalars, u, v, T, m)


def _sprint_ref_inner(A, Ninv, h, g, scalars, u, v, T, m):
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


def _dot_t(a, M):
    """(1, k) x (r, k) -> (1, r): contract a's lanes with M's rows.

    Precision.HIGHEST is load-bearing: the v5e MXU rounds f32 operands
    to bf16 by default (~2e-3 relative error), which destroys the
    cancellation-heavy tau_t dot and blows up the sprint trajectory
    (measured on hardware: tau_t -23.4 vs the true 1.89 after ONE
    iteration).  HIGHEST selects the multi-pass f32 path."""
    return jax.lax.dot_general(a, M, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _dot(a, M):
    """(1, r) x (r, k) -> (1, k).  See _dot_t on Precision.HIGHEST."""
    return jax.lax.dot_general(a, M, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _sprint_kernel(scal_ref, A_ref, Ninv_ref, hy_ref, hx_ref, gy_ref,
                   gx_ref, y_ref, x_ref, vy_ref, vx_ref,
                   yo_ref, xo_ref, vxo_ref, sco_ref, *, T):
    rho_y = scal_ref[0]
    inv_gth1 = scal_ref[1]
    lam = scal_ref[2]
    alpha = scal_ref[3]
    A = A_ref[:]          # (mp, np) zero-padded
    Ninv = Ninv_ref[:]    # (mp, mp) zero-padded
    hy = hy_ref[:]        # (1, mp) zero-padded
    hx = hx_ref[:]        # (1, np)
    gy = gy_ref[:]
    gx = gx_ref[:]
    vy = vy_ref[:]        # constant: the y-block dual never updates

    def body(_, carry):
        y, x, vx, tau, kappa = carry
        ry = y + vy
        rx = x + vx
        rtau = tau + kappa
        qy = rho_y * ry - rtau * hy
        qx = rx - rtau * hx
        coef = (jnp.sum(qy * gy) + jnp.sum(qx * gx)) * inv_gth1
        qy = qy - coef * hy
        qx = qx - coef * hx
        wx = -qx
        rhs = qy + _dot_t(wx, A)          # (1, mp)
        z_y = _dot_t(rhs, Ninv)           # Ninv symmetric
        z_x = _dot(z_y, A) - wx           # (1, np)
        tau_t = rtau + jnp.sum(z_y * hy) + jnp.sum(z_x * hx)
        y_new = z_y - vy
        rel_x = alpha * z_x + (1.0 - alpha) * x
        rel_tau = alpha * tau_t + (1.0 - alpha) * tau
        x_new = _prox(rel_x - vx, lam)
        tau_new = _prox(rel_tau - kappa, lam)
        vx_new = vx + x_new - rel_x
        kappa_new = kappa + tau_new - rel_tau
        return (y_new, x_new, vx_new, tau_new, kappa_new)

    y, x, vx, tau, kappa = jax.lax.fori_loop(
        0, T, body,
        (y_ref[:], x_ref[:], vx_ref[:], scal_ref[4], scal_ref[5]))
    yo_ref[:] = y
    xo_ref[:] = x
    vxo_ref[:] = vx
    sco_ref[0] = tau
    sco_ref[1] = kappa


def _pad128(k):
    return -(-k // 128) * 128


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
    m, n = A32.shape
    l = m + n + 1
    scalars = jnp.stack([
        jnp.asarray(rho_y, jnp.float32),
        1.0 / (jnp.asarray(g_th, jnp.float32) + 1.0),
        jnp.asarray(lam, jnp.float32),
        jnp.asarray(alpha, jnp.float32),
        u32[l - 1].astype(jnp.float32),
        v32[l - 1].astype(jnp.float32),
    ])
    if not (use_pallas and _HAVE_PALLAS):
        return _sprint_ref(A32, Ninv32, h32, g32,
                           (scalars[0], scalars[1], scalars[2], scalars[3]),
                           u32, v32, T, m)

    mp, np_ = _pad128(m), _pad128(n)

    def pad_vec(x, k, kp):
        return jnp.zeros((1, kp), jnp.float32).at[0, :k].set(
            x.astype(jnp.float32))

    def pad_mat(M, r, c, rp, cp):
        return jnp.zeros((rp, cp), jnp.float32).at[:r, :c].set(
            M.astype(jnp.float32))

    A_p = pad_mat(A32, m, n, mp, np_)
    Ninv_p = pad_mat(Ninv32, m, m, mp, mp)
    hy = pad_vec(h32[:m], m, mp)
    hx = pad_vec(h32[m : m + n], n, np_)
    gy = pad_vec(g32[:m], m, mp)
    gx = pad_vec(g32[m : m + n], n, np_)
    y0 = pad_vec(u32[:m], m, mp)
    x0 = pad_vec(u32[m : m + n], n, np_)
    vy0 = pad_vec(v32[:m], m, mp)
    vx0 = pad_vec(v32[m : m + n], n, np_)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    y, x, vx, sc = pl.pallas_call(
        partial(_sprint_kernel, T=T),
        out_shape=(
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.float32),
        ),
        in_specs=[smem] + [vmem] * 10,
        out_specs=(vmem, vmem, vmem, smem),
        interpret=interpret,
    )(scalars, A_p, Ninv_p, hy, hx, gy, gx, y0, x0, vy0, vx0)
    u_out = jnp.concatenate([y[0, :m], x[0, :n], sc[0][None]])
    v_out = jnp.concatenate([v32[:m].astype(jnp.float32), vx[0, :n],
                             sc[1][None]])
    return u_out, v_out
