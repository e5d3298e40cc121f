"""Pure-functional HSD/ADMM step math shared by all LP drivers.

These are the algorithm kernels of the reference LP core
(`/root/reference/src/abip-lp/src/abip.c`) as pure jnp functions of
explicit operands -- no workspace state -- so the host-driven solver
(`lp.py`), the fully-on-device batched solver (`parallel/batched.py`) and
the sharded solver compose them under jit/vmap/shard_map without
duplication.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

EPS_TOL = 1e-18
_TINY = 1e-300


def safediv_pos(x, y):
    """SAFEDIV_POS from `glbopts.h:157-158`."""
    return jnp.where(y < EPS_TOL, x / EPS_TOL, x / y)


def barrier_prox(t, lam):
    """Log-barrier prox: positive root of u^2 - t*u - lam = 0
    (`abip.c:717-748`), with the cancellation-free negative branch
    (`cones.c:279-289`)."""
    pos = 0.5 * (t + jnp.sqrt(t * t + 4.0 * lam))
    neg = 2.0 * lam / (-t * (1.0 + jnp.sqrt(1.0 + 4.0 * lam / (t * t + _TINY))) + _TINY)
    return jnp.where(t >= 0, pos, neg)


def project_lin_sys(u, v, h, g, g_th, rho_y, solve_fn, k, m, n):
    """u_t = (I+Q)^-1 (u+v) via cached KKT factor + rank-1 tau correction
    (`abip.c:539-562`).  `solve_fn(w_y, w_x, k, warm)` solves
    [[rho_y I, A],[A', -I]] z = w."""
    l = m + n + 1
    r = u + v
    q = jnp.concatenate([rho_y * r[:m], r[m : m + n]])
    r_tau = r[l - 1]
    q = q - r_tau * h
    q = q - (jnp.dot(q, g) / (g_th + 1.0)) * h
    z_y, z_x, its = solve_fn(q[:m], -q[m:], k, u[:m])
    z = jnp.concatenate([z_y, z_x])
    tau_t = r_tau + jnp.dot(z, h)
    return jnp.concatenate([z, tau_t[None]]), its


def admm_update(u, v, u_prev, u_t, lam, alpha, m):
    """project_barrier (`abip.c:717-748`) + update_dual_vars (`:567-584`)."""
    head = u_t[:m] - v[:m]
    t = alpha * u_t[m:] + (1 - alpha) * u_prev[m:] - v[m:]
    tail = barrier_prox(t, lam)
    u_new = jnp.concatenate([head, tail])
    v_new = v.at[m:].add(u_new[m:] - alpha * u_t[m:] - (1 - alpha) * u_prev[m:])
    return u_new, v_new


def admm_update_half(u, v, u_t, lam, m):
    """half_update variant (`abip.c:663-711`)."""
    v_half = v + 0.5 * (u - u_t)
    w = u_t - v_half
    tail = barrier_prox(w[m:], lam)
    u_new = jnp.concatenate([w[:m], tail])
    v_new = v_half + (u_new - u_t)
    return u_new, v_new


def q_norm_resd(u, v, matvec, rmatvec, b, c, m, n):
    """HSD-operator residual of one iterate (`abip.c:1951-1996`)."""
    l = m + n + 1
    y, x, tau = u[:m], u[m : m + n], u[l - 1]
    s, kap = v[m : m + n], v[l - 1]
    q1 = matvec(x) - b * tau
    q2 = rmatvec(y) + s - c * tau
    q3 = jnp.dot(y, b) - jnp.dot(x, c) - kap
    qres = jnp.sum(q1 * q1) + jnp.sum(q2 * q2) + q3 * q3
    norm = 1.0 + jnp.sqrt(jnp.sum(u * u) + jnp.sum(v * v))
    return jnp.sqrt(qres) / norm


class LPResiduals(NamedTuple):
    res_pri: jnp.ndarray
    res_dual: jnp.ndarray
    rel_gap: jnp.ndarray
    res_infeas: jnp.ndarray
    res_unbdd: jnp.ndarray
    tau: jnp.ndarray
    kap: jnp.ndarray
    bt_y_by_tau: jnp.ndarray
    ct_x_by_tau: jnp.ndarray

    @staticmethod
    def init(dtype):
        z = jnp.zeros((), dtype)
        nan = jnp.full((), jnp.nan, dtype)
        return LPResiduals(nan, nan, nan, nan, nan, z, z, z, z)


def lp_residuals(u, v, matvec, rmatvec, b, c, pr_scale, dr_scale, obj_scale,
                 nm_b, nm_c, m, n) -> LPResiduals:
    """`calc_residuals` (`abip.c:458-535`) on a chosen iterate, in original
    (unscaled) units via the pr/dr scale vectors."""
    l = m + n + 1
    dtype = u.dtype
    y, x, tau_raw = u[:m], u[m : m + n], u[l - 1]
    s = v[m : m + n]
    tau = jnp.abs(tau_raw)
    kap = jnp.abs(v[l - 1]) / obj_scale

    pr = matvec(x)
    nm_A_x = jnp.linalg.norm(pr * pr_scale)
    pres = jnp.linalg.norm((pr - b * tau) * pr_scale)

    dr = rmatvec(y) + s
    nm_At_ys = jnp.linalg.norm(dr * dr_scale)
    dres = jnp.linalg.norm((dr - c * tau) * dr_scale)

    bty = jnp.dot(y, b) / obj_scale
    ctx = jnp.dot(x, c) / obj_scale
    nan = jnp.full((), jnp.nan, dtype)
    res_infeas = jnp.where(bty > 0, nm_b * nm_At_ys / jnp.where(bty > 0, bty, 1.0), nan)
    res_unbdd = jnp.where(ctx < 0, nm_c * nm_A_x / jnp.where(ctx < 0, -ctx, 1.0), nan)

    bt_y = safediv_pos(bty, tau)
    ct_x = safediv_pos(ctx, tau)
    return LPResiduals(
        res_pri=safediv_pos(pres / (1 + nm_b), tau),
        res_dual=safediv_pos(dres / (1 + nm_c), tau),
        rel_gap=jnp.abs(ct_x - bt_y) / (1 + jnp.abs(ct_x) + jnp.abs(bt_y)),
        res_infeas=res_infeas,
        res_unbdd=res_unbdd,
        tau=tau,
        kap=kap,
        bt_y_by_tau=bty,
        ct_x_by_tau=ctx,
    )


def lp_converged_code(r: LPResiduals, eps, pfeasopt, total_pos):
    """`has_converged` (`abip.c:1613-1641`) as an int32 status code.
    NaN certificate residuals compare False."""
    solved = (r.res_pri < eps) & ((r.res_dual < eps) | pfeasopt) & (r.rel_gap < eps)
    unbdd = (r.res_unbdd < eps) & total_pos
    infeas = (r.res_infeas < eps) & total_pos
    return jnp.where(
        solved, 1, jnp.where(unbdd, -1, jnp.where(infeas, -2, 0))
    ).astype(jnp.int32)


def reinit_rebalance(u, v, sigma, m):
    """`reinitialize_vars(w, 0)` (`abip.c:996-1075`): shrink the larger of
    (u_i, v_i) by sigma on the barrier coordinates."""
    cond = u[m:] > v[m:]
    v_new = v.at[m:].set(jnp.where(cond, sigma * v[m:], v[m:]))
    u_new = u.at[m:].set(jnp.where(cond, u[m:], sigma * u[m:]))
    return u_new, v_new


def mu_update_hybrid(mu, u, v, m, eps, hybrid_thresh, dynamic_x, dynamic_eta,
                     shrink_second):
    """Device-side hybrid mu rule (`abip.c:2251-2277` with defaults
    hybrid_mu=1, dynamic_sigma=-1, dynamic_sigma_second=0.5): aggressive
    `mu *= min(x*mu, mu^eta)` until mu < hybrid_thresh*eps, then the LOQO
    rule -- both pure jnp so the whole outer loop can live on device."""
    # aggressive (`abip.c:982-992`)
    mu_aggr = mu * jnp.minimum(dynamic_x * mu, mu ** dynamic_eta)
    # LOQO (`abip.c:930-977`)
    xs = u[m:] * v[m:]
    minxs = jnp.min(xs)
    mean = jnp.mean(xs)
    ksi = minxs / jnp.maximum(mean, EPS_TOL)
    sigma = jnp.minimum(0.05 * (1 - ksi) / jnp.maximum(ksi, 1e-16), 2.0)
    sigma = jnp.maximum(0.1 * sigma ** 3, shrink_second)
    sigma = jnp.where(minxs <= 0, jnp.maximum(shrink_second, 0.1), sigma)
    mu_loqo = mu * sigma
    return jnp.where(mu < hybrid_thresh * eps, mu_loqo, mu_aggr)
