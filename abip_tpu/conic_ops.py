"""Pure-functional conic DR step math shared by the conic drivers.

The conic analogue of `hsd.py`: the algorithm kernels of the reference
QCP core (`/root/reference/src/abip-qcp/source/abip.c`,
`source/qcp_config.c`) as pure jnp functions of explicit operands, so the
host-driven driver (`qcp.py`) and the fully-on-device batched solver
(`parallel/batched_qcp.py`) share one implementation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .cones import ConeLayout, cone_barrier_prox

EPS_TOL = 1e-18


class ConicResiduals(NamedTuple):
    res_pri: jnp.ndarray
    res_dual: jnp.ndarray
    rel_gap: jnp.ndarray
    res_dif: jnp.ndarray
    error_ratio: jnp.ndarray
    res_infeas: jnp.ndarray
    res_unbdd: jnp.ndarray
    pobj: jnp.ndarray
    dobj: jnp.ndarray
    tau: jnp.ndarray
    kap: jnp.ndarray
    Ax_b_norm: jnp.ndarray
    Qx_ATy_c_s_norm: jnp.ndarray

    @staticmethod
    def init(dtype):
        big = jnp.full((), 1e8, dtype)
        z = jnp.ones((), dtype)
        nan = jnp.full((), jnp.nan, dtype)
        return ConicResiduals(big, big, big, big, big, nan, nan, nan, nan,
                              z, z, big, big)


def projection(u, v, solve_fn, rho, r_vec, a_coef, Q_times, m, n, k,
               err_ratio=None):
    """DR projection with quadratic-formula tau (`source/abip.c:186-254`).

    solve_fn(w_y, w_x, k, warm[, err_ratio]) solves the block system
    [[R_y, A],[-A', Q+R_x]] z = w.  `err_ratio` (when given) feeds the
    per-problem PCG tolerance ladders (`lasso_config.c:592-619`,
    `svm_config.c:669-696`).
    """
    l = m + n + 1
    rho_head = rho[: m + n]
    w_vec = rho_head * (u[: m + n] + v[: m + n])
    eta = rho[l - 1] * (u[l - 1] + v[l - 1])
    if err_ratio is None:
        z_y, z_x, its = solve_fn(w_vec[:m], w_vec[m:], k, u[m : m + n])
    else:
        z_y, z_x, its = solve_fn(w_vec[:m], w_vec[m:], k, u[m : m + n],
                                 err_ratio)
    p = jnp.concatenate([z_y, z_x])
    b_coef = jnp.dot(r_vec, w_vec) - 2.0 * jnp.dot(r_vec, rho_head * p) - eta
    c_coef = -jnp.dot(z_x, Q_times(z_x))
    disc = jnp.maximum(b_coef * b_coef - 4.0 * a_coef * c_coef, 0.0)
    tau_t = (-b_coef + jnp.sqrt(disc)) / (2.0 * a_coef)
    tau_t = jnp.where(k > 0, tau_t, 1.0)
    u_t = jnp.concatenate([p - tau_t * r_vec, tau_t[None]])
    return u_t, its


def barrier_and_dual(u, v, u_t, lam, rho_tail, layout: ConeLayout, alpha, m, n):
    """`solve_barrier_subproblem` + `update_dual_vars`
    (`source/abip.c:314-413`): DR with over-relaxation."""
    l = m + n + 1
    rel_ut = alpha * u_t + (1.0 - alpha) * u
    t = rel_ut - v
    head = t[:m]
    lam_tail = lam / rho_tail  # (n+1,): x block + tau
    tail = cone_barrier_prox(t[m : m + n], lam_tail[:n], layout)
    tau_in = t[l - 1]
    tau = 0.5 * (tau_in + jnp.sqrt(tau_in * tau_in + 4.0 * lam_tail[n]))
    u_new = jnp.concatenate([head, tail, tau[None]])
    v_new = v + u_new - rel_ut
    return u_new, v_new


def inner_conv_check(u, v_origin, matvec, rmatvec, Q_times, b, c, m, n):
    """HSD-operator mismatch (`qcp_inner_conv_check`,
    `qcp_config.c:518-557`)."""
    l = m + n + 1
    y, x, tau = u[:m], u[m : m + n], u[l - 1]
    Mu_y = matvec(x)
    Mu_x = -rmatvec(y) + Q_times(x)
    Qu_y = Mu_y - b * tau
    Qu_x = Mu_x + c * tau
    Mu = jnp.concatenate([Mu_y, Mu_x])
    Qu_tau = (
        -jnp.dot(u[: m + n], Mu) / jnp.where(jnp.abs(tau) < EPS_TOL, EPS_TOL, tau)
        + jnp.dot(y, b)
        - jnp.dot(x, c)
    )
    Qu = jnp.concatenate([Qu_y, Qu_x, Qu_tau[None]])
    diff = Qu - v_origin
    return jnp.linalg.norm(diff) / (
        1.0 + jnp.linalg.norm(Qu) + jnp.linalg.norm(v_origin)
    )


def conic_residuals(u, v_origin, prev: ConicResiduals, matvec, rmatvec,
                    Q_times, b, c, D, E, sc_b, sc_c, scale, nm_inf_b,
                    nm_inf_c, eps_p, eps_d, eps_g, m, n):
    """`calc_qcp_residuals` (`qcp_config.c:562-691`): unscaled inf-norm
    residuals + infeasibility/unboundedness certificates."""
    l = m + n + 1
    dtype = u.dtype
    tau = jnp.abs(u[l - 1])
    tau_safe = jnp.maximum(tau, EPS_TOL)
    kap = jnp.abs(v_origin[l - 1]) / (scale * sc_c * sc_b)
    y = u[:m] / tau_safe
    x = u[m : m + n] / tau_safe
    s = v_origin[m : m + n] / tau_safe

    Ax = matvec(x)
    Ax_b = Ax - b
    Ax_b_norm = jnp.max(jnp.abs(Ax_b))
    DAx = D * Ax
    DAx_b = D * Ax_b
    res_pri = jnp.max(jnp.abs(DAx_b)) / (
        sc_b + jnp.maximum(jnp.max(jnp.abs(DAx)), sc_b * nm_inf_b)
    )

    Qx = Q_times(x)
    xQx_2 = jnp.dot(x, Qx) / (2.0 * sc_b * sc_c)
    ATy = rmatvec(y)
    dres_vec = Qx - ATy + c - s
    Qx_ATy_c_s_norm = jnp.max(jnp.abs(dres_vec))
    res_dual = jnp.max(jnp.abs(E * dres_vec)) / (
        sc_c + jnp.maximum(sc_c * nm_inf_c, jnp.max(jnp.abs(E * Qx)))
    )

    cTx = jnp.dot(c, x) / (sc_b * sc_c)
    bTy = jnp.dot(b, y) / (sc_b * sc_c)
    rel_gap = jnp.abs(2.0 * xQx_2 + cTx - bTy) / (
        1.0 + jnp.maximum(2.0 * xQx_2, jnp.maximum(jnp.abs(cTx), jnp.abs(bTy)))
    )
    pobj = xQx_2 + cTx
    dobj = -xQx_2 + bTy

    res_dif = jnp.maximum(
        jnp.maximum(jnp.abs(res_pri - prev.res_pri),
                    jnp.abs(res_dual - prev.res_dual)),
        jnp.abs(rel_gap - prev.rel_gap),
    )
    error_ratio = jnp.maximum(
        res_pri / eps_p, jnp.maximum(res_dual / eps_d, rel_gap / eps_g)
    )

    ctx_u = jnp.dot(c, u[m : m + n])
    nan = jnp.full((), jnp.nan, dtype)
    unb_num = jnp.maximum(jnp.linalg.norm(E * Qx * tau),
                          jnp.linalg.norm(DAx * tau))
    res_unbdd = jnp.where(ctx_u < 0, unb_num / jnp.where(ctx_u < 0, -ctx_u, 1.0), nan)
    bty_u = jnp.dot(b, u[:m])
    inf_num = jnp.linalg.norm(E * (ATy * tau + s * tau))
    res_infeas = jnp.where(bty_u > 0, inf_num / jnp.where(bty_u > 0, bty_u, 1.0), nan)

    return ConicResiduals(
        res_pri=res_pri, res_dual=res_dual, rel_gap=rel_gap,
        res_dif=res_dif, error_ratio=error_ratio,
        res_infeas=res_infeas, res_unbdd=res_unbdd,
        pobj=pobj, dobj=dobj, tau=tau, kap=kap,
        Ax_b_norm=Ax_b_norm, Qx_ATy_c_s_norm=Qx_ATy_c_s_norm,
    )


def conic_converged_code(r: ConicResiduals, eps_p, eps_d, eps_g, eps_inf,
                         eps_unb, err_dif, total_pos):
    """`has_converged` (`source/abip.c:750-777`)."""
    solved = (r.res_pri < eps_p) & (r.res_dual < eps_d) & (r.rel_gap < eps_g)
    stag = r.res_dif < err_dif * jnp.maximum(eps_p, jnp.maximum(eps_d, eps_g))
    unbdd = (r.res_unbdd < eps_unb) & total_pos
    infeas = (r.res_infeas < eps_inf) & total_pos
    return jnp.where(
        solved, 1,
        jnp.where(stag, 2, jnp.where(unbdd, -1, jnp.where(infeas, -2, 0))),
    ).astype(jnp.int32)


def adjust_barrier_device(mu, error_ratio, eps_min, psi):
    """Device (jnp) version of `adjust_barrier` (`source/abip.c:994-1071`):
    the sigma/gamma bucket tables as searchsorted lookups.
    Returns (mu_new, tol_inner)."""
    ratio = mu / eps_min
    # gamma by mu/eps ratio buckets (edges ascending for searchsorted);
    # NOTE the reference quirk: ratio > 100 falls through to the final
    # else and gets 0.5 (`source/abip.c:1002-1030`) -- replicated.
    ratio_edges = jnp.asarray([5e-5, 1e-4, 5e-4, 1e-3, 5e-3, 1e-2, 5e-2,
                               1e-1, 0.5, 1.0, 5.0, 10.0, 50.0, 100.0])
    ratio_vals = jnp.asarray([0.5, 0.6, 0.6, 0.7, 0.7, 0.8, 0.8, 0.9, 0.9,
                              1.0, 1.1, 1.2, 1.3, 1.5, 0.5])
    gamma = ratio_vals[jnp.searchsorted(ratio_edges, ratio, side="right")]

    mr = error_ratio
    mr_edges = jnp.asarray([1.5, 2.0, 3.0, 4.0, 6.0, 8.0, 12.0, 15.0, 18.0,
                            22.0])
    gmul_vals = jnp.asarray([2.4, 2.6, 2.8, 3.2, 3.4, 3.4, 3.6, 3.8, 4.0,
                             4.2, 4.4])
    sig_vals = jnp.asarray([0.85, 0.85, 0.85, 0.83, 0.82, 0.81, 0.8, 0.8,
                            0.8, 0.8, 0.8])
    idx = jnp.searchsorted(mr_edges, mr, side="right")
    gamma = gamma * gmul_vals[idx]
    sigma = sig_vals[idx] * 0.2

    mu_new = sigma * mu
    return mu_new, gamma * mu_new**psi
