"""Adaptive penalty (beta) via the Barzilai-Borwein spectral method.

Re-derivation of the reference's adaptive module
(`/root/reference/src/abip-lp/src/adaptive.c:34-256`): between barrier
stages, run up to `adaptive_lookback` TRIAL rounds of two ADMM steps each
(the trial iterates are discarded), estimate the spectral stepsizes

    alpha_SD = <dv,dv>/<dut,dv>,   alpha_MG = <dut,dv>/<dut,dut>
    gamma_SD = <dv,dv>/<du,dv>,    gamma_MG = <du,dv>/<du,du>

pick the safeguarded stepsize (MG if 2*MG > SD else SD - MG/2), gate by
the correlations `alpha_cor`/`gamma_cor` against `eps_cor`, and fix the
penalty at beta = sqrt(alpha_ss * gamma_ss) (or the surviving one).  The
loop stops early when |beta - beta_prev| <= eps_pen (`adaptive.c:225-229`).

The whole search is one jitted `lax.while_loop`; each trial costs two KKT
solves, exactly like the reference.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hsd

_TINY = 1e-300


class _BBState(NamedTuple):
    u_prev: jnp.ndarray
    v_prev: jnp.ndarray
    beta_prev: jnp.ndarray
    beta: jnp.ndarray
    i: jnp.ndarray
    done: jnp.ndarray


def bb_update_beta(u, v, mu, h, g, g_th, rho_y, alpha, solve_fn, m, n,
                   lookback, eps_cor, eps_pen):
    """Return the new penalty beta (`update_adapt_params`)."""
    l = m + n + 1
    dtype = u.dtype
    mu = jnp.asarray(mu, dtype)

    def admm_trial(u_in, v_in, beta_prev):
        u_t, _ = hsd.project_lin_sys(u_in, v_in, h, g, g_th, rho_y,
                                     solve_fn, 0, m, n)
        lam = mu / beta_prev
        return hsd.admm_update(u_in, v_in, u_in, u_t, lam, alpha, m), u_t

    def body(s: _BBState):
        (u1, v1), ut1 = admm_trial(s.u_prev, s.v_prev, s.beta_prev)
        (u2, v2), ut2 = admm_trial(u1, v1, s.beta_prev)

        # spectral deltas (`adaptive.c:154-168`)
        d_ut = 2.0 * v1 + u2 - u1 - v2 - s.v_prev
        d_u = u1 - u2
        d_v = (alpha - 1.0) * (u2 - u1) + v2 - v1

        utut = jnp.dot(d_ut, d_ut)
        utv = jnp.dot(d_ut, d_v)
        uu = jnp.dot(d_u, d_u)
        vv = jnp.dot(d_v, d_v)
        uv = jnp.dot(d_u, d_v)
        nm_ut = jnp.sqrt(utut)
        nm_u = jnp.sqrt(uu)
        nm_v = jnp.sqrt(vv)

        alpha_SD = vv / (utv + _TINY)
        alpha_MG = utv / (utut + _TINY)
        gamma_SD = vv / (uv + _TINY)
        gamma_MG = uv / (uu + _TINY)

        alpha_ss = jnp.where(2 * alpha_MG > alpha_SD, alpha_MG,
                             alpha_SD - 0.5 * alpha_MG)
        gamma_ss = jnp.where(2 * gamma_MG > gamma_SD, gamma_MG,
                             gamma_SD - 0.5 * gamma_MG)

        alpha_cor = utv / (nm_v * nm_ut + _TINY)
        gamma_cor = uv / (nm_v * nm_u + _TINY)

        ok_a = alpha_cor > eps_cor
        ok_g = gamma_cor > eps_cor
        beta = jnp.where(
            ok_a & ok_g, jnp.sqrt(jnp.abs(alpha_ss * gamma_ss)),
            jnp.where(ok_a, alpha_ss,
                      jnp.where(ok_g, gamma_ss, s.beta_prev)),
        )

        diff = jnp.abs(beta - s.beta_prev)
        converged = (diff > 0) & (diff <= eps_pen)
        beta_out = jnp.where(converged, 0.5 * (beta + s.beta_prev), beta)

        # continue searching: re-center the trial point (`adaptive.c:230-247`)
        moved = diff > eps_pen
        beta_prev_next = jnp.where(moved, beta, s.beta_prev)
        u_prev_next = u1
        v_tail_reset = (mu / beta_prev_next) / jnp.maximum(u1[m:], _TINY)
        v_prev_next = jnp.where(
            moved,
            jnp.concatenate([v1[:m], v_tail_reset]),
            v1,
        )
        return _BBState(
            u_prev=u_prev_next, v_prev=v_prev_next,
            beta_prev=beta_prev_next, beta=beta_out,
            i=s.i + 1, done=converged,
        )

    def cond(s: _BBState):
        return (~s.done) & (s.i < lookback)

    init = _BBState(
        u_prev=u, v_prev=v,
        beta_prev=jnp.ones((), dtype), beta=jnp.zeros((), dtype),
        i=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool),
    )
    out = jax.lax.while_loop(cond, body, init)
    # guard degenerate outcomes: keep beta positive and finite
    beta = out.beta
    bad = ~jnp.isfinite(beta) | (beta <= 0)
    return jnp.where(bad, jnp.ones((), dtype), beta)
