"""ABIP-TPU linear programming driver.

Solves  min c'x  s.t. Ax = b, x >= 0  by the ADMM-based interior point
method on the homogeneous self-dual (HSD) embedding.

TPU-first re-design of the reference LP core
(`/root/reference/src/abip-lp/src/abip.c`): the entire inner ADMM loop --
KKT projection, barrier prox, dual update, restart/averaging, inner
termination and convergence checks -- is ONE jitted `lax.while_loop` on
device (SURVEY.md section 7); the outer IPM loop runs on the host at a rate
of one sync per barrier stage, where the mu schedule (a table of host-side
branches, `abip.c:753-992`) lives naturally.

Iterates: u = (y, x, tau), v = (0, s, kappa), length l = m + n + 1
(`abip.c:2076`, `include/abip.h:136-150`).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .problem import LinearOperator
from .linsys import make_solver
from .scaling import equilibrate, ScalingData
from .settings import Settings, Status
from . import schedules
from . import hsd
from .hsd import LPResiduals as Residuals

EPS_TOL = hsd.EPS_TOL
INDETERMINATE_TOL = 1e-9


class InnerState(NamedTuple):
    """Carry of the jitted inner ADMM loop."""

    u: jnp.ndarray
    v: jnp.ndarray
    u_prev: jnp.ndarray
    u_avg: jnp.ndarray        # restart accumulator (`abip.c:587-630`)
    v_avg: jnp.ndarray
    u_sum: jnp.ndarray        # cumulative average (`abip.c:635-659`)
    v_sum: jnp.ndarray
    u_avgcon: jnp.ndarray
    v_avgcon: jnp.ndarray
    j: jnp.ndarray            # inner iteration counter
    k: jnp.ndarray            # global ADMM iteration counter
    qres: jnp.ndarray         # last inner-criterion value
    avg_criterion: jnp.ndarray  # bool: averaged iterate is the candidate
    status: jnp.ndarray       # Status code, 0 while running
    res: Residuals
    cg_iters: jnp.ndarray     # accumulated linsys aux iterations


@dataclass
class LPSolution:
    x: np.ndarray
    y: np.ndarray
    s: np.ndarray
    status: int
    status_name: str
    pobj: float
    dobj: float
    res_pri: float
    res_dual: float
    rel_gap: float
    res_infeas: float
    res_unbdd: float
    ipm_iters: int
    admm_iters: int
    setup_time: float
    solve_time: float
    avg_cg_iters: float = 0.0


class LPWorkspace:
    """Setup-once state: scaled data, cached factorization, jitted kernels.

    Mirrors the `ABIP(init)` / `ABIP(solve)` split (`abip.c:2341-2422`) so a
    single factorization can serve repeated solves.
    """

    def __init__(self, A, b, c, settings: Settings = Settings()):
        settings = settings.resolved()
        settings.validate()
        t0 = time.perf_counter()
        self.stgs = settings
        dtype = jnp.dtype(settings.dtype)
        self.dtype = dtype

        import scipy.sparse as sps

        is_sparse = sps.issparse(A)
        if not is_sparse:
            A = jnp.asarray(A, dtype)
        b = jnp.asarray(b, dtype)
        c = jnp.asarray(c, dtype)
        if A.ndim != 2:
            raise ValueError(f"A must be 2-D; got shape {A.shape}")
        m, n = A.shape
        if m <= 0 or n <= 0:
            raise ValueError(f"m and n must be positive; got m={m}, n={n}")
        if b.shape != (m,):
            raise ValueError(f"b must have shape ({m},) to match A; got {b.shape}")
        if c.shape != (n,):
            raise ValueError(f"c must have shape ({n},) to match A; got {c.shape}")
        self.m, self.n = m, n
        self.l = m + n + 1
        nnz = int(A.nnz) if is_sparse else int(jnp.sum(A != 0))
        self.sp = nnz / (m * n)

        # norms of the ORIGINAL data (used by certificates, `abip.c:1855-1856`)
        self.nm_b = jnp.linalg.norm(b)
        self.nm_c = jnp.linalg.norm(c)

        # -- equilibration (`linsys/common.c:150-565`) -----------------------
        if settings.normalize:
            if is_sparse:
                from .scaling import equilibrate_sparse

                A_s, scal = equilibrate_sparse(A, settings)
            else:
                A_s, scal = equilibrate(A, settings)
            # b/c normalization (`normalize.c:11-40`)
            c_s = c / scal.E
            sc_c = scal.mean_norm_row / jnp.maximum(jnp.linalg.norm(c_s), 1e-3)
            b_s = b / scal.D
            sc_b = scal.mean_norm_col / jnp.maximum(jnp.linalg.norm(b_s), 1e-3)
            c_s = c_s * sc_c * settings.scale
            b_s = b_s * sc_b * settings.scale
        else:
            A_s, b_s, c_s = A, b, c
            scal = ScalingData(
                D=jnp.ones((m,), dtype),
                E=jnp.ones((n,), dtype),
                mean_norm_row=jnp.ones((), dtype),
                mean_norm_col=jnp.ones((), dtype),
            )
            sc_b = jnp.ones((), dtype)
            sc_c = jnp.ones((), dtype)
        self.scal, self.sc_b, self.sc_c = scal, sc_b, sc_c
        self.b, self.c = b_s, c_s

        if is_sparse:
            # block-sparse operator (ops/spmv_pallas.py); for modest m the
            # normal matrix is assembled host-side so the direct backend
            # still applies (the sparse-A analogue of `direct.c:218-270`)
            self.A_op = LinearOperator.from_scipy_sparse(A_s, dtype=dtype)
            normal = None
            if m <= 4096 and settings.linsys in ("auto", "dense"):
                N = (A_s @ A_s.T).toarray()
                N[np.diag_indices(m)] += settings.rho_y
                normal = jnp.asarray(N, dtype)
            self.solver = make_solver(self.A_op, m, n, settings.rho_y,
                                      settings, normal_matrix=normal)
        else:
            self.A_op = LinearOperator.from_dense(A_s, nnz=nnz)
            self.solver = make_solver(self.A_op, m, n, settings.rho_y, settings)

        # -- HSD rank-1 data: h = (-b; c), g = K^-1 h (x-part negated),
        #    g_th = h.g   (`abip.c:1917-1924`) -------------------------------
        # The reference solves K g = h then negates g[m:] (`abip.c:1922-1923`).
        h = jnp.concatenate([-b_s, c_s])
        g_y, g_x, _ = self.solver.solve(h[:m], h[m:], iter_count=-1)
        g = jnp.concatenate([g_y, -g_x])
        self.h, self.g = h, g
        self.g_th = jnp.dot(h, g)

        self._build_kernels()
        self.setup_time = time.perf_counter() - t0

    # ------------------------------------------------------------------ #
    # jitted kernels                                                     #
    # ------------------------------------------------------------------ #
    def _build_kernels(self):
        m, n, l = self.m, self.n, self.l
        stgs = self.stgs
        A_op, solver = self.A_op, self.solver
        h, g, g_th = self.h, self.g, self.g_th
        b, c = self.b, self.c
        D, E = self.scal.D, self.scal.E
        sc_b, sc_c, scale = self.sc_b, self.sc_c, stgs.scale
        nm_b, nm_c = self.nm_b, self.nm_c
        alpha = stgs.alpha
        rho_y = stgs.rho_y
        normalize = stgs.normalize
        dtype = self.dtype

        pr_scale = (D / (sc_b * scale)) if normalize else jnp.ones((m,), dtype)
        dr_scale = (E / (sc_c * scale)) if normalize else jnp.ones((n,), dtype)
        obj_scale = (scale * sc_c * sc_b) if normalize else jnp.ones((), dtype)

        def solve_fn(w_y, w_x, k, warm):
            return solver.solve(w_y, w_x, iter_count=k, warm_start=warm)

        def q_norm_resd(u, v):
            return hsd.q_norm_resd(u, v, A_op.matvec, A_op.rmatvec, b, c, m, n)

        def calc_residuals(u, v):
            return hsd.lp_residuals(u, v, A_op.matvec, A_op.rmatvec, b, c,
                                    pr_scale, dr_scale, obj_scale, nm_b, nm_c,
                                    m, n)

        def has_converged(r: Residuals, k, total_iters_pos):
            return hsd.lp_converged_code(r, stgs.eps, stgs.pfeasopt,
                                         total_iters_pos)

        def inner_body(state: InnerState, mu, beta, gamma, final_check, ipm_i):
            u_prev = state.u
            u_t, its = hsd.project_lin_sys(state.u, state.v, h, g, g_th,
                                           rho_y, solve_fn, state.k, m, n)
            lam = mu / beta
            if stgs.half_update:
                u, v = hsd.admm_update_half(state.u, state.v, u_t, lam, m)
            else:
                u, v = hsd.admm_update(state.u, state.v, u_prev, u_t, lam,
                                       alpha, m)

            # restart (`abip.c:587-630`): accumulate, then average every
            # restart_fre iterations once past restart_thresh.
            u_avg = state.u_avg + u
            v_avg = state.v_avg + v
            fre = stgs.restart_fre
            do_restart = (state.k >= stgs.restart_thresh) & ((state.j + 1) % fre == 0)
            u = jnp.where(do_restart, u_avg / fre, u)
            v = jnp.where(do_restart, v_avg / fre, v)
            u_avg = jnp.where(do_restart, jnp.zeros_like(u_avg), u_avg)
            v_avg = jnp.where(do_restart, jnp.zeros_like(v_avg), v_avg)

            # cumulative average candidate (`abip.c:635-659`)
            u_sum = state.u_sum + u
            v_sum = state.v_sum + v
            dom = (state.j + 1).astype(u.dtype)
            u_avgcon = u_sum / dom
            v_avgcon = v_sum / dom

            # inner criterion (`abip.c:1951-2051`): every 10th iteration also
            # evaluate the averaged iterate and adopt it if better.
            q_cur = q_norm_resd(u, v)

            def with_avg(_):
                q_avg = q_norm_resd(u_avgcon, v_avgcon)
                better = q_avg < q_cur
                return jnp.where(better, q_avg, q_cur), better

            def without_avg(_):
                return q_cur, jnp.zeros((), bool)

            qres, avg_crit = jax.lax.cond(
                (state.j + 1) % 10 == 0, with_avg, without_avg, operand=None
            )

            # convergence check (CONVERGED_INTERVAL=1) when final_check is on
            u_sel = jnp.where(avg_crit, u_avgcon, u)
            v_sel = jnp.where(avg_crit, v_avgcon, v)

            def check(_):
                r = calc_residuals(u_sel, v_sel)
                st = has_converged(r, state.k, (ipm_i > 0) & (state.k > 0))
                return r, st

            def no_check(_):
                return state.res, jnp.zeros((), jnp.int32)

            res, status = jax.lax.cond(final_check, check, no_check, operand=None)

            return InnerState(
                u=u, v=v, u_prev=u_prev,
                u_avg=u_avg, v_avg=v_avg,
                u_sum=u_sum, v_sum=v_sum,
                u_avgcon=u_avgcon, v_avgcon=v_avgcon,
                j=state.j + 1, k=state.k + 1,
                qres=qres,
                avg_criterion=avg_crit,
                status=status,
                res=res,
                cg_iters=state.cg_iters + its,
            )

        def run_inner(state: InnerState, mu, beta, gamma, inner_stopper,
                      final_check, ipm_i, max_iters):
            """The hot loop: `abip.c:2131-2215` as one lax.while_loop."""

            def cond(s: InnerState):
                return (
                    (s.j < inner_stopper)
                    & (s.qres >= gamma * mu)
                    & (s.status == 0)
                    & (s.k < max_iters)
                )

            def body(s):
                return inner_body(s, mu, beta, gamma, final_check, ipm_i)

            out = jax.lax.while_loop(cond, body, state)
            if stgs.half_update:
                # clamp negative duals on qres-triggered exit (`abip.c:2175-2185`)
                out = out._replace(v=jnp.maximum(out.v, 1e-6))
            return out

        self._run_inner = jax.jit(run_inner)
        self._calc_residuals = jax.jit(calc_residuals)
        self._q_norm = jax.jit(q_norm_resd)

        from .adaptive import bb_update_beta

        self._bb_beta = jax.jit(
            lambda u, v, mu: bb_update_beta(
                u, v, mu, h, g, g_th, rho_y, alpha, solve_fn, m, n,
                stgs.adaptive_lookback, stgs.eps_cor, stgs.eps_pen,
            )
        )
        # exposed for adaptive/tests
        self.project_lin_sys = jax.jit(
            lambda u, v, k: hsd.project_lin_sys(
                u, v, h, g, g_th, rho_y, solve_fn, k, m, n
            )
        )

    # ------------------------------------------------------------------ #
    # host-side driver                                                   #
    # ------------------------------------------------------------------ #
    def _cold_start(self, mu, beta):
        """`cold_start_vars` (`abip.c:361-381`)."""
        m, l = self.m, self.l
        val = np.sqrt(mu / beta)
        u = jnp.concatenate([
            jnp.zeros((m,), self.dtype),
            jnp.full((l - m,), val, self.dtype),
        ])
        return u, u

    def _warm_start(self, warm, mu, beta):
        """Seed u, v from a caller-provided (x, y, s) in original units.

        Intended semantics of `warm_start_vars` + `normalize_warm_start`
        (`abip.c:307-357`, `normalize.c:100-128`).  NOTE: the reference's
        own validation loop (`abip.c:326-349`) overwrites the entire warm
        start with the cold-start value -- a bug we do not replicate;
        here the barrier coordinates are floored at sqrt(mu/beta)*1e-3 to
        stay safely interior instead.
        """
        x, y, s = (np.asarray(a, float) for a in warm)
        m, n, l = self.m, self.n, self.l
        if x.shape != (n,) or y.shape != (m,) or s.shape != (n,):
            raise ValueError("warm start must be (x (n,), y (m,), s (n,))")
        D = np.asarray(self.scal.D)
        E = np.asarray(self.scal.E)
        sc_b = float(self.sc_b)
        sc_c = float(self.sc_c)
        x_s = x * (E * sc_b)
        y_s = y * (D * sc_c)
        s_s = s / (E / (sc_c * self.stgs.scale))
        floor = np.sqrt(mu / beta) * 1e-3
        u = jnp.asarray(
            np.concatenate([y_s, np.maximum(x_s, floor), [1.0]]), self.dtype
        )
        v = jnp.asarray(
            np.concatenate([np.zeros(m), np.maximum(s_s, floor), [floor]]),
            self.dtype,
        )
        return u, v

    def _init_inner_state(self, u, v):
        l = self.l
        z = jnp.zeros((l,), self.dtype)
        return InnerState(
            u=u, v=v, u_prev=u,
            u_avg=z, v_avg=z, u_sum=z, v_sum=z,
            u_avgcon=u, v_avgcon=v,
            j=jnp.zeros((), jnp.int32), k=jnp.zeros((), jnp.int32),
            qres=jnp.full((), jnp.inf, self.dtype),
            avg_criterion=jnp.zeros((), bool),
            status=jnp.zeros((), jnp.int32),
            res=Residuals.init(self.dtype),
            cg_iters=jnp.zeros((), jnp.int32),
        )

    def solve(self, warm=None, resume=None, checkpoint_path=None,
              checkpoint_every=0) -> LPSolution:
        """Run the outer IPM loop.

        warm: optional (x, y, s) seed in original units.
        resume: optional `SolverCheckpoint` to continue a prior solve.
        checkpoint_path/checkpoint_every: save state every k outer
        iterations (SURVEY.md section 5.4 -- the iterate is a small
        pytree, so preemption recovery is an .npz round-trip).
        """
        from .utils import IterationLog, PhaseTimers, solver_banner
        from .utils.checkpoint import SolverCheckpoint

        stgs = self.stgs
        m, n, l = self.m, self.n, self.l
        t0 = time.perf_counter()
        log = IterationLog(enabled=stgs.verbose)
        timers = PhaseTimers()
        self._timers = timers
        if stgs.verbose:
            print(solver_banner("LP", m, n, self.A_op.nnz,
                                type(self.solver).__name__))

        # `update_work` (`abip.c:1843-1927`): sigma/gamma by sparsity
        sp_hi = max(self.sp, stgs.sparsity_ratio)
        sp_lo = min(self.sp, stgs.sparsity_ratio)
        if sp_hi > 0.4 or (0.1 < sp_lo < 0.2):
            sigma, gamma = 0.3, 2.0
        elif sp_lo > 0.2:
            sigma, gamma = 0.5, 3.0
        else:
            sigma, gamma = 0.8, 3.0

        mu, beta = 1.0, 1.0
        final_check = False
        double_check = False
        dynamic_sigma = stgs.dynamic_sigma

        i0 = 0
        if resume is not None:
            u = jnp.asarray(resume.u, self.dtype)
            v = jnp.asarray(resume.v, self.dtype)
            mu, beta = resume.mu, resume.beta
            sigma, gamma = resume.sigma, resume.gamma
            final_check = resume.final_check
            i0 = resume.ipm_iters
        elif warm is not None:
            u, v = self._warm_start(warm, mu, beta)
        else:
            u, v = self._cold_start(mu, beta)
        state = self._init_inner_state(u, v)
        if resume is not None:
            state = state._replace(
                k=jnp.asarray(resume.admm_iters, jnp.int32))

        status = Status.UNFINISHED
        ipm_iter = i0
        admm_total = int(state.k)
        res_np = None
        max_admm = stgs.max_admm_iters

        for i in range(i0, stgs.max_ipm_iters):
            ipm_iter = i
            # inner_stopper by sparsity (`abip.c:2104-2115`)
            if sp_lo > 0.5:
                inner_stopper = max(1, int(round(mu ** -0.35)))
            elif sp_lo > 0.2:
                inner_stopper = max(1, int(round(mu ** -1.0)))
            else:
                inner_stopper = max_admm

            # reset per-stage accumulators; adopt averaged iterate if selected
            avg_crit = bool(state.avg_criterion)
            u = state.u_avgcon if avg_crit else state.u
            v = state.v_avgcon if avg_crit else state.v
            z = jnp.zeros((l,), self.dtype)
            state = state._replace(
                u=u, v=v,
                u_avg=z, v_avg=z, u_sum=z, v_sum=z,
                j=jnp.zeros((), jnp.int32),
                qres=jnp.full((), jnp.inf, self.dtype),
                status=jnp.zeros((), jnp.int32),
            )

            with timers.phase("inner_admm"):
                state = self._run_inner(
                    state,
                    jnp.asarray(mu, self.dtype),
                    jnp.asarray(beta, self.dtype),
                    jnp.asarray(gamma, self.dtype),
                    jnp.asarray(inner_stopper, jnp.int32),
                    jnp.asarray(final_check, bool),
                    jnp.asarray(i, jnp.int32),
                    jnp.asarray(max_admm, jnp.int32),
                )
                jax.block_until_ready(state.u)
            admm_total = int(state.k)
            inner_status = int(state.status)
            if inner_status != 0:
                status = inner_status
                res_np = jax.tree.map(float, state.res)._asdict()
                break

            # time limit (`abip.c:2217-2221`)
            if time.perf_counter() - t0 > stgs.max_time:
                max_admm = int(admm_total * 1.05) + 1

            if mu < stgs.eps:
                final_check = True

            # outer-loop residual check (`abip.c:2229-2248`)
            avg_crit = bool(state.avg_criterion)
            u_sel = state.u_avgcon if avg_crit else state.u
            v_sel = state.v_avgcon if avg_crit else state.v
            with timers.phase("residuals"):
                r = self._calc_residuals(u_sel, v_sel)
                res_np = jax.tree.map(float, r)._asdict()
            state = state._replace(res=r)

            pobj = res_np["ct_x_by_tau"] / max(res_np["tau"], EPS_TOL)
            dobj = res_np["bt_y_by_tau"] / max(res_np["tau"], EPS_TOL)
            log.row(i, admm_total, mu, res_np, pobj, dobj)

            status = schedules.check_converged(res_np, stgs, i, admm_total)
            if status != 0 or admm_total + 1 >= max_admm:
                break

            # mu update (`abip.c:2251-2277`)
            u_np = np.asarray(u_sel)
            v_np = np.asarray(v_sel)
            mu, sigma, gamma, final_check, double_check, dynamic_sigma = (
                schedules.update_mu(
                    mu, sigma, gamma, res_np, stgs, self.sp,
                    final_check, double_check, dynamic_sigma,
                    u=u_np, v=v_np, m=m,
                )
            )

            if checkpoint_path and checkpoint_every and (i + 1) % checkpoint_every == 0:
                avg_c = bool(state.avg_criterion)
                SolverCheckpoint(
                    u=np.asarray(state.u_avgcon if avg_c else state.u),
                    v=np.asarray(state.v_avgcon if avg_c else state.v),
                    mu=mu, beta=beta, sigma=sigma, gamma=gamma,
                    admm_iters=admm_total, ipm_iters=i + 1,
                    final_check=final_check,
                ).save(checkpoint_path)

            # reinitialize for next stage (`abip.c:996-1075`, indx=0)
            state = self._reinit(state, sigma)

            # adaptive penalty via BB spectral trials (`abip.c:2281-2293`):
            # sandwich the search between sqrt(sigma) re-scalings (indx=1/2)
            if stgs.adaptive:
                with timers.phase("adaptive_bb"):
                    state = self._reinit_scale(state, np.sqrt(sigma))
                    beta = 1.0
                    u_a = state.u_avgcon if bool(state.avg_criterion) else state.u
                    v_a = state.v_avgcon if bool(state.avg_criterion) else state.v
                    beta = float(self._bb_beta(u_a, v_a,
                                               jnp.asarray(mu, self.dtype)))
                    state = self._reinit_scale(state, np.sqrt(1.0 / sigma))

        solve_time = time.perf_counter() - t0
        sol = self._extract_solution(
            state, res_np, status, ipm_iter, admm_total, solve_time
        )
        log.footer(sol.status_name, {
            "pobj": sol.pobj, "dobj": sol.dobj,
            "res_pri": sol.res_pri, "res_dual": sol.res_dual,
            "rel_gap": sol.rel_gap,
            "ipm_iters": sol.ipm_iters, "admm_iters": sol.admm_iters,
            "setup_time": sol.setup_time, "solve_time": sol.solve_time,
            "avg_cg_iters": sol.avg_cg_iters,
        }, timers)
        return sol

    def _reinit(self, state: InnerState, sigma):
        """`reinitialize_vars(w, 0)` on the active iterate."""
        m = self.m
        sig = jnp.asarray(sigma, self.dtype)

        def reb(u, v):
            return hsd.reinit_rebalance(u, v, sig, m)

        if bool(state.avg_criterion):
            u, v = reb(state.u_avgcon, state.v_avgcon)
            return state._replace(u_avgcon=u, v_avgcon=v)
        u, v = reb(state.u, state.v)
        return state._replace(u=u, v=v)

    def _reinit_scale(self, state: InnerState, factor):
        """`reinitialize_vars` modes 1/2 (`abip.c:1057-1072`): scale the
        barrier coordinates of the active iterate by `factor`."""
        m = self.m
        f = jnp.asarray(factor, self.dtype)

        def scl(u, v):
            return u.at[m:].multiply(f), v.at[m:].multiply(f)

        if bool(state.avg_criterion):
            u, v = scl(state.u_avgcon, state.v_avgcon)
            return state._replace(u_avgcon=u, v_avgcon=v)
        u, v = scl(state.u, state.v)
        return state._replace(u=u, v=v)

    def _extract_solution(self, state, res_np, status, ipm_iter, admm_total,
                          solve_time) -> LPSolution:
        """`get_solution` (`abip.c:1344-1414`) + un-normalization
        (`normalize.c:133-158`)."""
        m, n, l = self.m, self.n, self.l
        stgs = self.stgs
        avg = bool(state.avg_criterion)
        u = np.asarray(state.u_avgcon if avg else state.u)
        v = np.asarray(state.v_avgcon if avg else state.v)
        if res_np is None:
            r = self._calc_residuals(
                state.u_avgcon if avg else state.u,
                state.v_avgcon if avg else state.v,
            )
            res_np = jax.tree.map(float, r)._asdict()

        x = u[m : m + n].copy()
        y = u[:m].copy()
        s = v[m : m + n].copy()
        tau = res_np["tau"]
        kap = res_np["kap"]
        bty = res_np["bt_y_by_tau"]
        ctx = res_np["ct_x_by_tau"]

        if status == Status.UNFINISHED:
            if tau > INDETERMINATE_TOL and tau > kap:
                status = Status.SOLVED_INACCURATE
                x, y, s = x / max(tau, EPS_TOL), y / max(tau, EPS_TOL), s / max(tau, EPS_TOL)
            elif np.linalg.norm(u) < INDETERMINATE_TOL * np.sqrt(l):
                status = Status.INDETERMINATE
                x[:], y[:], s[:] = np.nan, np.nan, np.nan
            elif -bty < ctx:
                status = Status.INFEASIBLE_INACCURATE
                y, s = y / bty, s / bty
                x[:] = np.nan
            else:
                status = Status.UNBOUNDED_INACCURATE
                x = x / (-ctx)
                y[:], s[:] = np.nan, np.nan
        elif status == Status.SOLVED:
            x, y, s = x / max(tau, EPS_TOL), y / max(tau, EPS_TOL), s / max(tau, EPS_TOL)
        elif status == Status.INFEASIBLE:
            y, s = y / bty, s / bty
            x[:] = np.nan
        elif status == Status.UNBOUNDED:
            x = x / (-ctx)
            y[:], s[:] = np.nan, np.nan

        if stgs.normalize:
            D = np.asarray(self.scal.D)
            E = np.asarray(self.scal.E)
            sc_b = float(self.sc_b)
            sc_c = float(self.sc_c)
            x = x / (E * sc_b)
            y = y / (D * sc_c)
            s = s * E / (sc_c * stgs.scale)

        solved_like = status in (Status.SOLVED, Status.SOLVED_INACCURATE)
        pobj = ctx / tau if (solved_like and tau > EPS_TOL) else (
            -np.inf if status in (Status.UNBOUNDED, Status.UNBOUNDED_INACCURATE) else np.inf
        )
        dobj = bty / tau if (solved_like and tau > EPS_TOL) else pobj

        return LPSolution(
            x=x, y=y, s=s,
            status=int(status),
            status_name=Status.name(status),
            pobj=float(pobj), dobj=float(dobj),
            res_pri=res_np["res_pri"], res_dual=res_np["res_dual"],
            rel_gap=res_np["rel_gap"],
            res_infeas=res_np["res_infeas"], res_unbdd=res_np["res_unbdd"],
            ipm_iters=ipm_iter + 1, admm_iters=admm_total,
            setup_time=self.setup_time, solve_time=solve_time,
            avg_cg_iters=float(state.cg_iters) / max(1, admm_total),
        )


def solve_lp(A, b, c, settings: Settings = Settings(), **overrides) -> LPSolution:
    """One-call LP solve: min c'x s.t. Ax = b, x >= 0.

    Equivalent of the reference `ABIP(main)` (`abip.c:2393-2422`).
    """
    if overrides:
        import dataclasses

        settings = dataclasses.replace(settings, **overrides)
    w = LPWorkspace(A, b, c, settings)
    return w.solve()
