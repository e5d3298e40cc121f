"""Differentiable solution maps: implicit differentiation through the solver.

A capability the reference cannot offer: because the whole solver is JAX,
the *solution map* ``(A, b, c[, Q]) -> (x, y, s)`` can be exposed as a
differentiable function -- ``jax.grad`` / ``jax.jacobian`` work through a
solve, under ``jit`` and ``vmap``.  This is the role diffcp (Agrawal et
al., "Differentiating Through a Cone Program", 2019) plays for SCS,
re-derived for ABIP's problem form

    min  1/2 x'Qx + c'x   s.t.  Ax = b,  x in K,

with K = soc x rsoc x free x zero x nonneg (the reference cone set,
`/root/reference/src/abip-qcp/include/abip.h:67-76`).

Method
------
The backward pass never differentiates through the ADMM iterations
(which would be both expensive and noisy); it applies the implicit
function theorem to the KKT residual map at the returned solution.
With z := x - s, the Moreau decomposition identifies the solution with
a root of

    F1(z, y) = A Pi(z) - b                          (primal feasibility)
    F2(z, y) = Q Pi(z) + c - A'y - (Pi(z) - z)      (dual feasibility)

where ``Pi`` is the Euclidean projection onto K (so x = Pi(z) and
s = Pi(z) - z automatically satisfy x in K, s in K*, x's = 0).  The
vector-Jacobian product solves the (n+m) x (n+m) adjoint system

    [ P A'   P Q - P + I ] [w1]   [ P (gx + gs) - gs ]
    [  0         -A      ] [w2] = [        gy        ]

with P = D Pi(z) (block-diagonal, one block per cone), then reads off

    grad_A = -w1 x' + y w2',   grad_b = w1,   grad_c = -w2,
    grad_Q_diag = -(w2 * x).

Differentiability holds at solutions satisfying strict complementarity
with z off every cone-boundary kink (for SOC: ||z_body|| != |z_head|);
at kinks and degenerate vertices the least-squares solve returns the
minimum-norm heuristic gradient, exactly as diffcp's LSQR does.

Forward solves run the fully-on-device drivers (`parallel/batched.py`,
`parallel/batched_qcp.py`), so the composed loss stays one XLA program.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .cones import ConeLayout, ConeSpec, _FREE, _NONNEG

__all__ = ["solve_lp_grad", "solve_qcp_grad", "solve_lasso_grad",
           "solve_svm_grad", "dprojection_dense"]

_TINY = 1e-30


# --------------------------------------------------------------------- #
# derivative of the cone projection                                     #
# --------------------------------------------------------------------- #
def _dpi_soc_block(zb):
    """D Pi_SOC at zb = (t, u): the three-branch projection Jacobian.

    Interior (||u|| <= t): I.  Polar interior (||u|| <= -t): 0.
    Otherwise the boundary form
        0.5 * [[1, ub'], [ub, (1 + t/nu) I - (t/nu) ub ub']],
    ub = u/||u||  (standard; e.g. diffcp's `_proj_derivative`).
    """
    d = zb.shape[0]
    t, u = zb[0], zb[1:]
    nu = jnp.linalg.norm(u)
    nu_safe = jnp.maximum(nu, _TINY)
    ub = u / nu_safe
    eye_b = jnp.eye(d - 1, dtype=zb.dtype)
    r = t / nu_safe
    B = jnp.zeros((d, d), zb.dtype)
    B = B.at[0, 0].set(0.5)
    B = B.at[0, 1:].set(0.5 * ub)
    B = B.at[1:, 0].set(0.5 * ub)
    B = B.at[1:, 1:].set(0.5 * ((1.0 + r) * eye_b - r * jnp.outer(ub, ub)))
    eye = jnp.eye(d, dtype=zb.dtype)
    zero = jnp.zeros((d, d), zb.dtype)
    return jnp.where(nu <= t, eye, jnp.where(nu <= -t, zero, B))


def _rsoc_rotation(d, dtype):
    """Orthogonal H with RSOC = H(SOC): (a, b, w) -> ((a+b)/sqrt2,
    (a-b)/sqrt2, w).  H is symmetric, H @ H = I."""
    H = np.eye(d)
    H[0, 0] = H[0, 1] = H[1, 0] = 1.0 / np.sqrt(2.0)
    H[1, 1] = -1.0 / np.sqrt(2.0)
    return jnp.asarray(H, dtype)


def dprojection_dense(z: jnp.ndarray, layout: ConeLayout) -> jnp.ndarray:
    """D Pi_K(z) as a dense (n, n) matrix (block-diagonal per cone).

    Scalar cones are diagonal entries (free: 1, zero: 0, nonneg: z>0);
    SOC blocks use `_dpi_soc_block`; RSOC blocks conjugate the SOC form
    by the rotation H (Pi_RSOC = H Pi_SOC H, so D Pi_RSOC = H P_SOC H).
    The static Python loop over blocks unrolls at trace time.
    """
    kind = jnp.asarray(layout.kind)
    diag = jnp.where(kind == _NONNEG, (z > 0).astype(z.dtype), 0.0)
    diag = jnp.where(jnp.asarray(layout.kind == _FREE), 1.0, diag)
    P = jnp.diag(diag)

    spec = layout.spec
    pos = 0
    for q in spec.soc:
        if q > 1:  # q == 1 is downgraded to nonneg in the layout
            P = P.at[pos : pos + q, pos : pos + q].set(
                _dpi_soc_block(z[pos : pos + q]))
        pos += q
    for q in spec.rsoc:
        H = _rsoc_rotation(q, z.dtype)
        Pb = _dpi_soc_block(H @ z[pos : pos + q])
        P = P.at[pos : pos + q, pos : pos + q].set(H @ Pb @ H)
        pos += q
    return P


# --------------------------------------------------------------------- #
# adjoint system                                                        #
# --------------------------------------------------------------------- #
def _implicit_vjp(A, x, y, s, q, layout, gx, gy, gs, lstsq):
    """Solve the adjoint KKT system and assemble parameter gradients."""
    m, n = A.shape
    dtype = A.dtype
    z = x - s
    P = dprojection_dense(z, layout)

    PQ = P * q[None, :] if q is not None else jnp.zeros((n, n), dtype)
    top = jnp.concatenate(
        [P @ A.T, PQ - P + jnp.eye(n, dtype=dtype)], axis=1)
    bot = jnp.concatenate([jnp.zeros((m, m), dtype), -A], axis=1)
    M = jnp.concatenate([top, bot], axis=0)

    gz = P @ (gx + gs) - gs
    rhs = jnp.concatenate([gz, gy])
    if lstsq:
        w = jnp.linalg.lstsq(M, rhs)[0]
    else:
        w = jnp.linalg.solve(M, rhs)
    w1, w2 = w[:m], w[m:]

    gA = -jnp.outer(w1, x) + jnp.outer(y, w2)
    gb = w1
    gc = -w2
    gq = -(w2 * x) if q is not None else None
    return gA, gb, gc, gq


def _gate(solved, *grads):
    """NaN-poison gradients of unsolved instances so failures are loud."""
    bad = jnp.asarray(jnp.nan)
    return tuple(
        None if g is None else jnp.where(solved, g, bad) for g in grads
    )


# --------------------------------------------------------------------- #
# LP solution map                                                       #
# --------------------------------------------------------------------- #
@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _lp_solution(opts, lstsq, A, b, c):
    from .parallel.batched import device_solve_lp

    r = device_solve_lp(A, b, c, **dict(opts))
    return r.x, r.y, r.s, r.status


def _lp_fwd(opts, lstsq, A, b, c):
    x, y, s, status = _lp_solution(opts, lstsq, A, b, c)
    return (x, y, s, status), (A, x, y, s, status)


def _lp_bwd(opts, lstsq, res, g):
    A, x, y, s, status = res
    gx, gy, gs, _ = g  # status is integer output: no cotangent
    layout = ConeLayout(ConeSpec.lp(A.shape[1]))
    gA, gb, gc, _ = _implicit_vjp(A, x, y, s, None, layout, gx, gy, gs,
                                  lstsq)
    return _gate(status == 1, gA, gb, gc)


_lp_solution.defvjp(_lp_fwd, _lp_bwd)


def solve_lp_grad(A, b, c, *, eps=1e-8, lstsq=True, **kw):
    """Differentiable LP solution map: returns ``(x, y, s)``.

    ``jax.grad`` of any function of the returned triple propagates to
    (A, b, c) via the implicit function theorem at the solution -- NOT
    by unrolling ADMM iterations.  jit/vmap-compatible (the forward is
    `device_solve_lp`, one XLA program).

    eps defaults tighter (1e-8) than the solver default: the implicit
    gradient inherits the forward solve's accuracy.  ``lstsq=False``
    switches the adjoint solve from minimum-norm SVD to plain LU
    (faster; requires a nondegenerate solution).  Gradients of
    non-Solved instances are NaN on purpose.
    """
    opts = tuple(sorted({"eps": eps, **kw}.items()))
    x, y, s, _ = _lp_solution(opts, bool(lstsq), A, b, c)
    return x, y, s


# --------------------------------------------------------------------- #
# conic / QCP solution map                                              #
# --------------------------------------------------------------------- #
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _qcp_solution(spec, opts, lstsq, A, b, c, q):
    from .parallel.batched_qcp import solve_qcp_device

    r = solve_qcp_device(A, b, c, q, cones=spec, **dict(opts))
    return r.x, r.y, r.s, r.status


def _qcp_fwd(spec, opts, lstsq, A, b, c, q):
    x, y, s, status = _qcp_solution(spec, opts, lstsq, A, b, c, q)
    return (x, y, s, status), (A, q, x, y, s, status)


def _qcp_bwd(spec, opts, lstsq, res, g):
    A, q, x, y, s, status = res
    gx, gy, gs, _ = g
    layout = ConeLayout(spec)
    qq = jnp.zeros(A.shape[1], A.dtype) if q is None else q
    gA, gb, gc, gq = _implicit_vjp(A, x, y, s, qq, layout, gx, gy, gs,
                                   lstsq)
    if q is None:
        gq = None
    return _gate(status == 1, gA, gb, gc, gq)


_qcp_solution.defvjp(_qcp_fwd, _qcp_bwd)


def solve_qcp_grad(A, b, c, *, cones: ConeSpec, Q_diag=None, eps=1e-8,
                   lstsq=True, **kw):
    """Differentiable conic/QP solution map: returns ``(x, y, s)`` for

        min 1/2 x'diag(Q_diag)x + c'x   s.t.  Ax = b,  x in K.

    The diffcp role for the ABIP problem form; see the module docstring
    for the math and the differentiability caveats.  Forward is the
    whole-solve-on-device conic driver (`solve_qcp_device`, which also
    accepts a full (n, n) Q); general Q is not wired HERE because the
    adjoint assembly (`_implicit_vjp`) is written for the diagonal
    parameterization -- extend the PQ term there to add it.
    """
    opts = tuple(sorted({"eps": eps, **kw}.items()))
    x, y, s, _ = _qcp_solution(cones, opts, bool(lstsq), A, b, c, Q_diag)
    return x, y, s


def solve_lasso_grad(X, y, lam, *, eps=1e-8, lstsq=True, **kw):
    """Differentiable LASSO: w*(X, y, lam) for

        min_w  1/2 ||Xw - y||^2 + lam ||w||_1.

    Hyperparameter gradients through the argmin: ``jax.grad`` of any
    function of the returned w propagates to X, y, AND the scalar lam
    (e.g. gradient-based tuning of lam against a validation loss).  The
    conic embedding is the reference's LASSO reformulation
    (`problems/lasso.py`, `source/lasso_config.c:8-93`), built traceably
    so all three inputs stay differentiable.

    Differentiable wherever the active support is stable (the classical
    LASSO smoothness condition: |X_j'(Xw - y)| != lam off the support);
    at support-change kinks the minimum-norm heuristic gradient is
    returned (``lstsq=True``).
    """
    X = jnp.asarray(X, jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    m, n = X.shape
    q = 2 + m + 2 * n
    A = jnp.zeros((1 + m, q), X.dtype)
    A = A.at[0, 0].set(1.0)
    A = A.at[1:, 2 : 2 + m].set(jnp.eye(m, dtype=X.dtype))
    A = A.at[1:, 2 + m : 2 + m + n].set(X)
    A = A.at[1:, 2 + m + n :].set(-X)
    b = jnp.concatenate([jnp.ones((1,), X.dtype), y])
    c = jnp.concatenate([
        jnp.zeros((1,), X.dtype), jnp.ones((1,), X.dtype),
        jnp.zeros((m,), X.dtype),
        jnp.broadcast_to(jnp.asarray(lam, X.dtype), (2 * n,)),
    ])
    cones = ConeSpec(rsoc=(2 + m,), nonneg=2 * n)
    x, _, _ = solve_qcp_grad(A, b, c, cones=cones, eps=eps, lstsq=lstsq,
                             **kw)
    return x[2 + m : 2 + m + n] - x[2 + m + n :]


def solve_svm_grad(X, y, C, *, eps=1e-8, lstsq=True, **kw):
    """Differentiable hinge-loss SVM: (w*, b0*)(X, y, C) for

        min_{w, b0}  1/2 ||w||^2 + C sum_i max(0, 1 - y_i (x_i'w + b0)).

    The QP embedding is the reference's SVM-QP config
    (`problems/svm.py svm_to_conic_qp`, `source/svm_qp_config.c:8-60`),
    built traceably: gradients flow to X and the scalar C (labels y are
    discrete -- their "gradient" is not meaningful).  Differentiable
    wherever no training point lies exactly on the margin boundary.
    """
    X = jnp.asarray(X, jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    m, n = X.shape
    q = n + 1 + 2 * m
    A = jnp.zeros((m, q), X.dtype)
    A = A.at[:, :n].set(y[:, None] * X)
    A = A.at[:, n].set(y)
    A = A.at[:, n + 1 : n + 1 + m].set(jnp.eye(m, dtype=X.dtype))
    A = A.at[:, n + 1 + m :].set(-jnp.eye(m, dtype=X.dtype))
    b = jnp.ones((m,), X.dtype)
    c = jnp.concatenate([
        jnp.zeros((n + 1,), X.dtype),
        jnp.broadcast_to(jnp.asarray(C, X.dtype), (m,)),
        jnp.zeros((m,), X.dtype),
    ])
    q_diag = jnp.concatenate([jnp.ones((n,), X.dtype),
                              jnp.zeros((1 + 2 * m,), X.dtype)])
    cones = ConeSpec(free=n + 1, nonneg=2 * m)
    x, _, _ = solve_qcp_grad(A, b, c, cones=cones, Q_diag=q_diag, eps=eps,
                             lstsq=lstsq, **kw)
    return x[:n], x[n]
