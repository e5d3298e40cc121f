"""Support-vector machine: hinge loss, QP and SOCP conic forms.

    min_{w,b0}  (1/2)||w||^2 + C * sum_i max(0, 1 - y_i (x_i'w + b0))

Two embeddings, mirroring the reference's pair of configs:

QP form (`source/svm_qp_config.c:8-60`: p = m rows, Q = diag(I_n, 0)):
    variables  z = (w in R^n, b0, xi in R^m, t in R^m)
    cones      free^{n+1} x R+^{2m}
    rows       y_i x_i'w + y_i b0 + xi_i - t_i = 1
    objective  min (1/2) z'Q z + C 1'xi,   Q = diag(I_n, 0, 0, 0)

SOCP form (`source/svm_config.c:8-60`): replaces the quadratic by an RSOC
epigraph  ||w||^2 <= 2 r s, s = 1:
    variables  z = (r, s, w in R^n, b0, xi in R^m, t in R^m)
    cones      RSOC(2+n) x free^1 x R+^{2m}
    rows       s = 1;  y_i x_i'w + y_i b0 + xi_i - t_i = 1
    objective  min r + C 1'xi
"""
from __future__ import annotations

import numpy as np

from ..cones import ConeSpec
from .lasso import ConicProblem


def _check(X, y):
    X = np.asarray(X, float)
    y = np.asarray(y, float)
    m, n = X.shape
    if y.shape != (m,):
        raise ValueError(f"y must have shape ({m},); got {y.shape}")
    if not np.all(np.isin(y, (-1.0, 1.0))):
        raise ValueError("labels y must be +/-1")
    return X, y, m, n


def svm_to_conic_qp(X, y, C: float) -> ConicProblem:
    X, y, m, n = _check(X, y)
    q = n + 1 + 2 * m
    A = np.zeros((m, q))
    A[:, :n] = y[:, None] * X        # label-folded data (`svm_config.c:121-124`)
    A[:, n] = y
    A[:, n + 1 : n + 1 + m] = np.eye(m)
    A[:, n + 1 + m :] = -np.eye(m)
    b = np.ones(m)
    c = np.zeros(q)
    c[n + 1 : n + 1 + m] = C
    Q = np.zeros((q, q))
    Q[:n, :n] = np.eye(n)
    cones = ConeSpec(free=n + 1, nonneg=2 * m)

    def recover(sol):
        z = sol.x
        w, b0 = z[:n], z[n]
        margins = 1 - y * (X @ w + b0)
        obj = 0.5 * w @ w + C * np.sum(np.maximum(margins, 0))
        return w, b0, obj

    return ConicProblem(A=A, b=b, c=c, cones=cones, recover=recover, Q=Q)


def svm_to_conic_socp(X, y, C: float) -> ConicProblem:
    X, y, m, n = _check(X, y)
    q = 2 + n + 1 + 2 * m
    p = 1 + m
    A = np.zeros((p, q))
    A[0, 1] = 1.0                      # s = 1
    A[1:, 2 : 2 + n] = y[:, None] * X
    A[1:, 2 + n] = y
    A[1:, 3 + n : 3 + n + m] = np.eye(m)
    A[1:, 3 + n + m :] = -np.eye(m)
    b = np.concatenate([[1.0], np.ones(m)])
    c = np.zeros(q)
    c[0] = 1.0
    c[3 + n : 3 + n + m] = C
    cones = ConeSpec(rsoc=(2 + n,), free=1, nonneg=2 * m)

    def recover(sol):
        z = sol.x
        w, b0 = z[2 : 2 + n], z[2 + n]
        margins = 1 - y * (X @ w + b0)
        obj = 0.5 * w @ w + C * np.sum(np.maximum(margins, 0))
        return w, b0, obj

    return ConicProblem(A=A, b=b, c=c, cones=cones, recover=recover)


def svm_operator_qp(X, y, C: float) -> ConicProblem:
    """Matrix-free QP form: the label-folded data matrix applied on the
    fly, like the reference's `svm_A_times`/`svm_AT_times`
    (`source/svm_config.c:175-229`).  Q is the diagonal (1_n, 0, 0, 0).
    """
    import jax.numpy as jnp

    from ..problem import LinearOperator

    X, y, m, n = _check(X, y)
    Xj = jnp.asarray(X)
    yj = jnp.asarray(y)
    q = n + 1 + 2 * m

    def matvec(z):
        w, b0 = z[:n], z[n]
        xi, t = z[n + 1 : n + 1 + m], z[n + 1 + m :]
        return yj * (Xj @ w) + yj * b0 + xi - t

    def rmatvec(u):
        yu = yj * u
        return jnp.concatenate(
            [Xj.T @ yu, jnp.dot(yj, u)[None], u, -u]
        )

    op = LinearOperator(m, q, matvec, rmatvec, nnz=m * n + 3 * m)
    colX = np.asarray(jnp.sum(Xj * Xj, axis=0))
    op.col_norms_sq = np.concatenate([colX, [float(m)], np.ones(2 * m)])

    b = np.ones(m)
    c = np.zeros(q)
    c[n + 1 : n + 1 + m] = C
    Q_diag = np.concatenate([np.ones(n), np.zeros(1 + 2 * m)])
    cones = ConeSpec(free=n + 1, nonneg=2 * m)

    def recover(sol):
        z = sol.x
        w, b0 = z[:n], z[n]
        margins = 1 - y * (X @ w + b0)
        obj = 0.5 * w @ w + C * np.sum(np.maximum(margins, 0))
        return w, b0, obj

    return ConicProblem(A=op, b=b, c=c, cones=cones, recover=recover,
                        Q=Q_diag)


def solve_svm(X, y, C: float, form: str = "qp", settings=None,
              matrix_free: bool = False, **overrides):
    """One-call SVM solve; returns (w, b0, objective, conic solution).

    `form` selects the QP or SOCP embedding (the reference exposes both via
    `prob_type`, `mex/abip_ml_mex.c:90-146`).  `matrix_free=True` (QP form
    only) applies the label-folded data on the fly with CG solves.
    """
    from ..qcp import conic_defaults, solve_qcp

    if matrix_free:
        if form != "qp":
            raise ValueError("matrix_free SVM supports form='qp' only")
        prob = svm_operator_qp(X, y, C)
        settings = settings or conic_defaults(normalize=False, linsys="cg")
    elif form == "qp":
        prob = svm_to_conic_qp(X, y, C)
    elif form == "socp":
        prob = svm_to_conic_socp(X, y, C)
    else:
        raise ValueError(f"form must be 'qp' or 'socp'; got {form!r}")
    sol = solve_qcp(prob.A, prob.b, prob.c, prob.cones, Q=prob.Q,
                    settings=settings, **overrides)
    w, b0, obj = prob.recover(sol)
    return w, b0, obj, sol
