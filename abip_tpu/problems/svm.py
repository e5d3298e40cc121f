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


def svm_operator_qp(X, y, C: float, scaled: bool = True) -> ConicProblem:
    """Matrix-free QP form: the label-folded data matrix applied on the
    fly, like the reference's `svm_A_times`/`svm_AT_times`
    (`source/svm_config.c:175-229`).  Q is the diagonal (1_n, 0, 0, 0).

    `scaled=True` applies analytic equilibration (closed-form row/column
    norms of [yX, y, I, -I]) -- the role of the reference's hand-tuned
    shape heuristics (`svm_config.c:64-111`).  Q transforms as E^-2.
    """
    import jax.numpy as jnp

    from ..problem import LinearOperator

    X, y, m, n = _check(X, y)
    q = n + 1 + 2 * m

    # analytic norms: rows ||X_i||^2+3; cols [||X_:j||^2, m, 1_m, 1_m]
    row_sq = np.sum(X * X, axis=1) + 3.0
    col_sq = np.concatenate([np.sum(X * X, axis=0), [float(m)],
                             np.ones(2 * m)])
    if scaled:
        D = np.sqrt(np.sqrt(row_sq))
        E = np.sqrt(np.sqrt(np.maximum(col_sq, 1e-8)))
    else:
        D = np.ones(m)
        E = np.ones(q)

    Xj = jnp.asarray(X)
    yj = jnp.asarray(y)
    Dj = jnp.asarray(D)
    Ej = jnp.asarray(E)

    def matvec(z):
        z = z / Ej
        w, b0 = z[:n], z[n]
        xi, t = z[n + 1 : n + 1 + m], z[n + 1 + m :]
        return (yj * (Xj @ w) + yj * b0 + xi - t) / Dj

    def rmatvec(u):
        u = u / Dj
        yu = yj * u
        return jnp.concatenate(
            [Xj.T @ yu, jnp.dot(yj, u)[None], u, -u]
        ) / Ej

    op = LinearOperator(m, q, matvec, rmatvec, nnz=m * n + 3 * m)
    # exact Jacobi diag of the scaled Schur operator's A-part
    Xd_sq = np.sum((X / D[:, None]) ** 2, axis=0)
    exact_col = np.concatenate(
        [Xd_sq, [float(np.sum(1.0 / D**2))], 1.0 / D**2, 1.0 / D**2]
    )
    op.col_norms_sq = exact_col / (E * E)

    b = np.ones(m)
    c = np.zeros(q)
    c[n + 1 : n + 1 + m] = C
    sc = float(np.sqrt(np.sqrt(b @ b + c @ c)))
    sc = 1.0 if sc < 1e-3 else min(sc, 1e3)
    sc_b = sc_c = 1.0 / sc
    b_s = b / D * sc_b
    c_s = c / E * sc_c
    Q_diag = np.concatenate([np.ones(n), np.zeros(1 + 2 * m)]) / (E * E)
    cones = ConeSpec(free=n + 1, nonneg=2 * m)

    def recover(sol):
        z = np.asarray(sol.x) / (E * sc_b)
        w, b0 = z[:n], z[n]
        margins = 1 - y * (X @ w + b0)
        obj = 0.5 * w @ w + C * np.sum(np.maximum(margins, 0))
        return w, b0, obj

    def solver_factory(op_, rho_y_vec, rho_x_vec, Q_diag_s):
        """Custom KKT: the scaled Gram A H^-1 A' of [yX, y, I, -I] is
        EXACTLY diag + rank-(n+1) (`svm_config.c:577-637` role)."""
        from ..linsys.schur import LowRankWoodburySolver

        H = rho_x_vec + (Q_diag_s if Q_diag_s is not None else 0.0)
        H_inv = 1.0 / H
        ht = H_inv / (Ej * Ej)
        U = (yj[:, None] * jnp.concatenate(
            [Xj, jnp.ones((m, 1), Xj.dtype)], axis=1)) / Dj[:, None]
        U = U * jnp.sqrt(ht[: n + 1])[None, :]
        Hu = jnp.ones((n + 1,), Xj.dtype)
        g = (ht[n + 1 : n + 1 + m] + ht[n + 1 + m :]) / (Dj * Dj)
        return LowRankWoodburySolver(op_, H_inv, rho_y_vec, U, Hu, g)

    return ConicProblem(A=op, b=b_s, c=c_s, cones=cones, recover=recover,
                        Q=Q_diag, solver_factory=solver_factory)


def svm_operator_socp(X, y, C: float, scaled: bool = True) -> ConicProblem:
    """Matrix-free SOCP form: the reformulated constraint matrix

        A = [[0, 1, 0,  0, 0,  0],          z = (r, s, w, b0, xi, t)
             [0, 0, yX, y, I, -I]]

    is never materialized; X is applied on the fly over scaled blocks,
    the re-derivation of the reference's largest app config
    (`source/svm_config.c:175-196` `svm_A_times`, `:202-229`
    `svm_AT_times`, `:577-637` custom KKT, `:642-664` preconditioner).

    `scaled=True` applies analytic equilibration (closed-form row/column
    norms, RSOC-block-tied E) -- the role of the lambda/shape-dependent
    hand-tuned constants (`svm_config.c:64-111`).  The exact Jacobi
    diagonal of the scaled Schur operator is supplied in closed form
    (`init_svm_precon` analogue) and the SVM PCG tolerance ladder
    (`get_svm_pcg_tol`, `svm_config.c:669-696`) is attached.
    """
    import jax.numpy as jnp

    from ..linsys.schur import SVM_PCG_LADDER
    from ..problem import LinearOperator

    X, y, m, n = _check(X, y)
    p = 1 + m
    q = 2 + n + 1 + 2 * m

    # analytic row/col norms of A
    row_sq = np.concatenate([[1.0], np.sum(X * X, axis=1) + 3.0])
    col_sq = np.concatenate([
        [0.0, 1.0], np.sum(X * X, axis=0), [float(m)], np.ones(2 * m)
    ])
    if scaled:
        D = np.sqrt(np.sqrt(row_sq))
        E = np.sqrt(np.sqrt(np.maximum(col_sq, 1e-8)))
        # tie E over the RSOC block (r, s, w) like the conic pipeline
        E[: 2 + n] = E[: 2 + n].mean()
    else:
        D = np.ones(p)
        E = np.ones(q)

    Xj = jnp.asarray(X)
    yj = jnp.asarray(y)
    Dj = jnp.asarray(D)
    Ej = jnp.asarray(E)

    def matvec(z):
        z = z / Ej
        s_var = z[1]
        w = z[2 : 2 + n]
        b0 = z[2 + n]
        xi = z[3 + n : 3 + n + m]
        t = z[3 + n + m :]
        rows = yj * (Xj @ w) + yj * b0 + xi - t
        return jnp.concatenate([s_var[None], rows]) / Dj

    def rmatvec(u):
        u = u / Dj
        u0, ur = u[0], u[1:]
        yu = yj * ur
        return jnp.concatenate([
            jnp.zeros((1,), u.dtype), u0[None], Xj.T @ yu,
            jnp.dot(yj, ur)[None], ur, -ur,
        ]) / Ej

    op = LinearOperator(p, q, matvec, rmatvec, nnz=m * n + 3 * m + 1)
    # exact Jacobi diag of the scaled operator (`init_svm_precon`,
    # `svm_config.c:642-664`: per-column sums over row-scaled entries)
    Dr = D[1:]
    Xd_sq = np.sum((X / Dr[:, None]) ** 2, axis=0)
    exact_col = np.concatenate([
        [0.0, 1.0 / D[0] ** 2], Xd_sq, [float(np.sum(1.0 / Dr**2))],
        1.0 / Dr**2, 1.0 / Dr**2,
    ])
    op.col_norms_sq = exact_col / (E * E)

    b = np.concatenate([[1.0], np.ones(m)])
    c = np.zeros(q)
    c[0] = 1.0
    c[3 + n : 3 + n + m] = C
    sc = float(np.sqrt(np.sqrt(b @ b + c @ c)))
    sc = 1.0 if sc < 1e-3 else min(sc, 1e3)
    sc_b = sc_c = 1.0 / sc
    b_s = b / D * sc_b
    c_s = c / E * sc_c
    cones = ConeSpec(rsoc=(2 + n,), free=1, nonneg=2 * m)

    def recover(sol):
        z = np.asarray(sol.x) / (E * sc_b)
        w, b0 = z[2 : 2 + n], z[2 + n]
        margins = 1 - y * (X @ w + b0)
        obj = 0.5 * w @ w + C * np.sum(np.maximum(margins, 0))
        return w, b0, obj

    def solver_factory(op_, rho_y_vec, rho_x_vec, Q_diag_s):
        """Custom KKT (see svm_operator_qp): row 0 touches only the s
        column (pure diagonal); rows 1..m carry the rank-(n+1) part."""
        from ..linsys.schur import LowRankWoodburySolver

        H = rho_x_vec + (Q_diag_s if Q_diag_s is not None else 0.0)
        H_inv = 1.0 / H
        ht = H_inv / (Ej * Ej)
        Dr_j = Dj[1:]
        U_rows = (yj[:, None] * jnp.concatenate(
            [Xj, jnp.ones((m, 1), Xj.dtype)], axis=1)) / Dr_j[:, None]
        U_rows = U_rows * jnp.sqrt(ht[2 : 3 + n])[None, :]
        U = jnp.concatenate(
            [jnp.zeros((1, n + 1), Xj.dtype), U_rows], axis=0)
        Hu = jnp.ones((n + 1,), Xj.dtype)
        g0 = (ht[1] / (Dj[0] * Dj[0]))[None]
        g_rows = (ht[3 + n : 3 + n + m] + ht[3 + n + m :]) / (Dr_j * Dr_j)
        g = jnp.concatenate([g0, g_rows])
        return LowRankWoodburySolver(op_, H_inv, rho_y_vec, U, Hu, g)

    return ConicProblem(A=op, b=b_s, c=c_s, cones=cones, recover=recover,
                        tol_ladder=SVM_PCG_LADDER,
                        solver_factory=solver_factory)


def solve_svm(X, y, C: float, form: str = "qp", settings=None,
              matrix_free: bool = False, **overrides):
    """One-call SVM solve; returns (w, b0, objective, conic solution).

    `form` selects the QP or SOCP embedding (the reference exposes both via
    `prob_type`, `mex/abip_ml_mex.c:90-146`).  `matrix_free=True` applies
    the label-folded data on the fly with CG solves (both forms).
    """
    from ..qcp import conic_defaults, solve_qcp

    if matrix_free:
        if form == "qp":
            prob = svm_operator_qp(X, y, C)
        elif form == "socp":
            prob = svm_operator_socp(X, y, C)
        else:
            raise ValueError(f"form must be 'qp' or 'socp'; got {form!r}")
        settings = settings or conic_defaults(normalize=False, linsys="cg")
    elif form == "qp":
        prob = svm_to_conic_qp(X, y, C)
    elif form == "socp":
        prob = svm_to_conic_socp(X, y, C)
    else:
        raise ValueError(f"form must be 'qp' or 'socp'; got {form!r}")
    sol = solve_qcp(prob.A, prob.b, prob.c, prob.cones, Q=prob.Q,
                    settings=settings, tol_ladder=prob.tol_ladder,
                    solver_factory=prob.solver_factory, **overrides)
    w, b0, obj = prob.recover(sol)
    return w, b0, obj, sol
