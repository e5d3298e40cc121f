"""LASSO as a rotated-second-order-cone program.

    min_w  (1/2) ||X w - y||^2 + lam * ||w||_1

Conic embedding (the reference's, `source/lasso_config.c:8-93` +
`mex/abip_ml_mex.c:320-330`, with the hand-tuned scale constants dropped --
our equilibration pipeline replaces them):

    variables  z = (t1, t2, r in R^m, w+ in R^n, w- in R^n)
    cones      K = RSOC(2+m) x R+^{2n}
    rows       t1 = 1
               r + X (w+ - w-) = y          (so r = y - X w)
    objective  min  t2 + lam * 1'(w+ + w-)

RSOC gives 2 t1 t2 >= ||r||^2 with t1 = 1, i.e. t2 >= ||y - Xw||^2 / 2,
tight at the optimum; w = w+ - w- recovers the signed weights.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..cones import ConeSpec


@dataclasses.dataclass
class ConicProblem:
    A: np.ndarray
    b: np.ndarray
    c: np.ndarray
    cones: ConeSpec
    recover: callable
    Q: np.ndarray | None = None


def lasso_to_conic(X, y, lam: float) -> ConicProblem:
    X = np.asarray(X, float)
    y = np.asarray(y, float)
    m, n = X.shape
    if y.shape != (m,):
        raise ValueError(f"y must have shape ({m},); got {y.shape}")
    if lam <= 0:
        raise ValueError("lam must be positive")

    q = 2 + m + 2 * n
    p = 1 + m
    A = np.zeros((p, q))
    A[0, 0] = 1.0                       # t1 = 1
    A[1:, 2 : 2 + m] = np.eye(m)        # r
    A[1:, 2 + m : 2 + m + n] = X        # + X w+
    A[1:, 2 + m + n :] = -X             # - X w-
    b = np.concatenate([[1.0], y])
    c = np.zeros(q)
    c[1] = 1.0
    c[2 + m :] = lam

    cones = ConeSpec(rsoc=(2 + m,), nonneg=2 * n)

    def recover(sol):
        z = sol.x
        w = z[2 + m : 2 + m + n] - z[2 + m + n :]
        obj = 0.5 * np.sum((X @ w - y) ** 2) + lam * np.sum(np.abs(w))
        return w, obj

    return ConicProblem(A=A, b=b, c=c, cones=cones, recover=recover)


def solve_lasso(X, y, lam: float, settings=None, **overrides):
    """One-call LASSO solve; returns (w, objective, conic solution).

    Mirrors the `abip_ml` front door (`mex/abip_ml_mex.c:90-146`)."""
    from ..qcp import solve_qcp

    prob = lasso_to_conic(X, y, lam)
    sol = solve_qcp(prob.A, prob.b, prob.c, prob.cones,
                    settings=settings, **overrides)
    w, obj = prob.recover(sol)
    return w, obj, sol
