"""Unified front door: dispatch LP vs conic on problem structure.

Equivalent of the reference MATLAB dispatcher
(`/root/reference/scripts/matlab/abip.m:22-28`): a problem with a
quadratic term or non-orthant cones routes to the conic driver; a plain
`Ax = b, x >= 0` problem takes the LP-specialized fast path.
"""
from __future__ import annotations



def solve(A, b, c, cones=None, Q=None, settings=None, **overrides):
    """Solve min (1/2)x'Qx + c'x s.t. Ax = b, x in K.

    cones: a `ConeSpec`, or None for K = R+^n (LP).
    Returns an `LPSolution` or `ConicSolution` accordingly.
    """
    from .cones import ConeSpec

    n = A.shape[1]
    lp_shaped = Q is None and (
        cones is None
        or (isinstance(cones, ConeSpec)
            and not cones.soc and not cones.rsoc
            and cones.free == 0 and cones.zero == 0
            and cones.nonneg == n)
    )
    if lp_shaped:
        from .lp import solve_lp

        return solve_lp(A, b, c, settings or _default_lp(), **overrides)

    from .qcp import conic_defaults, solve_qcp

    if cones is None:
        cones = ConeSpec.lp(n)
    return solve_qcp(A, b, c, cones, Q=Q,
                     settings=settings or conic_defaults(), **overrides)


def _default_lp():
    from .settings import Settings

    return Settings()
