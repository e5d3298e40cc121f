"""Matrix equilibration: the four composable rescalings of the reference.

TPU-native re-derivation of `ABIP(_normalize_A)`
(`/root/reference/src/abip-lp/linsys/common.c:150-565`): pc (sqrt-L1
col/row), origin (L2), Ruiz (iterated sqrt-Linf), and qp (geometric
min*max).  The reference mutates a CSC matrix nonzero-by-nonzero; here each
pass is a pair of row/column reductions + a rank-1 rescale on the dense
operand -- embarrassingly parallel on the VPU, and the whole pipeline jits
into a handful of fused kernels.

D and E accumulate all applied row/column scalings so that
A_scaled = diag(1/D) @ A @ diag(1/E) * scale.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

MIN_SCALE = 1e-3
MAX_SCALE = 1e3


class ScalingData(NamedTuple):
    D: jnp.ndarray           # row scalings (m,)
    E: jnp.ndarray           # column scalings (n,)
    mean_norm_row: jnp.ndarray  # mean row 2-norm of the scaled A
    mean_norm_col: jnp.ndarray  # mean col 2-norm of the scaled A


def _clip_col(e, n_rows):
    """Column-scale guard (`common.c:224-229`): tiny -> 1, huge -> cap."""
    lo = MIN_SCALE * jnp.sqrt(jnp.asarray(n_rows, e.dtype))
    hi = MAX_SCALE * jnp.sqrt(jnp.asarray(n_rows, e.dtype))
    return jnp.where(e < lo, 1.0, jnp.minimum(e, hi))


def _pc_pass(A):
    """sqrt-L1 column then row scaling (`common.c:217-266`)."""
    m, n = A.shape
    e = jnp.sqrt(jnp.sum(jnp.abs(A), axis=0))
    E = _clip_col(e, m)
    A = A / E[None, :]
    d = jnp.sqrt(jnp.sum(jnp.abs(A), axis=1))
    D = _clip_col(d, n)
    A = A / D[:, None]
    return A, D, E


def _origin_pass(A):
    """L2 column then row scaling (`common.c:279-327`)."""
    m, n = A.shape
    e = jnp.linalg.norm(A, axis=0)
    E = _clip_col(e, m)
    A = A / E[None, :]
    d = jnp.linalg.norm(A, axis=1)
    D = _clip_col(d, n)
    A = A / D[:, None]
    return A, D, E


def _ruiz_pass(A, iters):
    """Iterated sqrt-Linf scaling (`common.c:339-413`)."""
    m, n = A.shape

    def body(_, carry):
        A, D, E = carry
        e = jnp.sqrt(jnp.max(jnp.abs(A), axis=0))
        Et = _clip_col(e, m)
        A = A / Et[None, :]
        d = jnp.sqrt(jnp.max(jnp.abs(A), axis=1))
        Dt = _clip_col(d, n)
        A = A / Dt[:, None]
        return A, D * Dt, E * Et

    D0 = jnp.ones((m,), A.dtype)
    E0 = jnp.ones((n,), A.dtype)
    return jax.lax.fori_loop(0, iters, body, (A, D0, E0))


def _qp_pass(A):
    """Geometric-mean (min*max of |nonzeros|) scaling (`common.c:415-509`)."""
    m, n = A.shape
    absA = jnp.abs(A)
    big = jnp.where(absA > 0, absA, -jnp.inf)
    small = jnp.where(absA > 0, absA, jnp.inf)

    col_max = jnp.max(big, axis=0)
    col_min = jnp.min(small, axis=0)
    e = jnp.sqrt(jnp.where(jnp.isfinite(col_max), col_min * col_max, 0.0))
    E = _clip_col(e, m)
    A = A / E[None, :]

    absA = jnp.abs(A)
    big = jnp.where(absA > 0, absA, -jnp.inf)
    small = jnp.where(absA > 0, absA, jnp.inf)
    row_max = jnp.max(big, axis=1)
    row_min = jnp.min(small, axis=1)
    d = jnp.sqrt(jnp.where(jnp.isfinite(row_max), row_min * row_max, 0.0))
    D = _clip_col(d, n)
    A = A / D[:, None]
    return A, D, E


def equilibrate(A: jnp.ndarray, settings) -> tuple[jnp.ndarray, ScalingData]:
    """Full pipeline (`common.c:150-565`): pc -> origin -> ruiz -> qp.

    Returns the scaled matrix (including the global `scale` factor) and the
    accumulated D/E plus the mean row/col norms used by b/c normalization.
    """
    m, n = A.shape
    D = jnp.ones((m,), A.dtype)
    E = jnp.ones((n,), A.dtype)

    if settings.pc_ruiz_rescale:
        A, Dp, Ep = _pc_pass(A)
        D, E = D * Dp, E * Ep
    if settings.origin_rescale:
        A, Do, Eo = _origin_pass(A)
        D, E = D * Do, E * Eo
    if settings.pc_ruiz_rescale:
        A, Dr, Er = _ruiz_pass(A, settings.ruiz_iter)
        D, E = D * Dr, E * Er
    if settings.qp_rescale:
        A, Dq, Eq = _qp_pass(A)
        D, E = D * Dq, E * Eq

    mean_norm_row = jnp.mean(jnp.linalg.norm(A, axis=1))
    mean_norm_col = jnp.mean(jnp.linalg.norm(A, axis=0))

    if settings.scale != 1:
        A = A * settings.scale

    return A, ScalingData(D=D, E=E, mean_norm_row=mean_norm_row,
                          mean_norm_col=mean_norm_col)
