"""Fused conic DR sprint: T whole QCP iterations in ONE Pallas launch.

The conic device route was the round-3 performance gap (1.4-1.9x the
reference QDLDL rate at dim 204-2040): each Douglas-Rachford iteration
lowers to ~50 small sequential XLA ops, the same per-op-latency disease
the LP sprint kernel (`ops/admm_pallas.py`) cured.  This kernel keeps
A, the explicit Schur inverse (or the Woodbury dual factor), the cone
block indicator matrices, and the iterate resident in VMEM and runs up
to T complete conic iterations -- projection with the quadratic-formula
tau (`source/abip.c:186-254`), cone barrier prox
(`source/cones.c:130-289`), dual update (`source/abip.c:314`) -- inside
one kernel, probing the inner stopping criterion
(`qcp_inner_conv_check`, `source/qcp_config.c:518-557`) every `probe`
iterations in-VMEM.

Cone prox without scatters: the segment reductions of
`cones._soc_blocks`/`_rsoc_blocks` become MXU matmuls against 0/1
block-indicator matrices (Mh1: block-head rows, Mh2: RSOC second
heads, Mb: block bodies), and the scatter-back is the transpose
product.  Per-block formulas stay the branch-free selects of
`abip_tpu.cones` (f32).

Layout rules follow the LP kernel (admm_pallas.py module docstring):
everything 2-D (rows, 128)-tiled f32 VMEM; vectors ride (1, kp) rows;
HIGHEST matmul precision (the MXU's default bf16 rounding destroys the
cancellation-heavy tau quadratic).  Zero padding is contamination-free:
padded x coordinates are zero-cone elements with zero A columns, so
they stay exactly 0 through prox and dual updates.

f32 only: the inner engine of the conic anchored mixed-precision
scheme -- sprint while mu is large, anchored-f64 endgame below the
switch (`parallel/batched_qcp.py`).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .spmv_pallas import vmem_params

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_TINY = 1e-30
_SOC_TOL = 1e-6
_EPS_TAU = 1e-18


def _c(v):
    """f32 constant for jnp.where branches: under x64 mode a Python
    literal in `where` promotes to f64, which reaches the Mosaic kernel
    as an unsupported f64->f32 truncf (measured: dim-1020 remote
    compile failed to legalize 'tpu.truncf')."""
    return jnp.float32(v)

f32 = jnp.float32


def _dot_t(a, M):
    """(1, k) x (r, k) -> (1, r): contract a's lanes with M's rows
    (HIGHEST: see admm_pallas._dot_t)."""
    return jax.lax.dot_general(a, M, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _dot(a, M):
    """(1, r) x (r, k) -> (1, k)."""
    return jax.lax.dot_general(a, M, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _prox_nn(t, lam):
    """Positive-orthant barrier prox (`cones.c:279-289`), branch-free."""
    pos = 0.5 * (t + jnp.sqrt(t * t + 4.0 * lam))
    neg = 2.0 * lam / (
        -t * (1.0 + jnp.sqrt(1.0 + 4.0 * lam / (t * t + _TINY))) + _TINY)
    return jnp.where(t >= 0, pos, neg)


def _soc_rows(a, bsq, lam):
    """SOC barrier prox per block row (`cones.c:130-161`); operands are
    (1, nbp) rows.  Returns (head_value, body_scale)."""
    x0_zero = jnp.sqrt(2.0 * lam + bsq / 4.0)
    denom_r = 8.0 * lam - a * a + bsq
    r = 16.0 * a * a / (
        denom_r + jnp.sqrt(denom_r * denom_r + 32.0 * a * a * lam) + _TINY)
    disc = jnp.sqrt(jnp.maximum(r * (r + 8.0), 0.0))
    s = jnp.where(a > 0, (r + disc) / 2.0, (r - disc) / 2.0)
    s_safe = jnp.where(jnp.abs(s) < _TINY, _c(_TINY), s)
    eta = (s + 2.0) * a / s_safe
    scale_pos = (s + 2.0) / (s + 4.0)
    small = jnp.abs(a) <= _SOC_TOL
    return (jnp.where(small, x0_zero, eta),
            jnp.where(small, _c(0.5), scale_pos))


def _rsoc_rows(ze, zn, zxsq, lam):
    """RSOC barrier prox per block row (`cones.c:169-248`); (1, nbp)
    rows.  Returns (head1, head2, body_scale)."""
    sum_zz = ze + zn
    d = 2.0 * ze * zn - zxsq
    g = d / (2.0 * lam)
    g_neg = jnp.where(g < 0, -g, _c(1.0))
    g_pos = jnp.where(g > 0, g, _c(1.0))
    q = 4.0 * (ze * ze + zn * zn + zxsq) / lam + 16.0
    w_neg = (2.0 * sum_zz * sum_zz / lam) / g_neg / (
        1.0 + 4.0 / g_neg + jnp.sqrt(1.0 + q / (g_neg * g_neg)))
    w_pos = g_pos * (
        1.0 - 4.0 / g_pos + jnp.sqrt(1.0 + q / (g_pos * g_pos))) / 2.0
    w = jnp.where(d < 0, w_neg, w_pos)
    root = jnp.sqrt(jnp.maximum(w * (w + 4.0), 0.0))
    s_a = (w + root) / 2.0
    s_b = 2.0 / (w + 2.0 + root + _TINY)
    s_c = (w - root) / 2.0

    def heads_std(s):
        den = s * (s + 2.0)
        den = jnp.where(jnp.abs(den) < _TINY, _c(_TINY), den)
        x1 = (ze * (s + 1.0) ** 2 + zn * (s + 1.0)) / den
        x2 = (zn * (s + 1.0) ** 2 + ze * (s + 1.0)) / den
        return x1, x2, (s + 1.0) / (s + 2.0)

    def heads_b(s):
        den = (s - 1.0) * (s + 1.0)
        den = jnp.where(jnp.abs(den) < _TINY, _c(_TINY), den)
        x1 = (ze * s * s + zn * s) / den
        x2 = (zn * s * s + ze * s) / den
        return x1, x2, s / (s + 1.0)

    xa1, xa2, sca = heads_std(s_a)
    xb1, xb2, scb = heads_b(s_b)
    xc1, xc2, scc = heads_std(s_c)
    pos_branch = sum_zz > 0
    b_branch = (~pos_branch) & (w > 10.0)
    x1 = jnp.where(pos_branch, xa1, jnp.where(b_branch, xb1, xc1))
    x2 = jnp.where(pos_branch, xa2, jnp.where(b_branch, xb2, xc2))
    sc = jnp.where(pos_branch, sca, jnp.where(b_branch, scb, scc))
    x2_deg = (-ze + jnp.sqrt(ze * ze + 4.0 * lam + zxsq)) / 2.0
    deg = sum_zz == 0
    x1 = jnp.where(deg, x2_deg + ze, x1)
    x2 = jnp.where(deg, x2_deg, x2)
    sc = jnp.where(deg, _c(0.5), sc)
    return x1, x2, sc


class ConeKernelData(NamedTuple):
    """Padded f32 cone-structure operands for the fused DR kernel.

    Built once at setup by `cone_kernel_data`; all leaves are arrays so
    a heterogeneous batch can vmap over them."""

    mask_nn: jnp.ndarray    # (1, np)  nonneg elements
    mask_free: jnp.ndarray  # (1, np)  free elements
    mask_blk: jnp.ndarray   # (1, np)  SOC|RSOC elements
    maskx: jnp.ndarray      # (1, np)  valid (un-padded) elements
    Mh1: jnp.ndarray        # (nbp, np) block-head indicator
    Mh2: jnp.ndarray        # (nbp, np) RSOC 2nd-head indicator
    Mb: jnp.ndarray         # (nbp, np) block-body indicator
    soc_blk: jnp.ndarray    # (1, nbp)  1 where the block is SOC


def cone_kernel_data(layout, n_pad, nb_pad=None) -> ConeKernelData:
    """Indicator-matrix encoding of a `ConeLayout` for the kernel.

    The segment_sum/scatter pairs of `cones.cone_barrier_prox` become
    matmuls against these 0/1 matrices (MXU-friendly, no scatters --
    Mosaic implements neither segment_sum nor .at[].set)."""
    kind = np.asarray(layout.kind)
    seg = np.asarray(layout.seg)
    head = np.asarray(layout.head)
    n = kind.shape[0]
    nb = int(layout.num_blocks)
    if nb_pad is None:
        nb_pad = max(8, -(-nb // 8) * 8)
    _NONNEG, _FREE, _ZERO, _SOC, _RSOC = 0, 1, 2, 3, 4

    def row(mask):
        out = np.zeros((1, n_pad), np.float32)
        out[0, :n] = mask.astype(np.float32)
        return out

    Mh1 = np.zeros((nb_pad, n_pad), np.float32)
    Mh2 = np.zeros((nb_pad, n_pad), np.float32)
    Mb = np.zeros((nb_pad, n_pad), np.float32)
    soc_blk = np.zeros((1, nb_pad), np.float32)
    in_blk = (kind == _SOC) | (kind == _RSOC)
    idx = np.arange(n)
    h1 = in_blk & (head == 1)
    h2 = in_blk & (head == 2)
    body = in_blk & (head == 0)
    Mh1[seg[h1], idx[h1]] = 1.0
    Mh2[seg[h2], idx[h2]] = 1.0
    Mb[seg[body], idx[body]] = 1.0
    soc_seg = np.unique(seg[kind == _SOC])
    soc_blk[0, soc_seg] = 1.0
    return ConeKernelData(
        mask_nn=jnp.asarray(row(kind == _NONNEG)),
        mask_free=jnp.asarray(row(kind == _FREE)),
        mask_blk=jnp.asarray(row(in_blk)),
        maskx=jnp.asarray(row(np.ones(n, bool))),
        Mh1=jnp.asarray(Mh1), Mh2=jnp.asarray(Mh2), Mb=jnp.asarray(Mb),
        soc_blk=jnp.asarray(soc_blk))


def _cone_prox(tx, lam_x, cd: ConeKernelData):
    """Full cone barrier prox on a (1, np) row (f32, matmul segments)."""
    out = cd.mask_nn * _prox_nn(tx, lam_x) + cd.mask_free * tx
    # block reductions as matmuls
    S1 = _dot_t(tx, cd.Mh1)          # (1, nbp) head values
    S2 = _dot_t(tx, cd.Mh2)
    SB = _dot_t(tx * tx, cd.Mb)      # body sum-of-squares
    soc_h, soc_s = _soc_rows(S1, SB, lam_x)
    rs1, rs2, rs_s = _rsoc_rows(S1, S2, SB, lam_x)
    h1v = jnp.where(cd.soc_blk > 0, soc_h, rs1)
    scv = jnp.where(cd.soc_blk > 0, soc_s, rs_s)
    xb = _dot(h1v, cd.Mh1) + _dot(rs2, cd.Mh2) + tx * _dot(scv, cd.Mb)
    return out + cd.mask_blk * xb


def _make_dr_fns(A, Minv, H_inv, ry, rx, b, c, Qd, cd,
                 rho_y, rho_x, rho_tau, a_coef, alpha, k0, woodbury):
    """The two per-iteration closures of the fused DR engines:
    `iter_body(lam)(i, carry)` (one conic DR iteration at barrier lam)
    and `err_inner(carry)` (`qcp_inner_conv_check`,
    `qcp_config.c:518-557`, in f32).  Shared by the single-stage sprint
    kernel and the multi-stage ladder kernel."""
    inv_ry = 1.0 / rho_y
    maskx = cd.maskx

    def solve_S(rhs):
        if woodbury:
            t = H_inv * rhs
            u = _dot_t(_dot_t(t, A), Minv)       # Ginv @ (A t)
            return t - H_inv * _dot(u, A)
        return _dot(rhs, Minv)                    # Sinv symmetric

    def iter_body_at(lam):
        lam_x = lam / rho_x
        lam_tau = lam / rho_tau

        def iter_body(i, carry):
            y, x, vy, vx, tau, kappa = carry
            wy = rho_y * (y + vy)
            wx = rho_x * (x + vx)
            eta = rho_tau * (tau + kappa)
            rhs = wx + inv_ry * _dot(wy, A)       # w_x + A'(w_y/rho_y)
            zx = solve_S(rhs) * maskx
            Az = _dot_t(zx, A)                    # (1, mp)
            zy = inv_ry * (wy - Az)
            b_coef = (jnp.sum(ry * wy) + jnp.sum(rx * wx)
                      - 2.0 * (rho_y * jnp.sum(ry * zy)
                               + rho_x * jnp.sum(rx * zx)) - eta)
            c_coef = -jnp.sum(zx * Qd * zx)
            disc = jnp.maximum(b_coef * b_coef - 4.0 * a_coef * c_coef, 0.0)
            tau_t = (-b_coef + jnp.sqrt(disc)) / (2.0 * a_coef)
            tau_t = jnp.where(k0 + i.astype(f32) > 0, tau_t, _c(1.0))
            uty = zy - tau_t * ry
            utx = zx - tau_t * rx
            rel_y = alpha * uty + (1.0 - alpha) * y
            rel_x = alpha * utx + (1.0 - alpha) * x
            rel_tau = alpha * tau_t + (1.0 - alpha) * tau
            ty = rel_y - vy
            tx = rel_x - vx
            ttau = rel_tau - kappa
            y_new = ty                            # free-cone head
            x_new = _cone_prox(tx, lam_x, cd) * maskx
            tau_new = _prox_nn(ttau, lam_tau)
            vy_new = vy + y_new - rel_y           # identically 0 after 1 iter
            vx_new = (vx + x_new - rel_x) * maskx
            kappa_new = kappa + tau_new - rel_tau
            return (y_new, x_new, vy_new, vx_new, tau_new, kappa_new)

        return iter_body

    def err_inner(y, x, vy, vx, tau, kappa):
        # `qcp_inner_conv_check` (`qcp_config.c:518-557`) in f32
        Mu_y = _dot_t(x, A)                        # A x
        Mu_x = (Qd * x - _dot(y, A)) * maskx       # Qx - A'y
        Qu_y = Mu_y - b * tau
        Qu_x = (Mu_x + c * tau) * maskx
        tau_safe = jnp.where(jnp.abs(tau) < _EPS_TAU, _c(_EPS_TAU), tau)
        Qu_tau = (-(jnp.sum(y * Mu_y) + jnp.sum(x * Mu_x)) / tau_safe
                  + jnp.sum(y * b) - jnp.sum(x * c))
        von_y = rho_y * vy
        von_x = rho_x * vx
        von_tau = rho_tau * kappa
        d2 = (jnp.sum((Qu_y - von_y) ** 2) + jnp.sum((Qu_x - von_x) ** 2)
              + (Qu_tau - von_tau) ** 2)
        qn = jnp.sqrt(jnp.sum(Qu_y * Qu_y) + jnp.sum(Qu_x * Qu_x)
                      + Qu_tau * Qu_tau)
        vn = jnp.sqrt(jnp.sum(von_y * von_y) + jnp.sum(von_x * von_x)
                      + von_tau * von_tau)
        return jnp.sqrt(d2) / (1.0 + qn + vn)

    return iter_body_at, err_inner


def _dr_sprint_compute(scal, A, Minv, H_inv, ry, rx, b, c, Qd, cd,
                       y0, x0, vy0, vx0, *, T, probe, woodbury):
    """Up to T f32 conic DR iterations with the in-VMEM inner-criterion
    stop every `probe` iterations.  Operands are padded 2-D blocks;
    shared verbatim by the Pallas kernel and the XLA fallback.

    Minv: Sinv (np, np) when not woodbury, else Ginv (mp, mp) with
    H_inv (1, np) the diagonal dual-form inverse.
    Returns (y, x, vy, vx, out_row) with out_row (1, 128) holding
    [tau, kappa, err, t_done]."""
    rho_y = scal[0, 0]
    rho_x = scal[0, 1]
    rho_tau = scal[0, 2]
    a_coef = scal[0, 3]
    lam = scal[0, 4]
    alpha = scal[0, 5]
    tau0 = scal[0, 6]
    kappa0 = scal[0, 7]
    thresh = scal[0, 8]
    k0 = scal[0, 9]
    iter_body_at, err_inner = _make_dr_fns(
        A, Minv, H_inv, ry, rx, b, c, Qd, cd,
        rho_y, rho_x, rho_tau, a_coef, alpha, k0, woodbury)
    iter_body = iter_body_at(lam)

    def trip_cond(cry):
        t = cry[0]
        e = cry[7]
        return jnp.logical_and(t < T, e >= thresh)

    def trip_body(cry):
        t, y, x, vy, vx, tau, kappa, _e = cry
        y, x, vy, vx, tau, kappa = jax.lax.fori_loop(
            t, t + probe, iter_body, (y, x, vy, vx, tau, kappa))
        e = err_inner(y, x, vy, vx, tau, kappa)
        return (t + probe, y, x, vy, vx, tau, kappa, e)

    t, y, x, vy, vx, tau, kappa, e = jax.lax.while_loop(
        trip_cond, trip_body,
        (jnp.zeros((), jnp.int32), y0, x0, vy0, vx0, tau0, kappa0,
         jnp.full((), jnp.inf, f32)))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    z = _c(0.0)
    out = jnp.where(col == 0, tau, z)
    out = out + jnp.where(col == 1, kappa, z)
    out = out + jnp.where(col == 2, e, z)
    out = out + jnp.where(col == 3, t.astype(f32), z)
    return y, x, vy, vx, out.astype(f32)


_CD_FIELDS = len(ConeKernelData._fields)


def _dr_kernel(scal_ref, A_ref, Minv_ref, Hinv_ref, ry_ref, rx_ref, b_ref,
               c_ref, Qd_ref, *rest, T, probe, woodbury):
    cd = ConeKernelData(*[r[:] for r in rest[:_CD_FIELDS]])
    y_ref, x_ref, vy_ref, vx_ref = rest[_CD_FIELDS:_CD_FIELDS + 4]
    yo, xo, vyo, vxo, sco = rest[_CD_FIELDS + 4:]
    y, x, vy, vx, out = _dr_sprint_compute(
        scal_ref[:], A_ref[:], Minv_ref[:], Hinv_ref[:], ry_ref[:],
        rx_ref[:], b_ref[:], c_ref[:], Qd_ref[:], cd,
        y_ref[:], x_ref[:], vy_ref[:], vx_ref[:],
        T=T, probe=probe, woodbury=woodbury)
    yo[:] = y
    xo[:] = x
    vyo[:] = vy
    vxo[:] = vx
    sco[:] = out


def _dr_kernel_batched(scal_ref, A_ref, Minv_ref, Hinv_ref, ry_ref, rx_ref,
                       b_ref, c_ref, Qd_ref, *rest, T, probe, woodbury):
    """Grid-over-instances shell: every ref is a (1, ...) block."""
    cd = ConeKernelData(*[r[0] for r in rest[:_CD_FIELDS]])
    y_ref, x_ref, vy_ref, vx_ref = rest[_CD_FIELDS:_CD_FIELDS + 4]
    yo, xo, vyo, vxo, sco = rest[_CD_FIELDS + 4:]
    y, x, vy, vx, out = _dr_sprint_compute(
        scal_ref[0], A_ref[0], Minv_ref[0], Hinv_ref[0], ry_ref[0],
        rx_ref[0], b_ref[0], c_ref[0], Qd_ref[0], cd,
        y_ref[0], x_ref[0], vy_ref[0], vx_ref[0],
        T=T, probe=probe, woodbury=woodbury)
    yo[:] = y[None]
    xo[:] = x[None]
    vyo[:] = vy[None]
    vxo[:] = vx[None]
    sco[:] = out[None]


def _dr_op(T, probe, woodbury, interpret):
    """pallas dispatch with an explicit grid-over-instances vmap rule
    (auto-derived batched block specs fail Mosaic; see
    admm_pallas._stop_op)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(*args):
        mp = args[1].shape[0]
        np_ = args[1].shape[1]
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_dr_kernel, T=T, probe=probe, woodbury=woodbury),
            out_shape=(
                jax.ShapeDtypeStruct((1, mp), f32),
                jax.ShapeDtypeStruct((1, np_), f32),
                jax.ShapeDtypeStruct((1, mp), f32),
                jax.ShapeDtypeStruct((1, np_), f32),
                jax.ShapeDtypeStruct((1, 128), f32),
            ),
            in_specs=[vmem] * len(args),
            out_specs=(vmem,) * 5,
            compiler_params=vmem_params(
                4 * sum(int(np.prod(a.shape)) for a in args)),
            interpret=interpret,
        )(*args)

    @op.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        B = axis_size
        args = [a if batched else jnp.broadcast_to(a, (B,) + a.shape)
                for a, batched in zip(args, in_batched)]
        _, mp, np_ = args[1].shape
        z = np.int32(0)
        mat3 = lambda r, c: pl.BlockSpec(  # noqa: E731
            (1, r, c), lambda bb: (bb, z, z), memory_space=pltpu.VMEM)
        specs = [mat3(a.shape[1], a.shape[2]) for a in args]
        outs = pl.pallas_call(
            partial(_dr_kernel_batched, T=T, probe=probe,
                    woodbury=woodbury),
            grid=(B,),
            out_shape=(
                jax.ShapeDtypeStruct((B, 1, mp), f32),
                jax.ShapeDtypeStruct((B, 1, np_), f32),
                jax.ShapeDtypeStruct((B, 1, mp), f32),
                jax.ShapeDtypeStruct((B, 1, np_), f32),
                jax.ShapeDtypeStruct((B, 1, 128), f32),
            ),
            in_specs=specs,
            out_specs=(mat3(1, mp), mat3(1, np_), mat3(1, mp),
                       mat3(1, np_), mat3(1, 128)),
            compiler_params=vmem_params(
                4 * sum(int(np.prod(a.shape[1:])) for a in args)),
            interpret=interpret,
        )(*args)
        return tuple(outs), (True,) * 5

    return op


def _pad128(k):
    return -(-k // 128) * 128


def _pad_vec(x, k, kp):
    return jnp.zeros((1, kp), f32).at[0, :k].set(x.astype(f32))


def _pad_mat(M, r, c, rp, cp):
    return jnp.zeros((rp, cp), f32).at[:r, :c].set(M.astype(f32))


@partial(jax.jit, static_argnames=("T", "probe", "woodbury", "interpret",
                                  "use_pallas"))
def fused_dr_sprint_stop(A32, Minv32, Hinv32, r_vec32, b32, c32, Qd32,
                         cd: ConeKernelData, rho_y, rho_x, rho_tau,
                         a_coef, lam, alpha, thresh, u32, v32, k0,
                         T=512, probe=8, woodbury=False,
                         interpret=False, use_pallas=None):
    """Run UP TO T f32 conic DR iterations in one launch, stopping
    within `probe`-1 iterations of the inner criterion `err < thresh`.

    A32 (m, n); Minv32 = Sinv (n, n) or (woodbury=True) Ginv (m, m)
    with Hinv32 (n,) the diagonal H^-1; r_vec32 (m+n,) and a_coef the
    tau-quadratic precompute (`pre_calculate`, `source/abip.c:886-910`);
    Qd32 (n,) the DIAGONAL quadratic term (zeros when Q is absent);
    cd from `cone_kernel_data` built at the PADDED width n_pad.

    Returns (u, v, t_done, err): f32 iterates (length m+n+1), the
    iteration count executed, and the final inner-criterion value.
    Batchable: under `vmap` a custom rule launches a grid-over-
    instances kernel.
    """
    m, n = A32.shape
    mp, np_ = _pad128(m), _pad128(n)
    if use_pallas is None:
        from .spmv_pallas import pallas_default, pallas_fits

        mk = mp if woodbury else np_
        use_pallas = pallas_default() and pallas_fits(
            4 * (mp * np_ + mk * mk
                 + cd.Mh1.shape[0] * np_ * 3 + 12 * (mp + np_)))
    l = m + n + 1
    if cd.maskx.shape[-1] != np_:
        raise ValueError(
            f"cone kernel data built at width {cd.maskx.shape[-1]}, "
            f"padded problem width is {np_}")
    scal_row = jnp.zeros((1, 128), f32)
    for i, s in enumerate((rho_y, rho_x, rho_tau, a_coef, lam, alpha,
                           u32[l - 1], v32[l - 1], thresh, k0)):
        scal_row = scal_row.at[0, i].set(jnp.asarray(s).astype(f32))
    A_p = _pad_mat(A32, m, n, mp, np_)
    if woodbury:
        Minv_p = _pad_mat(Minv32, m, m, mp, mp)
    else:
        Minv_p = _pad_mat(Minv32, n, n, np_, np_)
    Hinv_p = _pad_vec(Hinv32, n, np_)
    ry = _pad_vec(r_vec32[:m], m, mp)
    rx = _pad_vec(r_vec32[m:], n, np_)
    b_p = _pad_vec(b32, m, mp)
    c_p = _pad_vec(c32, n, np_)
    Qd_p = _pad_vec(Qd32, n, np_)
    y0 = _pad_vec(u32[:m], m, mp)
    x0 = _pad_vec(u32[m : m + n], n, np_)
    vy0 = _pad_vec(v32[:m], m, mp)
    vx0 = _pad_vec(v32[m : m + n], n, np_)
    args = (scal_row, A_p, Minv_p, Hinv_p, ry, rx, b_p, c_p, Qd_p,
            *cd, y0, x0, vy0, vx0)
    if use_pallas and _HAVE_PALLAS:
        y, x, vy, vx, sc = _dr_op(T, probe, woodbury, interpret)(*args)
    else:
        with jax.default_matmul_precision("highest"):
            y, x, vy, vx, sc = _dr_sprint_compute(
                scal_row, A_p, Minv_p, Hinv_p, ry, rx, b_p, c_p, Qd_p,
                ConeKernelData(*args[9:9 + _CD_FIELDS]), y0, x0, vy0,
                vx0, T=T, probe=probe, woodbury=woodbury)
    tau, kappa = sc[0, 0], sc[0, 1]
    err = sc[0, 2]
    t_done = sc[0, 3].astype(jnp.int32)
    u_out = jnp.concatenate([y[0, :m], x[0, :n], tau[None]])
    v_out = jnp.concatenate([vy[0, :m], vx[0, :n], kappa[None]])
    return u_out, v_out, t_done, err


# ---------------------------------------------------------------------------
# Multi-stage barrier-ladder kernel: the WHOLE conic phase 1 in one launch.
#
# The per-stage sprint engine pays a fixed ~0.5-0.8 s per barrier stage at
# dim-1020 B=16 on the remote v5e (kernel dispatch + operand streaming + the
# vmapped f64 residual round between stages) for ~8 f32 iterations of actual
# work -- phase 1 (mu: 1 -> 1e-3, ~4 stages) measured 2.46 s of the 2.9 s
# sprint2 wall (tools/conic_delta_probe.py).  This kernel carries
# (mu, tol_inner) through the sigma/gamma tables of `adjust_barrier`
# (`source/abip.c:994-1071`) IN-KERNEL, with the error-ratio input computed
# from f32 residuals (`calc_qcp_residuals`, `qcp_config.c:562-691`): during
# phase 1 the residuals sit orders of magnitude above eps, so f32 evaluates
# the >=22 bucket (and the mu/eps gamma table) exactly; the f64 residual
# pass and certificate checks run ONCE after the ladder returns.
# ---------------------------------------------------------------------------

def _adjust_barrier_f32(mu, err_ratio, eps, psi):
    """`adjust_barrier` (`source/abip.c:994-1071`) as f32 scalar selects
    (searchsorted tables unrolled into where-chains; Mosaic-safe)."""
    ratio = mu / eps
    redges = (5e-5, 1e-4, 5e-4, 1e-3, 5e-3, 1e-2, 5e-2, 1e-1, 0.5, 1.0,
              5.0, 10.0, 50.0, 100.0)
    rvals = (0.5, 0.6, 0.6, 0.7, 0.7, 0.8, 0.8, 0.9, 0.9, 1.0, 1.1, 1.2,
             1.3, 1.5, 0.5)
    gamma = _c(rvals[0])
    for e, v in zip(redges, rvals[1:]):
        gamma = jnp.where(ratio >= e, _c(v), gamma)
    medges = (1.5, 2.0, 3.0, 4.0, 6.0, 8.0, 12.0, 15.0, 18.0, 22.0)
    gmul = (2.4, 2.6, 2.8, 3.2, 3.4, 3.4, 3.6, 3.8, 4.0, 4.2, 4.4)
    sigv = (0.85, 0.85, 0.85, 0.83, 0.82, 0.81, 0.8, 0.8, 0.8, 0.8, 0.8)
    gm = _c(gmul[0])
    sg = _c(sigv[0])
    for e, gv, sv in zip(medges, gmul[1:], sigv[1:]):
        gm = jnp.where(err_ratio >= e, _c(gv), gm)
        sg = jnp.where(err_ratio >= e, _c(sv), sg)
    mu_new = sg * _c(0.2) * mu
    tol = gamma * gm * (mu_new if psi == 1.0 else mu_new ** _c(psi))
    return mu_new, tol


# ladder scal-row slots (beyond the sprint's 0..9)
(_L_RHOY, _L_RHOX, _L_RHOT, _L_ACOEF, _L_MU, _L_ALPHA, _L_TAU, _L_KAPPA,
 _L_TOL, _L_K0, _L_MUSTOP, _L_EPS, _L_SCB, _L_SCC, _L_NMB, _L_NMC) = range(16)


def _dr_ladder_compute(scal, A, Minv, H_inv, ry, rx, b, c, Qd, D, E, cd,
                       y0, x0, vy0, vx0, *, T, probe, psi, woodbury):
    """Up to T f32 conic DR iterations across AS MANY barrier stages as
    fit, stopping when mu drops below mu_stop.  Returns
    (y, x, vy, vx, out_row) with out_row (1, 128) packing
    [tau, kappa, err, t_done, mu, tol, stages]."""
    rho_y = scal[0, _L_RHOY]
    rho_x = scal[0, _L_RHOX]
    rho_tau = scal[0, _L_RHOT]
    a_coef = scal[0, _L_ACOEF]
    mu0 = scal[0, _L_MU]
    alpha = scal[0, _L_ALPHA]
    tau0 = scal[0, _L_TAU]
    kappa0 = scal[0, _L_KAPPA]
    tol0 = scal[0, _L_TOL]
    k0 = scal[0, _L_K0]
    mu_stop = scal[0, _L_MUSTOP]
    eps = scal[0, _L_EPS]
    sc_b = scal[0, _L_SCB]
    sc_c = scal[0, _L_SCC]
    nm_b = scal[0, _L_NMB]
    nm_c = scal[0, _L_NMC]
    maskx = cd.maskx
    iter_body_at, err_inner = _make_dr_fns(
        A, Minv, H_inv, ry, rx, b, c, Qd, cd,
        rho_y, rho_x, rho_tau, a_coef, alpha, k0, woodbury)

    def error_ratio_f32(y, x, vx, tau):
        """max(res/eps) of `calc_qcp_residuals` in f32 (phase-1 regime:
        residuals >> eps, so f32 classifies the sigma/gamma buckets
        exactly; see module comment)."""
        tau_s = jnp.maximum(jnp.abs(tau), _c(1e-18))
        xs = x / tau_s
        ys = y / tau_s
        ss = rho_x * vx / tau_s
        Ax = _dot_t(xs, A)
        DAx = D * Ax
        res_pri = jnp.max(jnp.abs(D * (Ax - b))) / (
            sc_b + jnp.maximum(jnp.max(jnp.abs(DAx)), sc_b * nm_b))
        Qx = Qd * xs
        ATy = _dot(ys, A)
        dres = (Qx - ATy + c - ss) * maskx
        res_dual = jnp.max(jnp.abs(E * dres)) / (
            sc_c + jnp.maximum(sc_c * nm_c, jnp.max(jnp.abs(E * Qx))))
        inv_bc = 1.0 / (sc_b * sc_c)
        xQx_2 = 0.5 * jnp.sum(xs * Qx) * inv_bc
        cTx = jnp.sum(c * xs) * inv_bc
        bTy = jnp.sum(b * ys) * inv_bc
        rel_gap = jnp.abs(2.0 * xQx_2 + cTx - bTy) / (
            1.0 + jnp.maximum(2.0 * xQx_2,
                              jnp.maximum(jnp.abs(cTx), jnp.abs(bTy))))
        return jnp.maximum(res_pri,
                           jnp.maximum(res_dual, rel_gap)) / eps

    # ONE flat loop (a nested stage/trip while pair blew the 16 MB
    # scoped-VMEM stack at dim-1020): each trip runs `probe` iterations
    # at the CURRENT mu, probes the inner criterion, and -- when it
    # fires -- advances (mu, tol) through the barrier tables in place.
    # A stage is thus consecutive trips at fixed mu until the criterion
    # fires at a probe boundary, exactly the per-stage driver semantics
    # (>= 1 trip per stage, since the check follows the iterations).
    def trip_cond(s):
        t, stages, y, x, vy, vx, tau, kappa, mu, tol, e = s
        return jnp.logical_and(t < T, mu >= mu_stop)

    def trip_body(s):
        t, stages, y, x, vy, vx, tau, kappa, mu, tol, _e = s
        y, x, vy, vx, tau, kappa = jax.lax.fori_loop(
            t, t + probe, iter_body_at(mu), (y, x, vy, vx, tau, kappa))
        t = t + probe
        e = err_inner(y, x, vy, vx, tau, kappa)
        ratio = error_ratio_f32(y, x, vx, tau)
        mu2, tol2 = _adjust_barrier_f32(mu, ratio, eps, psi)
        adv = e < tol
        mu = jnp.where(adv, mu2, mu)
        tol = jnp.where(adv, tol2, tol)
        # int32 literals: a bare Python 1 promotes to int64 under x64,
        # and Mosaic's int64->int32 convert lowers recursively (hangs
        # the trace); same family as the _c() f64 guard above
        stages = stages + jnp.where(adv, jnp.int32(1), jnp.int32(0))
        return (t, stages, y, x, vy, vx, tau, kappa, mu, tol, e)

    t, stages, y, x, vy, vx, tau, kappa, mu, tol, e = jax.lax.while_loop(
        trip_cond, trip_body,
        (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
         y0, x0, vy0, vx0, tau0, kappa0, mu0, tol0,
         jnp.full((), jnp.inf, f32)))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    z = _c(0.0)
    out = jnp.where(col == 0, tau, z)
    out = out + jnp.where(col == 1, kappa, z)
    out = out + jnp.where(col == 2, e, z)
    out = out + jnp.where(col == 3, t.astype(f32), z)
    out = out + jnp.where(col == 4, mu, z)
    out = out + jnp.where(col == 5, tol, z)
    out = out + jnp.where(col == 6, stages.astype(f32), z)
    return y, x, vy, vx, out.astype(f32)


def _ladder_kernel(scal_ref, A_ref, Minv_ref, Hinv_ref, ry_ref, rx_ref,
                   b_ref, c_ref, Qd_ref, D_ref, E_ref, *rest, T, probe,
                   psi, woodbury):
    cd = ConeKernelData(*[r[:] for r in rest[:_CD_FIELDS]])
    y_ref, x_ref, vy_ref, vx_ref = rest[_CD_FIELDS:_CD_FIELDS + 4]
    yo, xo, vyo, vxo, sco = rest[_CD_FIELDS + 4:]
    y, x, vy, vx, out = _dr_ladder_compute(
        scal_ref[:], A_ref[:], Minv_ref[:], Hinv_ref[:], ry_ref[:],
        rx_ref[:], b_ref[:], c_ref[:], Qd_ref[:], D_ref[:], E_ref[:], cd,
        y_ref[:], x_ref[:], vy_ref[:], vx_ref[:],
        T=T, probe=probe, psi=psi, woodbury=woodbury)
    yo[:] = y
    xo[:] = x
    vyo[:] = vy
    vxo[:] = vx
    sco[:] = out


def _ladder_kernel_batched(scal_ref, A_ref, Minv_ref, Hinv_ref, ry_ref,
                           rx_ref, b_ref, c_ref, Qd_ref, D_ref, E_ref,
                           *rest, T, probe, psi, woodbury):
    """Grid-over-instances shell: each lane runs its OWN whole ladder."""
    cd = ConeKernelData(*[r[0] for r in rest[:_CD_FIELDS]])
    y_ref, x_ref, vy_ref, vx_ref = rest[_CD_FIELDS:_CD_FIELDS + 4]
    yo, xo, vyo, vxo, sco = rest[_CD_FIELDS + 4:]
    y, x, vy, vx, out = _dr_ladder_compute(
        scal_ref[0], A_ref[0], Minv_ref[0], Hinv_ref[0], ry_ref[0],
        rx_ref[0], b_ref[0], c_ref[0], Qd_ref[0], D_ref[0], E_ref[0], cd,
        y_ref[0], x_ref[0], vy_ref[0], vx_ref[0],
        T=T, probe=probe, psi=psi, woodbury=woodbury)
    yo[:] = y[None]
    xo[:] = x[None]
    vyo[:] = vy[None]
    vxo[:] = vx[None]
    sco[:] = out[None]


def _ladder_op(T, probe, psi, woodbury, interpret):
    """pallas dispatch with the grid-over-instances vmap rule (see
    `_dr_op`)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(*args):
        mp = args[1].shape[0]
        np_ = args[1].shape[1]
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_ladder_kernel, T=T, probe=probe, psi=psi,
                    woodbury=woodbury),
            out_shape=(
                jax.ShapeDtypeStruct((1, mp), f32),
                jax.ShapeDtypeStruct((1, np_), f32),
                jax.ShapeDtypeStruct((1, mp), f32),
                jax.ShapeDtypeStruct((1, np_), f32),
                jax.ShapeDtypeStruct((1, 128), f32),
            ),
            in_specs=[vmem] * len(args),
            out_specs=(vmem,) * 5,
            compiler_params=vmem_params(
                4 * sum(int(np.prod(a.shape)) for a in args)),
            interpret=interpret,
        )(*args)

    @op.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        B = axis_size
        args = [a if batched else jnp.broadcast_to(a, (B,) + a.shape)
                for a, batched in zip(args, in_batched)]
        _, mp, np_ = args[1].shape
        z = np.int32(0)
        mat3 = lambda r, c: pl.BlockSpec(  # noqa: E731
            (1, r, c), lambda bb: (bb, z, z), memory_space=pltpu.VMEM)
        specs = [mat3(a.shape[1], a.shape[2]) for a in args]
        outs = pl.pallas_call(
            partial(_ladder_kernel_batched, T=T, probe=probe, psi=psi,
                    woodbury=woodbury),
            grid=(B,),
            out_shape=(
                jax.ShapeDtypeStruct((B, 1, mp), f32),
                jax.ShapeDtypeStruct((B, 1, np_), f32),
                jax.ShapeDtypeStruct((B, 1, mp), f32),
                jax.ShapeDtypeStruct((B, 1, np_), f32),
                jax.ShapeDtypeStruct((B, 1, 128), f32),
            ),
            in_specs=specs,
            out_specs=(mat3(1, mp), mat3(1, np_), mat3(1, mp),
                       mat3(1, np_), mat3(1, 128)),
            compiler_params=vmem_params(
                4 * sum(int(np.prod(a.shape[1:])) for a in args)),
            interpret=interpret,
        )(*args)
        return tuple(outs), (True,) * 5

    return op


@partial(jax.jit, static_argnames=("T", "probe", "psi", "woodbury",
                                   "interpret", "use_pallas"))
def fused_dr_ladder(A32, Minv32, Hinv32, r_vec32, b32, c32, Qd32, D32, E32,
                    cd: ConeKernelData, rho_y, rho_x, rho_tau, a_coef,
                    mu, tol_inner, mu_stop, eps, sc_b, sc_c, nm_inf_b,
                    nm_inf_c, alpha, u32, v32, k0, T=2048, probe=8,
                    psi=1.0, woodbury=False, interpret=False,
                    use_pallas=None):
    """Run the conic barrier LADDER (phase 1) in one launch: up to T f32
    DR iterations across as many barrier stages as fit, advancing
    (mu, tol_inner) through the in-kernel `adjust_barrier` tables until
    mu < mu_stop (or the T cap: re-enter with the returned state).

    Same operand conventions as `fused_dr_sprint_stop`, plus D32/E32
    (the equilibration scalings, for the in-kernel f32 error-ratio) and
    the (mu, tol_inner, mu_stop, eps, sc_b, sc_c, nm_inf_b, nm_inf_c)
    scalars.  Returns (u, v, t_done, err, mu, tol_inner, stages)."""
    m, n = A32.shape
    mp, np_ = _pad128(m), _pad128(n)
    if use_pallas is None:
        from .spmv_pallas import pallas_default, pallas_fits

        mk = mp if woodbury else np_
        use_pallas = pallas_default() and pallas_fits(
            4 * (mp * np_ + mk * mk
                 + cd.Mh1.shape[0] * np_ * 3 + 12 * (mp + np_)))
    l = m + n + 1
    if cd.maskx.shape[-1] != np_:
        raise ValueError(
            f"cone kernel data built at width {cd.maskx.shape[-1]}, "
            f"padded problem width is {np_}")
    scal_row = jnp.zeros((1, 128), f32)
    for i, s in enumerate((rho_y, rho_x, rho_tau, a_coef, mu, alpha,
                           u32[l - 1], v32[l - 1], tol_inner, k0,
                           mu_stop, eps, sc_b, sc_c, nm_inf_b, nm_inf_c)):
        scal_row = scal_row.at[0, i].set(jnp.asarray(s).astype(f32))
    A_p = _pad_mat(A32, m, n, mp, np_)
    if woodbury:
        Minv_p = _pad_mat(Minv32, m, m, mp, mp)
    else:
        Minv_p = _pad_mat(Minv32, n, n, np_, np_)
    Hinv_p = _pad_vec(Hinv32, n, np_)
    ry = _pad_vec(r_vec32[:m], m, mp)
    rx = _pad_vec(r_vec32[m:], n, np_)
    b_p = _pad_vec(b32, m, mp)
    c_p = _pad_vec(c32, n, np_)
    Qd_p = _pad_vec(Qd32, n, np_)
    D_p = _pad_vec(D32, m, mp)
    E_p = _pad_vec(E32, n, np_)
    y0 = _pad_vec(u32[:m], m, mp)
    x0 = _pad_vec(u32[m : m + n], n, np_)
    vy0 = _pad_vec(v32[:m], m, mp)
    vx0 = _pad_vec(v32[m : m + n], n, np_)
    args = (scal_row, A_p, Minv_p, Hinv_p, ry, rx, b_p, c_p, Qd_p,
            D_p, E_p, *cd, y0, x0, vy0, vx0)
    if use_pallas and _HAVE_PALLAS:
        y, x, vy, vx, sc = _ladder_op(T, probe, psi, woodbury,
                                      interpret)(*args)
    else:
        with jax.default_matmul_precision("highest"):
            y, x, vy, vx, sc = _dr_ladder_compute(
                scal_row, A_p, Minv_p, Hinv_p, ry, rx, b_p, c_p, Qd_p,
                D_p, E_p, ConeKernelData(*args[11:11 + _CD_FIELDS]),
                y0, x0, vy0, vx0, T=T, probe=probe, psi=psi,
                woodbury=woodbury)
    tau, kappa = sc[0, 0], sc[0, 1]
    err = sc[0, 2]
    t_done = sc[0, 3].astype(jnp.int32)
    mu_out = sc[0, 4]
    tol_out = sc[0, 5]
    stages = sc[0, 6].astype(jnp.int32)
    u_out = jnp.concatenate([y[0, :m], x[0, :n], tau[None]])
    v_out = jnp.concatenate([vy[0, :m], vx[0, :n], kappa[None]])
    return u_out, v_out, t_done, err, mu_out, tol_out, stages
