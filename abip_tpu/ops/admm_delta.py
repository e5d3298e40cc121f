"""Anchored-delta ADMM endgame: f64-quality accuracy at f32 sprint speed.

The accuracy endgame (mu below ~1e-4 down to eps) is where the honest
TPU wall goes: the per-iteration anchored-f64 "steps" engine costs
~0.5-0.8 ms per vmapped iteration on v5e (f64 is software-emulated,
~30x f32; r04 straggler phase split: 0.45 s phase-1 sprint vs 4.8 s
phase-2 endgame at B=16), while the pure-f32 sprint kernel cannot reach
eps=1e-6 (f32 resolution on O(1) iterates is ~6e-8; fuzz: 0/20
converged with the sprint run below mu=1e-7).

This module removes the dilemma by iterating DELTAS from an f64 anchor
entirely in f32: every quantity the kernel touches is small (the
distance from the chunk-entry iterate), so f32's ~1e-7 RELATIVE error
is ~1e-7*||delta|| ABSOLUTE error -- far below the f64 iterate's own
movement.  The recurrence is exact in the delta frame:

  absolute:  (y,x,vx,tau,kappa) -> F(y,x,vx,tau,kappa)   [admm step]
  delta:     d -> F(anchor + d) - anchor
           = E + L(d) + prox-delta terms

where the constant E := F(anchor) - anchor (the fixed-point residual of
the anchor, O(qres) ~ 1e-4..1e-8, tiny in f32 absolute terms) and the
anchor images are computed ONCE per chunk in f64 OUTSIDE the kernel
(`delta_anchor`: one cached-factor projection + prox evals, ~2 steps-
iterations of f64 work amortized over up to T=768 kernel iterations).

Numerical hygiene (each is load-bearing; see `_delta_compute`):

* The anchor frame is the EXACT f64 entry state: the anchor values
  enter the kernel recurrence only through their f64-computed images
  (E-terms, qres anchors) and benign norm cross-terms, so no rounding
  of the frame is needed.
* The barrier prox delta uses the cancellation-free identity
  prox(t) = (t + s)/2 = 2*lam/(s - t),  s = sqrt(t^2 + 4 lam),
  giving  p(dt) := prox(t0+dt) - prox(t0)  via
  ds = dt*(2 t0 + dt)/(s + s0)  (positive branch: p = (dt+ds)/2;
  negative branch: p = 2 lam (dt-ds) / ((s-t)(s0-t0)) ) -- every factor
  is accurate RELATIVE to the delta, never differenced at O(1) scale.
* t0 is rounded to f32 and the rounding residue is folded into a
  per-coordinate offset et := (rel_x0 - vx0) - f32(t0), so the prox
  argument the kernel reconstructs equals the true one to O(1e-14).
* The in-kernel inner-criterion probe (`abip.c:2131-2173`) is evaluated
  in the same delta frame: q1/q2/q3 anchors are f64-computed residuals
  (small), deltas are linear -- the probe resolves qres down to
  ~1e-7*||delta||, enough for eps=1e-8 endgames.
* The stage-average candidate (`compute_avg`, `abip.c:635-659`) is
  tracked in-kernel as delta sums; prior-chunk history enters through
  c0 := S_prev - sj_prev*anchor, so the averaged-iterate criterion that
  kills degenerate-lane cycling (650080d) survives chunk boundaries.

Layout rules follow `admm_pallas.py` (2-D (rows,128) f32 VMEM blocks,
HIGHEST-precision matmuls, iota-select scalar rows); the batched
variant is a grid-over-instances kernel behind `jax.custom_batching`,
and every lane stops within probe-1 iterations of ITS OWN criterion --
a converged lane runs zero trips (q carry initialized from the entry
qres), so straggler lanes no longer tax the batch in lockstep.

Reference hot loop: `src/abip-lp/src/abip.c:2131-2215` (projection
:539, barrier prox :717, dual update :567, inner stop :1951-2051).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

f32 = jnp.float32
f64 = jnp.float64


def _pad128(k):
    return -(-k // 128) * 128


class DeltaAnchor(NamedTuple):
    """f32 operands of one delta chunk (padded 2-D rows; see module
    docstring for the role of each).  Vectors are (1, mp) / (1, np)
    zero-padded; `scal` is a (1, 128) row of packed scalars."""

    scal: jnp.ndarray
    A: jnp.ndarray        # (mp, np)
    Ninv: jnp.ndarray     # (mp, mp)
    hy: jnp.ndarray
    hx: jnp.ndarray
    gy: jnp.ndarray
    gx: jnp.ndarray
    maskx: jnp.ndarray
    ey: jnp.ndarray       # F(anchor)-anchor, y block
    ex: jnp.ndarray       # prox(t0)-x0
    evx: jnp.ndarray      # x0 - rel_x0
    t0x: jnp.ndarray      # f32 prox-argument anchor
    sax: jnp.ndarray      # sqrt(t0x^2 + 4 lam), f64-computed from f32 t0x
    etx: jnp.ndarray      # (rel_x0 - vx0) - t0x rounding residue
    q1_0: jnp.ndarray     # (1, mp) qres anchor: A x0 + tau0 hy
    q2_0: jnp.ndarray     # (1, np) qres anchor: (A'y0 + vx0 - tau0 hx) mask
    y0: jnp.ndarray       # anchor values (norm cross-terms)
    x0: jnp.ndarray
    vx0: jnp.ndarray
    c0y: jnp.ndarray      # prior-chunk average history: S_prev - sj*anchor
    c0x: jnp.ndarray
    c0vx: jnp.ndarray


# scal row slots
(_S_RHOY, _S_IGTH, _S_LAM, _S_ALPHA, _S_THRESH, _S_TAU0, _S_KAPPA0,
 _S_T0T, _S_SAT, _S_ETT, _S_ETAU, _S_EVTAU, _S_Q30, _S_UN0, _S_VN0,
 _S_SJ, _S_C0TAU, _S_C0KAP, _S_QINIT, _S_EYTAU) = range(20)


def _dot_t(a, M):
    """(1, k) x (r, k) -> (1, r); HIGHEST is load-bearing (bf16 rounding
    otherwise -- see admm_pallas._dot_t)."""
    return jax.lax.dot_general(a, M, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _dot(a, M):
    return jax.lax.dot_general(a, M, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _prox_delta(dt, t0, s0, lam):
    """prox(t0 + dt, lam) - prox(t0, lam), cancellation-free.

    s0 = sqrt(t0^2 + 4 lam) must be consistent with t0 (computed in f64
    from the f32 t0).  Both branch formulas are algebraic identities of
    prox (see module docstring); the branch is chosen by the CURRENT
    argument's sign for conditioning.  lam > 0 keeps every denominator
    >= 2*sqrt(lam) > 0."""
    t = t0 + dt
    s = jnp.sqrt(t * t + 4.0 * lam)        # rel-accurate; used in sums only
    ds = dt * (t0 + t) / (s + s0)
    pos = 0.5 * (dt + ds)
    neg = 2.0 * lam * (dt - ds) / ((s - t) * (s0 - t0))
    return jnp.where(t >= 0, pos, neg)


def _delta_compute(scal, A, Ninv, hy, hx, gy, gx, maskx, ey, ex, evx,
                   t0x, sax, etx, q1_0, q2_0, y0, x0, vx0,
                   c0y, c0x, c0vx, *, T, probe):
    """Up to T delta iterations with a probe-granular in-loop stop.

    Returns (dy, dx, dvx, dsy, dsx, dsvx, out_row): final deltas, delta
    sums over executed iterations, and a (1, 128) f32 row packing
    [dtau, dkappa, dstau, dskappa, qres, t_done, avg_crit]."""
    rho_y = scal[0, _S_RHOY]
    inv_gth1 = scal[0, _S_IGTH]
    lam = scal[0, _S_LAM]
    alpha = scal[0, _S_ALPHA]
    thresh = scal[0, _S_THRESH]
    tau0 = scal[0, _S_TAU0]
    kappa0 = scal[0, _S_KAPPA0]
    t0t = scal[0, _S_T0T]
    sat = scal[0, _S_SAT]
    ett = scal[0, _S_ETT]
    etau = scal[0, _S_ETAU]
    evtau = scal[0, _S_EVTAU]
    q3_0 = scal[0, _S_Q30]
    un0 = scal[0, _S_UN0]
    vn0 = scal[0, _S_VN0]
    sj_prev = scal[0, _S_SJ]
    c0tau = scal[0, _S_C0TAU]
    c0kap = scal[0, _S_C0KAP]
    q_init = scal[0, _S_QINIT]

    def iter_body(_, carry):
        dy, dx, dvx, dtau, dkap, dsy, dsx, dsvx, dstau, dskap = carry
        # linear projection pipeline on deltas (exact: same operators)
        drtau = dtau + dkap
        dqy = rho_y * dy - drtau * hy
        dqx = (dx + dvx) - drtau * hx
        dcoef = (jnp.sum(dqy * gy) + jnp.sum(dqx * gx)) * inv_gth1
        dqy = dqy - dcoef * hy
        dqx = dqx - dcoef * hx
        dwx = -dqx
        drhs = dqy + _dot_t(dwx, A)
        dz_y = _dot_t(drhs, Ninv)
        dz_x = _dot(dz_y, A) - dwx
        dtau_t = drtau + jnp.sum(dz_y * hy) + jnp.sum(dz_x * hx)
        # y update: y+ = z_y - vy  ->  dy+ = ey + dz_y
        dy_n = ey + dz_y
        # prox arguments: t = t0 + (drel - dv + et)
        drel_x = alpha * dz_x + (1.0 - alpha) * dx
        dtx = drel_x - dvx + etx
        px = _prox_delta(dtx, t0x, sax, lam) * maskx
        dx_n = ex + px
        dvx_n = dvx + dx_n - drel_x + evx
        drel_t = alpha * dtau_t + (1.0 - alpha) * dtau
        dtt = drel_t - dkap + ett
        pt = _prox_delta(dtt, t0t, sat, lam)
        dtau_n = etau + pt
        dkap_n = dkap + dtau_n - drel_t + evtau
        return (dy_n, dx_n, dvx_n, dtau_n, dkap_n,
                dsy + dy_n, dsx + dx_n, dsvx + dvx_n,
                dstau + dtau_n, dskap + dkap_n)

    def qres_delta(dy, dx, dvx, dtau, dkap):
        """HSD-operator residual at anchor + delta (`abip.c:1951-1996`
        in the delta frame; h = (-b; c))."""
        q1 = q1_0 + _dot_t(dx, A) + dtau * hy
        q2 = q2_0 + (_dot(dy, A) + dvx - dtau * hx) * maskx
        q3 = q3_0 - jnp.sum(dy * hy) - jnp.sum(dx * hx) - dkap
        qsq = jnp.sum(q1 * q1) + jnp.sum(q2 * q2) + q3 * q3
        un = (un0 + 2.0 * (jnp.sum(y0 * dy) + jnp.sum(x0 * dx)
                           + tau0 * dtau)
              + jnp.sum(dy * dy) + jnp.sum(dx * dx) + dtau * dtau)
        vn = (vn0 + 2.0 * (jnp.sum(vx0 * dvx) + kappa0 * dkap)
              + jnp.sum(dvx * dvx) + dkap * dkap)
        denom = 1.0 + jnp.sqrt(jnp.maximum(un + vn, 0.0))
        return jnp.sqrt(qsq) / denom

    def trip_cond(c):
        return jnp.logical_and(c[0] < T, c[1] >= thresh)

    def trip_body(c):
        t, _q, _ac, dy, dx, dvx, dtau, dkap, dsy, dsx, dsvx, dstau, dskap = c
        (dy, dx, dvx, dtau, dkap, dsy, dsx, dsvx, dstau, dskap) = \
            jax.lax.fori_loop(0, probe, iter_body,
                              (dy, dx, dvx, dtau, dkap,
                               dsy, dsx, dsvx, dstau, dskap))
        k = (t + probe).astype(jnp.float32)
        dom = jnp.maximum(sj_prev + k, 1.0)
        q_cur = qres_delta(dy, dx, dvx, dtau, dkap)
        q_avg = qres_delta((c0y + dsy) / dom, (c0x + dsx) / dom,
                           (c0vx + dsvx) / dom, (c0tau + dstau) / dom,
                           (c0kap + dskap) / dom)
        avg_crit = (q_avg < q_cur).astype(jnp.float32)
        q = jnp.minimum(q_avg, q_cur)
        return (t + probe, q, avg_crit, dy, dx, dvx, dtau, dkap,
                dsy, dsx, dsvx, dstau, dskap)

    zy = jnp.zeros_like(ey)
    zx = jnp.zeros_like(ex)
    zs = jnp.zeros((), jnp.float32)
    (t, q, avg_crit, dy, dx, dvx, dtau, dkap,
     dsy, dsx, dsvx, dstau, dskap) = jax.lax.while_loop(
        trip_cond, trip_body,
        (jnp.zeros((), jnp.int32), q_init,
         jnp.zeros((), jnp.float32), zy, zx, zx, zs, zs,
         zy, zx, zx, zs, zs))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out = jnp.where(col == 0, dtau, 0.0)
    out = out + jnp.where(col == 1, dkap, 0.0)
    out = out + jnp.where(col == 2, dstau, 0.0)
    out = out + jnp.where(col == 3, dskap, 0.0)
    out = out + jnp.where(col == 4, q, 0.0)
    out = out + jnp.where(col == 5, t.astype(jnp.float32), 0.0)
    out = out + jnp.where(col == 6, avg_crit, 0.0)
    return dy, dx, dvx, dsy, dsx, dsvx, out.astype(jnp.float32)


def _delta_kernel(scal_ref, A_ref, Ninv_ref, hy_ref, hx_ref, gy_ref,
                  gx_ref, maskx_ref, ey_ref, ex_ref, evx_ref, t0x_ref,
                  sax_ref, etx_ref, q10_ref, q20_ref, y0_ref, x0_ref,
                  vx0_ref, c0y_ref, c0x_ref, c0vx_ref,
                  dy_ref, dx_ref, dvx_ref, dsy_ref, dsx_ref, dsvx_ref,
                  sco_ref, *, T, probe):
    """Unbatched shell: whole-array VMEM blocks."""
    dy, dx, dvx, dsy, dsx, dsvx, out = _delta_compute(
        scal_ref[:], A_ref[:], Ninv_ref[:], hy_ref[:], hx_ref[:],
        gy_ref[:], gx_ref[:], maskx_ref[:], ey_ref[:], ex_ref[:],
        evx_ref[:], t0x_ref[:], sax_ref[:], etx_ref[:], q10_ref[:],
        q20_ref[:], y0_ref[:], x0_ref[:], vx0_ref[:], c0y_ref[:],
        c0x_ref[:], c0vx_ref[:], T=T, probe=probe)
    dy_ref[:] = dy
    dx_ref[:] = dx
    dvx_ref[:] = dvx
    dsy_ref[:] = dsy
    dsx_ref[:] = dsx
    dsvx_ref[:] = dsvx
    sco_ref[:] = out


def _delta_kernel_batched(scal_ref, A_ref, Ninv_ref, hy_ref, hx_ref,
                          gy_ref, gx_ref, maskx_ref, ey_ref, ex_ref,
                          evx_ref, t0x_ref, sax_ref, etx_ref, q10_ref,
                          q20_ref, y0_ref, x0_ref, vx0_ref, c0y_ref,
                          c0x_ref, c0vx_ref, dy_ref, dx_ref, dvx_ref,
                          dsy_ref, dsx_ref, dsvx_ref, sco_ref, *, T,
                          probe):
    """Grid-over-instances shell: each lane stops on ITS OWN criterion
    (per-lane while_loop), so a straggler costs only its own trips."""
    dy, dx, dvx, dsy, dsx, dsvx, out = _delta_compute(
        scal_ref[0], A_ref[0], Ninv_ref[0], hy_ref[0], hx_ref[0],
        gy_ref[0], gx_ref[0], maskx_ref[0], ey_ref[0], ex_ref[0],
        evx_ref[0], t0x_ref[0], sax_ref[0], etx_ref[0], q10_ref[0],
        q20_ref[0], y0_ref[0], x0_ref[0], vx0_ref[0], c0y_ref[0],
        c0x_ref[0], c0vx_ref[0], T=T, probe=probe)
    dy_ref[:] = dy[None]
    dx_ref[:] = dx[None]
    dvx_ref[:] = dvx[None]
    dsy_ref[:] = dsy[None]
    dsx_ref[:] = dsx[None]
    dsvx_ref[:] = dsvx[None]
    sco_ref[:] = out[None]


def _delta_ref(anchor: DeltaAnchor, T, probe):
    """XLA fallback (identical math, HIGHEST-precision f32 matmuls):
    the compute path on CPU and the oracle for kernel-parity tests."""
    with jax.default_matmul_precision("highest"):
        return _delta_compute(
            anchor.scal, anchor.A, anchor.Ninv, anchor.hy, anchor.hx,
            anchor.gy, anchor.gx, anchor.maskx, anchor.ey, anchor.ex,
            anchor.evx, anchor.t0x, anchor.sax, anchor.etx, anchor.q1_0,
            anchor.q2_0, anchor.y0, anchor.x0, anchor.vx0, anchor.c0y,
            anchor.c0x, anchor.c0vx, T=T, probe=probe)


def _delta_op(T, probe, interpret):
    """pallas dispatch with an explicit grid-over-instances vmap rule
    (auto-derived batched block specs fail Mosaic -- see
    admm_pallas._stop_op)."""
    from jax.custom_batching import custom_vmap

    n_out_small = 7

    from .spmv_pallas import vmem_params

    @custom_vmap
    def op(*args):
        mp, np_ = args[1].shape
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_delta_kernel, T=T, probe=probe),
            out_shape=(
                jax.ShapeDtypeStruct((1, mp), jnp.float32),
                jax.ShapeDtypeStruct((1, np_), jnp.float32),
                jax.ShapeDtypeStruct((1, np_), jnp.float32),
                jax.ShapeDtypeStruct((1, mp), jnp.float32),
                jax.ShapeDtypeStruct((1, np_), jnp.float32),
                jax.ShapeDtypeStruct((1, np_), jnp.float32),
                jax.ShapeDtypeStruct((1, 128), jnp.float32),
            ),
            in_specs=[vmem] * 22,
            out_specs=(vmem,) * n_out_small,
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
            (1, r, c), lambda b: (b, z, z), memory_space=pltpu.VMEM)
        vec_specs = {
            "scal": mat3(1, 128), "A": mat3(mp, np_), "Ninv": mat3(mp, mp),
        }
        # operand order mirrors DeltaAnchor fields
        mp_fields = ("hy", "gy", "ey", "q1_0", "y0", "c0y")
        in_specs = [vec_specs["scal"], vec_specs["A"], vec_specs["Ninv"]]
        for name in ("hy", "hx", "gy", "gx", "maskx", "ey", "ex", "evx",
                     "t0x", "sax", "etx", "q1_0", "q2_0", "y0", "x0",
                     "vx0", "c0y", "c0x", "c0vx"):
            in_specs.append(mat3(1, mp if name in mp_fields else np_))
        outs = pl.pallas_call(
            partial(_delta_kernel_batched, T=T, probe=probe),
            grid=(B,),
            out_shape=(
                jax.ShapeDtypeStruct((B, 1, mp), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, np_), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, np_), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, mp), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, np_), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, np_), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, 128), jnp.float32),
            ),
            in_specs=in_specs,
            out_specs=(mat3(1, mp), mat3(1, np_), mat3(1, np_),
                       mat3(1, mp), mat3(1, np_), mat3(1, np_),
                       mat3(1, 128)),
            compiler_params=vmem_params(
                4 * sum(int(np.prod(a.shape[1:])) for a in args)),
            interpret=interpret,
        )(*args)
        return tuple(outs), (True,) * n_out_small
    return op


def delta_anchor(A64, solve64, h, g, g_th, rho_y, lam, alpha, thresh,
                 u, v, u_sum, v_sum, sj, qres, A32p=None,
                 Ninvp=None) -> DeltaAnchor:
    """Build the f32 operand set of one delta chunk from the f64 entry
    state.  The anchor frame is the EXACT f64 entry state (the anchor
    values enter the kernel recurrence only through f64-computed images;
    the one cancellation-sensitive anchor VALUE, the prox argument t0,
    is f32-rounded with its residue folded into the et offset -- module
    docstring).  Traced code: runs inside the jitted driver, once per
    chunk.

    solve64(rhs) must apply (rho_y I + A A')^-1 in f64 (cached factor).
    u_sum/v_sum/sj: stage-average accumulators (f64) BEFORE this chunk;
    qres: entry inner-criterion value (so an already-converged lane runs
    zero kernel trips).  A32p/Ninvp: optionally precomputed padded f32
    operator blocks (loop-invariant -- pass them to keep the per-chunk
    anchor cost at ~2 f64 iterations)."""
    m, n = A64.shape
    mp, np_ = _pad128(m), _pad128(n)

    def pad_row(x, k, kp):
        return jnp.zeros((1, kp), f32).at[0, :k].set(x.astype(f32))

    hy64, hx64 = h[:m], h[m:m + n]
    y0 = u[:m]
    x0 = u[m:m + n]
    tau0 = u[m + n]
    vy0 = v[:m]
    vx0 = v[m:m + n]
    kap0 = v[m + n]
    # one absolute ADMM step at the anchor, in f64 (`abip.c:539-584`)
    r_y = y0 + vy0
    r_x = x0 + vx0
    r_t = tau0 + kap0
    qy = rho_y * r_y - r_t * hy64
    qx = r_x - r_t * hx64
    coef = (jnp.dot(qy, g[:m]) + jnp.dot(qx, g[m:m + n])) / (g_th + 1.0)
    qy = qy - coef * hy64
    qx = qx - coef * hx64
    wx = -qx
    rhs = qy + A64 @ wx
    z_y = solve64(rhs)
    z_x = A64.T @ z_y - wx
    tau_t = r_t + jnp.dot(z_y, hy64) + jnp.dot(z_x, hx64)
    ey = z_y - vy0 - y0
    rel_x0 = alpha * z_x + (1.0 - alpha) * x0
    rel_t0 = alpha * tau_t + (1.0 - alpha) * tau0
    # prox anchors: t0 rounded to the f32 the kernel holds, residue into
    # et; s0/prox(t0) computed in f64 FROM the rounded t0 (consistency)
    t0x_32 = (rel_x0 - vx0).astype(f32)
    etx = (rel_x0 - vx0) - t0x_32.astype(f64)
    t0x_row = pad_row(t0x_32, n, np_)
    # s0 from the PADDED row: pads get t0=0 -> s0=2*sqrt(lam), keeping
    # the kernel's negative-branch denominator (s0 - t0) > 0 at pads
    t0p64 = t0x_row.astype(f64)
    sax_row = jnp.sqrt(t0p64 * t0p64 + 4.0 * lam).astype(f32)
    t0x64 = t0x_32.astype(f64)
    sax64 = jnp.sqrt(t0x64 * t0x64 + 4.0 * lam)
    xa = jnp.where(t0x64 >= 0, 0.5 * (t0x64 + sax64),
                   2.0 * lam / (sax64 - t0x64))
    ex = xa - x0
    evx = x0 - rel_x0
    t0t_32 = (rel_t0 - kap0).astype(f32)
    ett = (rel_t0 - kap0) - t0t_32.astype(f64)
    t0t64 = t0t_32.astype(f64)
    sat = jnp.sqrt(t0t64 * t0t64 + 4.0 * lam)
    taua = jnp.where(t0t64 >= 0, 0.5 * (t0t64 + sat),
                     2.0 * lam / (sat - t0t64))
    etau = taua - tau0
    evtau = tau0 - rel_t0
    # qres anchors (`abip.c:1951-1996`; h = (-b; c))
    q1_0 = A64 @ x0 + tau0 * hy64
    q2_0 = A64.T @ y0 + vx0 - tau0 * hx64
    q3_0 = -jnp.dot(y0, hy64) - jnp.dot(x0, hx64) - kap0
    un0 = jnp.dot(y0, y0) + jnp.dot(x0, x0) + tau0 * tau0
    vn0 = jnp.dot(vy0, vy0) + jnp.dot(vx0, vx0) + kap0 * kap0
    # average history in the anchor frame
    sjf = sj.astype(f64)
    c0y = u_sum[:m] - sjf * y0
    c0x = u_sum[m:m + n] - sjf * x0
    c0vx = v_sum[m:m + n] - sjf * vx0
    c0tau = u_sum[m + n] - sjf * tau0
    c0kap = v_sum[m + n] - sjf * kap0

    scal_vals = [jnp.asarray(rho_y, f64), 1.0 / (g_th + 1.0),
                 jnp.asarray(lam, f64), jnp.asarray(alpha, f64),
                 jnp.asarray(thresh, f64), tau0, kap0,
                 t0t_32.astype(f64), sat, ett, etau, evtau, q3_0,
                 un0, vn0, sjf, c0tau, c0kap,
                 jnp.asarray(qres, f64), jnp.zeros((), f64)]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    scal = jnp.zeros((1, 128), f32)
    for i, sv in enumerate(scal_vals):
        scal = scal + jnp.where(col == i, sv.astype(f32), 0.0)

    if A32p is None:
        A32p = jnp.zeros((mp, np_), f32).at[:m, :n].set(A64.astype(f32))
    if Ninvp is None:
        Ninv64 = solve64(jnp.eye(m, dtype=f64))
        Ninvp = jnp.zeros((mp, mp), f32).at[:m, :m].set(
            Ninv64.astype(f32))
    return DeltaAnchor(
        scal=scal, A=A32p, Ninv=Ninvp,
        hy=pad_row(hy64, m, mp), hx=pad_row(hx64, n, np_),
        gy=pad_row(g[:m], m, mp), gx=pad_row(g[m:m + n], n, np_),
        maskx=pad_row(jnp.ones((n,), f32), n, np_),
        ey=pad_row(ey, m, mp), ex=pad_row(ex, n, np_),
        evx=pad_row(evx, n, np_), t0x=t0x_row,
        sax=sax_row, etx=pad_row(etx, n, np_),
        q1_0=pad_row(q1_0, m, mp), q2_0=pad_row(q2_0, n, np_),
        y0=pad_row(y0, m, mp), x0=pad_row(x0, n, np_),
        vx0=pad_row(vx0, n, np_),
        c0y=pad_row(c0y, m, mp), c0x=pad_row(c0x, n, np_),
        c0vx=pad_row(c0vx, n, np_))


class DeltaResult(NamedTuple):
    u: jnp.ndarray         # f64 absolute iterate after the chunk
    v: jnp.ndarray
    u_sum: jnp.ndarray     # f64 stage-average accumulators AFTER chunk
    v_sum: jnp.ndarray
    t_done: jnp.ndarray    # int32 iterations executed
    qres: jnp.ndarray      # f64 inner-criterion value (delta-frame)
    avg_crit: jnp.ndarray  # bool: averaged iterate is the better candidate


def run_delta_chunk(A64, solve64, h, g, g_th, rho_y, lam, alpha, thresh,
                    u, v, u_sum, v_sum, sj, qres, *, T, probe,
                    A32p=None, Ninvp=None, interpret=False,
                    use_pallas=None) -> DeltaResult:
    """One anchored-delta chunk: build the anchor (f64), run up to T f32
    kernel iterations stopping at `qres < thresh`, return the f64 state.

    vmap-able: under vmap the kernel runs grid-over-instances with
    per-lane stopping.  `u_sum`/`v_sum`/`sj` thread the stage-average
    accumulators (see `parallel/batched.py` C docstring for why they
    must survive chunk boundaries)."""
    m, n = A64.shape
    if use_pallas is None:
        from .spmv_pallas import pallas_default, pallas_fits

        mp, np_ = _pad128(m), _pad128(n)
        use_pallas = pallas_default() and pallas_fits(
            4 * (mp * np_ + mp * mp + 13 * np_ + 6 * mp))
    anc = delta_anchor(A64, solve64, h, g, g_th, rho_y, lam, alpha,
                       thresh, u, v, u_sum, v_sum, sj, qres,
                       A32p=A32p, Ninvp=Ninvp)
    if use_pallas and _HAVE_PALLAS:
        dy, dx, dvx, dsy, dsx, dsvx, row = _delta_op(
            T, probe, interpret)(*anc)
    else:
        dy, dx, dvx, dsy, dsx, dsvx, row = _delta_ref(anc, T, probe)
    dtau = row[0, 0].astype(f64)
    dkap = row[0, 1].astype(f64)
    dstau = row[0, 2].astype(f64)
    dskap = row[0, 3].astype(f64)
    q = row[0, 4].astype(f64)
    t_done = row[0, 5].astype(jnp.int32)
    avg_crit = row[0, 6] > 0.5
    # absolute f64 state: exact anchor frame + deltas
    kf = t_done.astype(f64)
    u_new = jnp.concatenate([
        u[:m] + dy[0, :m].astype(f64),
        u[m:m + n] + dx[0, :n].astype(f64),
        (u[m + n] + dtau)[None]])
    v_new = jnp.concatenate([
        v[:m], v[m:m + n] + dvx[0, :n].astype(f64),
        (v[m + n] + dkap)[None]])
    u_sum_new = u_sum + kf * u + jnp.concatenate([
        dsy[0, :m].astype(f64), dsx[0, :n].astype(f64), dstau[None]])
    v_sum_new = v_sum + kf * v + jnp.concatenate([
        jnp.zeros((m,), f64), dsvx[0, :n].astype(f64), dskap[None]])
    return DeltaResult(u=u_new, v=v_new, u_sum=u_sum_new,
                       v_sum=v_sum_new, t_done=t_done, qres=q,
                       avg_crit=avg_crit)
