"""Fused ADMM sprint: T whole LP iterations in ONE Pallas kernel launch.

The measured wall on TPU is per-op latency, not FLOPs: one ADMM iteration
lowers to ~50 small sequential XLA ops and costs ~270-340 us almost
independently of batch size (tools/tpu_microbench.py, round 2).  This
kernel keeps A, the explicit normal-matrix inverse, and the iterate
resident in VMEM and runs T complete iterations -- projection (rank-1 tau
correction + fold + N^-1 apply + back-subst), barrier prox, dual update --
inside one `fori_loop`, so per-iteration cost approaches pure compute.

Mosaic layout (learned on real TPU v5e, round 2): everything is 2-D
(rows, 128)-tiled f32 in VMEM -- 1-D refs, `pl.ANY` loads, f64, and
concatenated (y|x|tau) vectors all fail to lower.  The HSD iterate is
therefore SPLIT into blocks: y/vy as (1, mp), x/vx as (1, np), tau/kappa
as loop-carried scalars; h and g likewise.  Zero padding is
contamination-free: A/Ninv are zero-padded (so z pads stay zero) and every
reduction runs against zero-padded h/g.

f32 only (Mosaic has no f64): intended as the inner engine of the
anchored mixed-precision scheme -- sprint T f32 iterations on VMEM, then
re-anchor/correct in f64 outside (see `parallel/batched.py` docstring).
Sized for problems whose operands fit VMEM (A: mp x np f32 <= ~8 MB).

Reference hot loop this fuses: `src/abip-lp/src/abip.c:2131-2215`
(project_lin_sys :539, project_barrier :717, update_dual_vars :567).
"""
from __future__ import annotations

from functools import partial

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


def _prox(t, lam):
    pos = 0.5 * (t + jnp.sqrt(t * t + 4.0 * lam))
    neg = 2.0 * lam / (-t * (1.0 + jnp.sqrt(1.0 + 4.0 * lam / (t * t + _TINY))) + _TINY)
    return jnp.where(t >= 0, pos, neg)


def _sprint_ref(A, Ninv, h, g, scalars, u, v, T, m):
    """Reference implementation (plain jnp) of the T-iteration sprint.

    Traced under default_matmul_precision('highest'): on TPU the default
    f32 matmul rounds operands to bf16 (see _dot_t), which diverges the
    trajectory -- the fallback must match the kernel's true-f32 math."""
    with jax.default_matmul_precision("highest"):
        return _sprint_ref_inner(A, Ninv, h, g, scalars, u, v, T, m)


def _sprint_ref_inner(A, Ninv, h, g, scalars, u, v, T, m):
    rho_y, inv_gth1, lam, alpha = scalars
    n = A.shape[1]
    l = m + n + 1
    hv = h[: l - 1]
    gv = g[: l - 1]

    def body(_, carry):
        u, v = carry
        r = u + v
        q = jnp.concatenate([rho_y * r[:m], r[m : l - 1]])
        q = q - r[l - 1] * hv
        q = q - (jnp.dot(q, gv) * inv_gth1) * hv
        wx = -q[m:]
        rhs = q[:m] + A @ wx
        z_y = Ninv @ rhs
        z_x = A.T @ z_y - wx
        tau_t = r[l - 1] + jnp.dot(z_y, hv[:m]) + jnp.dot(z_x, hv[m:])
        u_t = jnp.concatenate([z_y, z_x, tau_t[None]])
        head = u_t[:m] - v[:m]
        t = alpha * u_t[m:] + (1 - alpha) * u[m:] - v[m:]
        tail = _prox(t, lam)
        u_new = jnp.concatenate([head, tail])
        v_new = v.at[m:].add(tail - alpha * u_t[m:] - (1 - alpha) * u[m:])
        return (u_new, v_new)

    return jax.lax.fori_loop(0, T, body, (u, v))


def _dot_t(a, M):
    """(1, k) x (r, k) -> (1, r): contract a's lanes with M's rows.

    Precision.HIGHEST is load-bearing: the v5e MXU rounds f32 operands
    to bf16 by default (~2e-3 relative error), which destroys the
    cancellation-heavy tau_t dot and blows up the sprint trajectory
    (measured on hardware: tau_t -23.4 vs the true 1.89 after ONE
    iteration).  HIGHEST selects the multi-pass f32 path."""
    return jax.lax.dot_general(a, M, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _dot(a, M):
    """(1, r) x (r, k) -> (1, k).  See _dot_t on Precision.HIGHEST."""
    return jax.lax.dot_general(a, M, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _sprint_kernel(scal_ref, A_ref, Ninv_ref, hy_ref, hx_ref, gy_ref,
                   gx_ref, y_ref, x_ref, vy_ref, vx_ref,
                   yo_ref, xo_ref, vxo_ref, sco_ref, *, T):
    rho_y = scal_ref[0]
    inv_gth1 = scal_ref[1]
    lam = scal_ref[2]
    alpha = scal_ref[3]
    A = A_ref[:]          # (mp, np) zero-padded
    Ninv = Ninv_ref[:]    # (mp, mp) zero-padded
    hy = hy_ref[:]        # (1, mp) zero-padded
    hx = hx_ref[:]        # (1, np)
    gy = gy_ref[:]
    gx = gx_ref[:]
    vy = vy_ref[:]        # constant: the y-block dual never updates

    def body(_, carry):
        y, x, vx, tau, kappa = carry
        ry = y + vy
        rx = x + vx
        rtau = tau + kappa
        qy = rho_y * ry - rtau * hy
        qx = rx - rtau * hx
        coef = (jnp.sum(qy * gy) + jnp.sum(qx * gx)) * inv_gth1
        qy = qy - coef * hy
        qx = qx - coef * hx
        wx = -qx
        rhs = qy + _dot_t(wx, A)          # (1, mp)
        z_y = _dot_t(rhs, Ninv)           # Ninv symmetric
        z_x = _dot(z_y, A) - wx           # (1, np)
        tau_t = rtau + jnp.sum(z_y * hy) + jnp.sum(z_x * hx)
        y_new = z_y - vy
        rel_x = alpha * z_x + (1.0 - alpha) * x
        rel_tau = alpha * tau_t + (1.0 - alpha) * tau
        x_new = _prox(rel_x - vx, lam)
        tau_new = _prox(rel_tau - kappa, lam)
        vx_new = vx + x_new - rel_x
        kappa_new = kappa + tau_new - rel_tau
        return (y_new, x_new, vx_new, tau_new, kappa_new)

    y, x, vx, tau, kappa = jax.lax.fori_loop(
        0, T, body,
        (y_ref[:], x_ref[:], vx_ref[:], scal_ref[4], scal_ref[5]))
    yo_ref[:] = y
    xo_ref[:] = x
    vxo_ref[:] = vx
    sco_ref[0] = tau
    sco_ref[1] = kappa


def _pad128(k):
    return -(-k // 128) * 128


def _sprint_stop_ref(A, Ninv, hy, hx, gy, gx, maskx, scalars, y, x, vy, vx,
                     T, probe):
    """XLA fallback of the stopping sprint (identical math to the kernel:
    true-f32 matmuls, probe-granular in-loop qres stop).  Operands are the
    kernel's padded 2-D blocks."""
    with jax.default_matmul_precision("highest"):
        rho_y, inv_gth1, lam, alpha, tau0, kappa0, thresh = scalars
        vy2 = jnp.sum(vy * vy)

        def iter_body(_, carry):
            y, x, vx, tau, kappa = carry
            ry = y + vy
            rx = x + vx
            rtau = tau + kappa
            qy = rho_y * ry - rtau * hy
            qx = rx - rtau * hx
            coef = (jnp.sum(qy * gy) + jnp.sum(qx * gx)) * inv_gth1
            qy = qy - coef * hy
            qx = qx - coef * hx
            wx = -qx
            rhs = qy + _dot_t(wx, A)
            z_y = _dot_t(rhs, Ninv)
            z_x = _dot(z_y, A) - wx
            tau_t = rtau + jnp.sum(z_y * hy) + jnp.sum(z_x * hx)
            y_new = z_y - vy
            rel_x = alpha * z_x + (1.0 - alpha) * x
            rel_tau = alpha * tau_t + (1.0 - alpha) * tau
            x_new = _prox(rel_x - vx, lam) * maskx
            tau_new = _prox(rel_tau - kappa, lam)
            vx_new = vx + x_new - rel_x
            kappa_new = kappa + tau_new - rel_tau
            return (y_new, x_new, vx_new, tau_new, kappa_new)

        def qres(y, x, vx, tau, kappa):
            # HSD-operator residual (`abip.c:1951-1996`): h = (-b; c), so
            # Ax - b*tau = Ax + tau*hy and b'y - c'x = -y.hy - x.hx
            q1 = _dot_t(x, A) + tau * hy
            q2 = (_dot(y, A) + vx - tau * hx) * maskx
            q3 = -jnp.sum(y * hy) - jnp.sum(x * hx) - kappa
            qsq = jnp.sum(q1 * q1) + jnp.sum(q2 * q2) + q3 * q3
            un = jnp.sum(y * y) + jnp.sum(x * x) + tau * tau
            vn = vy2 + jnp.sum(vx * vx) + kappa * kappa
            return jnp.sqrt(qsq) / (1.0 + jnp.sqrt(un + vn))

        def trip_cond(c):
            t = c[0]
            q = c[6]
            return jnp.logical_and(t < T, q >= thresh)

        def trip_body(c):
            t, y, x, vx, tau, kappa, _q = c
            y, x, vx, tau, kappa = jax.lax.fori_loop(
                0, probe, iter_body, (y, x, vx, tau, kappa))
            q = qres(y, x, vx, tau, kappa)
            return (t + probe, y, x, vx, tau, kappa, q)

        return jax.lax.while_loop(
            trip_cond, trip_body,
            (jnp.zeros((), jnp.int32), y, x, vx, tau0, kappa0,
             jnp.full((), jnp.inf, jnp.float32)))


def _sprint_stop_compute(scal, A, Ninv, hy, hx, gy, gx, maskx,
                         y0, x0, vy, vx0, *, T, probe):
    """The stopping sprint on VALUES (padded 2-D blocks): up to T f32
    ADMM iterations with a qres probe every `probe` iterations -- the
    inner stopping criterion of the reference hot loop
    (`abip.c:2131-2173`, checked every iteration there) evaluated where
    it costs 2 VMEM matmuls instead of a ~50-op XLA dispatch chain.
    Exits within probe-1 iterations of the true stopping point.

    Shared by the unbatched and grid-batched kernels and (under
    `default_matmul_precision('highest')`) by the XLA fallback.
    Returns (y, x, vx, out_row) with out_row a (1, 128) f32 row holding
    [tau, kappa, qres, t_done]."""
    rho_y = scal[0, 0]
    inv_gth1 = scal[0, 1]
    lam = scal[0, 2]
    alpha = scal[0, 3]
    tau0 = scal[0, 4]
    kappa0 = scal[0, 5]
    thresh = scal[0, 6]
    vy2 = jnp.sum(vy * vy)

    def iter_body(_, carry):
        y, x, vx, tau, kappa = carry
        ry = y + vy
        rx = x + vx
        rtau = tau + kappa
        qy = rho_y * ry - rtau * hy
        qx = rx - rtau * hx
        coef = (jnp.sum(qy * gy) + jnp.sum(qx * gx)) * inv_gth1
        qy = qy - coef * hy
        qx = qx - coef * hx
        wx = -qx
        rhs = qy + _dot_t(wx, A)          # (1, mp)
        z_y = _dot_t(rhs, Ninv)           # Ninv symmetric
        z_x = _dot(z_y, A) - wx           # (1, np)
        tau_t = rtau + jnp.sum(z_y * hy) + jnp.sum(z_x * hx)
        y_new = z_y - vy
        rel_x = alpha * z_x + (1.0 - alpha) * x
        rel_tau = alpha * tau_t + (1.0 - alpha) * tau
        # mask the prox output: prox(0, lam) = sqrt(lam) != 0 would wake
        # the padded coordinates and contaminate the qres reductions
        x_new = _prox(rel_x - vx, lam) * maskx
        tau_new = _prox(rel_tau - kappa, lam)
        vx_new = vx + x_new - rel_x
        kappa_new = kappa + tau_new - rel_tau
        return (y_new, x_new, vx_new, tau_new, kappa_new)

    def qres(y, x, vx, tau, kappa):
        # HSD-operator residual (`abip.c:1951-1996`): h = (-b; c), so
        # Ax - b*tau = Ax + tau*hy and b'y - c'x = -y.hy - x.hx
        q1 = _dot_t(x, A) + tau * hy
        q2 = (_dot(y, A) + vx - tau * hx) * maskx
        q3 = -jnp.sum(y * hy) - jnp.sum(x * hx) - kappa
        qsq = jnp.sum(q1 * q1) + jnp.sum(q2 * q2) + q3 * q3
        un = jnp.sum(y * y) + jnp.sum(x * x) + tau * tau
        vn = vy2 + jnp.sum(vx * vx) + kappa * kappa
        return jnp.sqrt(qsq) / (1.0 + jnp.sqrt(un + vn))

    def trip_cond(c):
        t = c[0]
        q = c[6]
        return jnp.logical_and(t < T, q >= thresh)

    def trip_body(c):
        t, y, x, vx, tau, kappa, _q = c
        y, x, vx, tau, kappa = jax.lax.fori_loop(
            0, probe, iter_body, (y, x, vx, tau, kappa))
        q = qres(y, x, vx, tau, kappa)
        return (t + probe, y, x, vx, tau, kappa, q)

    t, y, x, vx, tau, kappa, q = jax.lax.while_loop(
        trip_cond, trip_body,
        (jnp.zeros((), jnp.int32), y0, x0, vx0,
         tau0, kappa0, jnp.full((), jnp.inf, jnp.float32)))
    # build the scalar row with iota selects: .at[].set lowers to
    # scatter, which Mosaic does not implement
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out = jnp.where(col == 0, tau, 0.0)
    out = out + jnp.where(col == 1, kappa, 0.0)
    out = out + jnp.where(col == 2, q, 0.0)
    out = out + jnp.where(col == 3, t.astype(jnp.float32), 0.0)
    return y, x, vx, out.astype(jnp.float32)


def _sprint_stop_kernel(scal_ref, A_ref, Ninv_ref, hy_ref, hx_ref, gy_ref,
                        gx_ref, maskx_ref, y_ref, x_ref, vy_ref, vx_ref,
                        yo_ref, xo_ref, vxo_ref, sco_ref, *, T, probe):
    """Unbatched shell: whole-array VMEM blocks."""
    y, x, vx, out = _sprint_stop_compute(
        scal_ref[:], A_ref[:], Ninv_ref[:], hy_ref[:], hx_ref[:],
        gy_ref[:], gx_ref[:], maskx_ref[:], y_ref[:], x_ref[:],
        vy_ref[:], vx_ref[:], T=T, probe=probe)
    yo_ref[:] = y
    xo_ref[:] = x
    vxo_ref[:] = vx
    sco_ref[:] = out


def _sprint_stop_kernel_batched(scal_ref, A_ref, Ninv_ref, hy_ref, hx_ref,
                                gy_ref, gx_ref, maskx_ref, y_ref, x_ref,
                                vy_ref, vx_ref, yo_ref, xo_ref, vxo_ref,
                                sco_ref, *, T, probe):
    """Grid-batched shell: one grid step per instance; every ref is a
    (1, ...) block of the lane's operands (vectors ride (B, 1, kp)
    arrays so the (1, 1, kp) block satisfies the Mosaic (8, 128) block
    tiling rule -- a (1, kp) block of a (B, kp) array does not)."""
    y, x, vx, out = _sprint_stop_compute(
        scal_ref[0], A_ref[0], Ninv_ref[0], hy_ref[0], hx_ref[0],
        gy_ref[0], gx_ref[0], maskx_ref[0], y_ref[0], x_ref[0],
        vy_ref[0], vx_ref[0], T=T, probe=probe)
    yo_ref[:] = y[None]
    xo_ref[:] = x[None]
    vxo_ref[:] = vx[None]
    sco_ref[:] = out[None]


def _stop_op(T, probe, interpret):
    """pallas dispatch for the stopping sprint with an EXPLICIT batch
    rule: `jax.vmap` of a pallas_call auto-derives batched block specs
    that the Mosaic compiler rejects for this kernel (r03 remote-compile
    500s), so the vmap rule instead launches a hand-written grid-over-
    instances kernel."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(scal, A_p, Ninv_p, hy, hx, gy, gx, maskx, y0, x0, vy0, vx0):
        mp, np_ = A_p.shape
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_sprint_stop_kernel, T=T, probe=probe),
            out_shape=(
                jax.ShapeDtypeStruct((1, mp), jnp.float32),
                jax.ShapeDtypeStruct((1, np_), jnp.float32),
                jax.ShapeDtypeStruct((1, np_), jnp.float32),
                jax.ShapeDtypeStruct((1, 128), jnp.float32),
            ),
            in_specs=[vmem] * 12,
            out_specs=(vmem, vmem, vmem, vmem),
            compiler_params=vmem_params(
                4 * (A_p.size + Ninv_p.size + 9 * (mp + np_))),
            interpret=interpret,
        )(scal, A_p, Ninv_p, hy, hx, gy, gx, maskx, y0, x0, vy0, vx0)

    @op.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        B = axis_size
        # per-lane operands are already 2-D blocks ((1, kp) vectors,
        # (mp, np) matrices), so batched args arrive exactly in the
        # (B, 1, kp) / (B, mp, np) layout the grid kernel wants
        args = [a if batched else jnp.broadcast_to(a, (B,) + a.shape)
                for a, batched in zip(args, in_batched)]
        _, mp, np_ = args[1].shape
        # index_map constants must be i32 non-tracer values: a literal 0
        # traces to i64 under x64 mode and Mosaic fails to legalize the
        # index transform (same lesson as spmv_pallas.bcsr_matvec)
        z = np.int32(0)
        mat3 = lambda r, c: pl.BlockSpec(  # noqa: E731
            (1, r, c), lambda b: (b, z, z), memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            partial(_sprint_stop_kernel_batched, T=T, probe=probe),
            grid=(B,),
            out_shape=(
                jax.ShapeDtypeStruct((B, 1, mp), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, np_), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, np_), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, 128), jnp.float32),
            ),
            in_specs=[mat3(1, 128), mat3(mp, np_), mat3(mp, mp),
                      mat3(1, mp), mat3(1, np_), mat3(1, mp),
                      mat3(1, np_), mat3(1, np_), mat3(1, mp),
                      mat3(1, np_), mat3(1, mp), mat3(1, np_)],
            out_specs=(mat3(1, mp), mat3(1, np_), mat3(1, np_),
                       mat3(1, 128)),
            compiler_params=vmem_params(
                4 * (mp * np_ + mp * mp + 9 * (mp + np_))),
            interpret=interpret,
        )(*args)
        return tuple(outs), (True, True, True, True)

    return op


@partial(jax.jit, static_argnames=("T", "probe", "interpret", "use_pallas"))
def fused_admm_sprint_stop(A32, Ninv32, h32, g32, rho_y, g_th, lam, alpha,
                           thresh, u32, v32, T=768, probe=8,
                           interpret=False, use_pallas=None):
    """Run UP TO T f32 ADMM iterations in one launch, stopping within
    `probe`-1 iterations of the inner criterion `qres < thresh`.

    Returns (u, v, t_done, qres): the f32 iterate pair, the number of
    iterations actually executed (int32), and the final HSD-operator
    residual (f32).  Unlike `fused_admm_sprint`, this kernel is
    batchable: under `vmap` a custom batching rule launches a
    grid-over-instances variant (see `_stop_op`).

    Reference inner stop this implements: `abip.c:2131-2173` (the
    `iterate_Q_norm_resd < gamma*mu` break, checked every iteration).
    """
    m, n = A32.shape
    if use_pallas is None:
        from .spmv_pallas import pallas_default, pallas_fits

        _mp, _np = _pad128(m), _pad128(n)
        use_pallas = pallas_default() and pallas_fits(
            4 * (_mp * _np + _mp * _mp + 7 * (_mp + _np)))
    l = m + n + 1
    scalars_tuple = (
        jnp.asarray(rho_y, jnp.float32),
        (1.0 / (jnp.asarray(g_th, jnp.float64) + 1.0)).astype(jnp.float32),
        jnp.asarray(lam, jnp.float32),
        jnp.asarray(alpha, jnp.float32),
        u32[l - 1].astype(jnp.float32),
        v32[l - 1].astype(jnp.float32),
        jnp.asarray(thresh, jnp.float32),
    )
    mp, np_ = _pad128(m), _pad128(n)

    def pad_vec(x, k, kp):
        return jnp.zeros((1, kp), jnp.float32).at[0, :k].set(
            x.astype(jnp.float32))

    def pad_mat(M, r, c, rp, cp):
        return jnp.zeros((rp, cp), jnp.float32).at[:r, :c].set(
            M.astype(jnp.float32))

    A_p = pad_mat(A32, m, n, mp, np_)
    Ninv_p = pad_mat(Ninv32, m, m, mp, mp)
    hy = pad_vec(h32[:m], m, mp)
    hx = pad_vec(h32[m : m + n], n, np_)
    gy = pad_vec(g32[:m], m, mp)
    gx = pad_vec(g32[m : m + n], n, np_)
    maskx = pad_vec(jnp.ones((n,), jnp.float32), n, np_)
    y0 = pad_vec(u32[:m], m, mp)
    x0 = pad_vec(u32[m : m + n], n, np_)
    vy0 = pad_vec(v32[:m], m, mp)
    vx0 = pad_vec(v32[m : m + n], n, np_)

    scal_row = jnp.zeros((1, 128), jnp.float32)
    for i, s in enumerate(scalars_tuple):
        scal_row = scal_row.at[0, i].set(s)

    if use_pallas and _HAVE_PALLAS:
        y, x, vx, sc = _stop_op(T, probe, interpret)(
            scal_row, A_p, Ninv_p, hy, hx, gy, gx, maskx, y0, x0, vy0, vx0)
        tau, kappa, q = sc[0, 0], sc[0, 1], sc[0, 2]
        t_done = sc[0, 3].astype(jnp.int32)
    else:
        t_done, y, x, vx, tau, kappa, q = _sprint_stop_ref(
            A_p, Ninv_p, hy, hx, gy, gx, maskx, scalars_tuple,
            y0, x0, vy0, vx0, T, probe)
    u_out = jnp.concatenate([y[0, :m], x[0, :n], tau[None]])
    v_out = jnp.concatenate([v32[:m].astype(jnp.float32), vx[0, :n],
                             kappa[None]])
    return u_out, v_out, t_done, q


@partial(jax.jit, static_argnames=("T", "interpret", "use_pallas"))
def fused_admm_sprint(A32, Ninv32, h32, g32, rho_y, g_th, lam, alpha,
                      u32, v32, T=32, interpret=False, use_pallas=None):
    """Run T f32 ADMM iterations in one launch; returns (u, v).

    A32 (m, n), Ninv32 (m, m) = (rho_y I + A A')^-1, h32/g32 (l,) the HSD
    rank-1 data (`abip.c:1917-1924`), lam = mu/beta.

    use_pallas=None resolves by backend (kernel on TPU, identical-math
    XLA fallback elsewhere).
    """
    m, n = A32.shape
    if use_pallas is None:
        from .spmv_pallas import pallas_default, pallas_fits

        _mp, _np = _pad128(m), _pad128(n)
        use_pallas = pallas_default() and pallas_fits(
            4 * (_mp * _np + _mp * _mp + 7 * (_mp + _np)))
    l = m + n + 1
    scalars = jnp.stack([
        jnp.asarray(rho_y, jnp.float32),
        1.0 / (jnp.asarray(g_th, jnp.float32) + 1.0),
        jnp.asarray(lam, jnp.float32),
        jnp.asarray(alpha, jnp.float32),
        u32[l - 1].astype(jnp.float32),
        v32[l - 1].astype(jnp.float32),
    ])
    if not (use_pallas and _HAVE_PALLAS):
        return _sprint_ref(A32, Ninv32, h32, g32,
                           (scalars[0], scalars[1], scalars[2], scalars[3]),
                           u32, v32, T, m)

    mp, np_ = _pad128(m), _pad128(n)

    def pad_vec(x, k, kp):
        return jnp.zeros((1, kp), jnp.float32).at[0, :k].set(
            x.astype(jnp.float32))

    def pad_mat(M, r, c, rp, cp):
        return jnp.zeros((rp, cp), jnp.float32).at[:r, :c].set(
            M.astype(jnp.float32))

    A_p = pad_mat(A32, m, n, mp, np_)
    Ninv_p = pad_mat(Ninv32, m, m, mp, mp)
    hy = pad_vec(h32[:m], m, mp)
    hx = pad_vec(h32[m : m + n], n, np_)
    gy = pad_vec(g32[:m], m, mp)
    gx = pad_vec(g32[m : m + n], n, np_)
    y0 = pad_vec(u32[:m], m, mp)
    x0 = pad_vec(u32[m : m + n], n, np_)
    vy0 = pad_vec(v32[:m], m, mp)
    vx0 = pad_vec(v32[m : m + n], n, np_)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    y, x, vx, sc = pl.pallas_call(
        partial(_sprint_kernel, T=T),
        out_shape=(
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.float32),
        ),
        in_specs=[smem] + [vmem] * 10,
        out_specs=(vmem, vmem, vmem, smem),
        compiler_params=vmem_params(
            4 * (A_p.size + Ninv_p.size + 8 * (mp + np_))),
        interpret=interpret,
    )(scalars, A_p, Ninv_p, hy, hx, gy, gx, y0, x0, vy0, vx0)
    u_out = jnp.concatenate([y[0, :m], x[0, :n], sc[0][None]])
    v_out = jnp.concatenate([v32[:m].astype(jnp.float32), vx[0, :n],
                             sc[1][None]])
    return u_out, v_out
