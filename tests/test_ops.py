"""Pallas kernel tests (interpret mode on CPU; compiled path on TPU)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from abip_tpu.ops import BCSRMatrix, bcsr_matvec, fused_barrier_step
from abip_tpu.ops.prox_pallas import _ref_impl


@pytest.mark.parametrize("m,n,density", [(20, 50, 0.2), (100, 300, 0.05),
                                         (8, 128, 1.0), (17, 260, 0.3)])
def test_bcsr_matvec_matches_dense(rng, m, n, density):
    A = sp.random(m, n, density=density, random_state=np.random.RandomState(0),
                  format="csr")
    x = rng.standard_normal(n)
    B = BCSRMatrix.from_scipy(A, dtype=jnp.float32)
    y_ref = A @ x

    y_xla = np.asarray(bcsr_matvec(B, jnp.asarray(x), use_pallas=False))
    np.testing.assert_allclose(y_xla, y_ref, rtol=1e-5, atol=1e-5)

    y_pl = np.asarray(bcsr_matvec(B, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y_pl, y_ref, rtol=1e-5, atol=1e-5)


def test_bcsr_packing_stats(rng):
    A = sp.random(64, 512, density=0.1, random_state=np.random.RandomState(1))
    B = BCSRMatrix.from_scipy(A)
    assert B.shape == (64, 512)
    assert B.nnz == A.nnz
    assert B.data.shape[2:] == (8, 128)


def test_fused_barrier_step_matches_ref(rng):
    n = 256
    u_t = jnp.asarray(rng.standard_normal(n))
    u_prev = jnp.asarray(rng.standard_normal(n))
    v = jnp.asarray(rng.standard_normal(n))
    lam, alpha = 0.01, 1.8
    u_ref, v_ref = _ref_impl(u_t, u_prev, v, lam, alpha)
    u_pl, v_pl = fused_barrier_step(u_t, u_prev, v, lam, alpha, interpret=True)
    np.testing.assert_allclose(np.asarray(u_pl), np.asarray(u_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v_pl), np.asarray(v_ref), rtol=1e-12)
    # positivity of the prox output
    assert (np.asarray(u_pl) > 0).all()


def test_fused_barrier_step_agrees_with_hsd(rng):
    """The kernel's math must equal hsd.admm_update on the tail block."""
    from abip_tpu import hsd

    m, n = 5, 20
    l = m + n + 1
    u = jnp.asarray(rng.standard_normal(l))
    v = jnp.asarray(rng.standard_normal(l))
    u_t = jnp.asarray(rng.standard_normal(l))
    lam, alpha = 0.1, 1.8
    u_new, v_new = hsd.admm_update(u, v, u, u_t, lam, alpha, m)
    u_k, v_k = fused_barrier_step(u_t[m:], u[m:], v[m:], lam, alpha,
                                  use_pallas=False)
    np.testing.assert_allclose(np.asarray(u_new[m:]), np.asarray(u_k), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v_new[m:]), np.asarray(v_k), rtol=1e-12)


def test_fused_admm_sprint_matches_hsd(rng):
    """The in-kernel sprint must reproduce T steps of hsd math (in f32)."""
    from abip_tpu import hsd
    from abip_tpu.ops.admm_pallas import fused_admm_sprint

    m, n = 8, 24
    l = m + n + 1
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    rho_y = 1e-3
    N = rho_y * jnp.eye(m, dtype=jnp.float32) + A @ A.T
    Ninv = jnp.linalg.inv(N.astype(jnp.float64)).astype(jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    c = jnp.asarray(rng.standard_normal(n), jnp.float32)
    h = jnp.concatenate([-b, c, jnp.zeros(1, jnp.float32)])
    gv = jnp.linalg.solve(N.astype(jnp.float64),
                          (h[:m] + A @ h[m:l - 1]).astype(jnp.float64))
    g_x = A.T.astype(jnp.float64) @ gv - h[m:l - 1].astype(jnp.float64)
    g = jnp.concatenate([gv, -g_x, jnp.zeros(1)]).astype(jnp.float32)
    g_th = jnp.dot(h[:l - 1], g[:l - 1])

    u0 = jnp.concatenate([jnp.zeros(m), jnp.ones(n + 1)]).astype(jnp.float32)
    lam, alpha, T = 0.1, 1.8, 7

    # reference trajectory via hsd (f32 operands; exact N^-1 solve)
    def solve_fn(w_y, w_x, k, warm):
        z_y = Ninv @ (w_y + A @ w_x)
        z_x = A.T @ z_y - w_x
        return z_y, z_x, jnp.zeros((), jnp.int32)

    u_ref, v_ref = u0, u0
    for _ in range(T):
        u_t, _ = hsd.project_lin_sys(u_ref, v_ref, h[:l - 1], g[:l - 1],
                                     g_th, rho_y, solve_fn, 0, m, n)
        u_ref, v_ref = hsd.admm_update(u_ref, v_ref, u_ref, u_t, lam, alpha, m)

    for kwargs in (dict(use_pallas=False), dict(interpret=True)):
        u_k, v_k = fused_admm_sprint(A, Ninv, h, g, rho_y, g_th, lam, alpha,
                                     u0, u0, T=T, **kwargs)
        np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                                   rtol=2e-5, atol=2e-5)


def test_ell_matvec_matches_dense(rng):
    import scipy.sparse as sp

    from abip_tpu.ops.ell import ELLMatrix, ell_matvec

    A = sp.random(50, 120, density=0.05, random_state=np.random.RandomState(0),
                  format="csr")
    E = ELLMatrix.from_scipy(A)
    x = rng.standard_normal(120)
    np.testing.assert_allclose(np.asarray(ell_matvec(E, jnp.asarray(x))),
                               A @ x, rtol=1e-12, atol=1e-12)


def test_sprint_engine_solves_batch(rng):
    """engine='sprint' (fused T-iteration sprints through the bulk, anchored
    steps for the endgame) reaches the same optima as engine='steps'."""
    import jax.numpy as jnp

    from abip_tpu.parallel.batched import solve_lp_batch
    from tests.conftest import random_lp
    from scipy.optimize import linprog

    B, m, n = 3, 20, 60
    As, bs, cs, refs = [], [], [], []
    for i in range(B):
        A, b, c = random_lp(np.random.default_rng(100 + i), m, n)
        As.append(A); bs.append(b); cs.append(c)
        refs.append(linprog(c, A_eq=A, b_eq=b, bounds=(0, None),
                            method="highs").fun)
    res = solve_lp_batch(jnp.asarray(np.stack(As)), jnp.asarray(np.stack(bs)),
                         jnp.asarray(np.stack(cs)), eps=1e-6,
                         precision="mixed", engine="sprint", sprint_T=16)
    for i in range(B):
        assert int(res.status[i]) == 1
        assert float(res.pobj[i]) == pytest.approx(
            refs[i], abs=1e-4 * (1 + abs(refs[i])))


def test_sprint_engine_requires_mixed():
    import jax.numpy as jnp

    from abip_tpu.parallel.batched import device_solve_lp

    A = jnp.eye(2)
    with pytest.raises(ValueError, match="requires precision='mixed'"):
        device_solve_lp(A, jnp.ones(2), jnp.ones(2), engine="sprint")


import jax  # noqa: E402  (backend marker below)

tpu_only = pytest.mark.skipif(jax.default_backend() != "tpu",
                              reason="needs a real TPU backend")


@tpu_only
def test_bcsr_pallas_compiled_matches_xla(rng):
    """Compiled-TPU validation of the Pallas BCSR kernel (VERDICT round 1
    #2): compiled kernel output must match the XLA fallback."""
    import scipy.sparse as sp
    import jax.numpy as jnp

    from abip_tpu.ops.spmv_pallas import BCSRMatrix, bcsr_matvec

    A = sp.random(64, 256, density=0.1, random_state=7, format="csr")
    B = BCSRMatrix.from_scipy(A)
    x = rng.standard_normal(256).astype(np.float32)
    y_xla = np.asarray(bcsr_matvec(B, jnp.asarray(x), use_pallas=False))
    y_pal = np.asarray(bcsr_matvec(B, jnp.asarray(x), use_pallas=True))
    np.testing.assert_allclose(y_pal, y_xla, rtol=1e-5, atol=1e-5)


@tpu_only
def test_sprint_pallas_compiled_matches_xla(rng):
    """Compiled fused_admm_sprint must match the identical-math XLA path."""
    import jax.numpy as jnp

    from abip_tpu.ops.admm_pallas import fused_admm_sprint

    m, n = 16, 48
    l = m + n + 1
    A = rng.standard_normal((m, n)).astype(np.float32)
    N = 1e-3 * np.eye(m) + A @ A.T
    Ninv = np.linalg.inv(N).astype(np.float32)
    h = rng.standard_normal(l).astype(np.float32)
    g = rng.standard_normal(l).astype(np.float32)
    u = np.abs(rng.standard_normal(l)).astype(np.float32)
    v = np.abs(rng.standard_normal(l)).astype(np.float32)
    args = (jnp.asarray(A), jnp.asarray(Ninv), jnp.asarray(h),
            jnp.asarray(g), 1e-3, 0.7, 0.05, 1.8, jnp.asarray(u),
            jnp.asarray(v))
    u_x, v_x = fused_admm_sprint(*args, T=8, use_pallas=False)
    u_p, v_p = fused_admm_sprint(*args, T=8, use_pallas=True)
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x),
                               rtol=1e-4, atol=1e-4)


def test_qcp_iteration_cost_model():
    """Conic roofline sanity: Woodbury dual form (2m <= n) costs less
    than the primal form; ceilings are positive and finite."""
    from abip_tpu.utils.roofline import qcp_iteration_cost

    dual = qcp_iteration_cost(100, 1000, form="auto", chip="tpu_v5e")
    primal = qcp_iteration_cost(100, 1000, form="primal", chip="tpu_v5e")
    assert dual.bytes_moved < primal.bytes_moved
    assert 0 < dual.ceiling_iters_per_sec < float("inf")
    # thinning the inner criterion strictly lowers bytes per iteration
    thin = qcp_iteration_cost(100, 1000, inner_crit_period=8)
    dense = qcp_iteration_cost(100, 1000, inner_crit_period=1)
    assert thin.bytes_moved < dense.bytes_moved


def test_sprint_stop_matches_hsd_and_stops(rng):
    """fused_admm_sprint_stop with thresh=0 must reproduce T steps of the
    hsd math (f32); with a huge thresh it must stop after one probe."""
    from abip_tpu import hsd
    from abip_tpu.ops.admm_pallas import fused_admm_sprint_stop

    m, n = 8, 24
    l = m + n + 1
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    rho_y = 1e-3
    N = rho_y * jnp.eye(m, dtype=jnp.float32) + A @ A.T
    Ninv = jnp.linalg.inv(N.astype(jnp.float64)).astype(jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    c = jnp.asarray(rng.standard_normal(n), jnp.float32)
    h = jnp.concatenate([-b, c])
    gv = jnp.linalg.solve(N.astype(jnp.float64),
                          (h[:m] + A @ h[m:]).astype(jnp.float64))
    g_x = A.T.astype(jnp.float64) @ gv - h[m:].astype(jnp.float64)
    g = jnp.concatenate([gv, -g_x]).astype(jnp.float32)
    g_th = jnp.dot(h, g)
    u0 = jnp.concatenate([jnp.zeros(m), jnp.ones(n + 1)]).astype(jnp.float32)
    lam, alpha, T = 0.1, 1.8, 8

    def solve_fn(w_y, w_x, k, warm):
        z_y = Ninv @ (w_y + A @ w_x)
        z_x = A.T @ z_y - w_x
        return z_y, z_x, jnp.zeros((), jnp.int32)

    u_ref, v_ref = u0, u0
    for _ in range(T):
        u_t, _ = hsd.project_lin_sys(u_ref, v_ref, h, g, g_th, rho_y,
                                     solve_fn, 0, m, n)
        u_ref, v_ref = hsd.admm_update(u_ref, v_ref, u_ref, u_t, lam,
                                       alpha, m)

    for kwargs in (dict(use_pallas=False), dict(interpret=True)):
        u_k, v_k, t_k, q_k = fused_admm_sprint_stop(
            A, Ninv, h, g, rho_y, g_th, lam, alpha, 0.0, u0, u0,
            T=T, probe=4, **kwargs)
        assert int(t_k) == T
        assert float(q_k) > 0
        np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                                   rtol=2e-5, atol=2e-5)
        # huge threshold: the in-kernel stop fires at the first probe
        _, _, t_s, _ = fused_admm_sprint_stop(
            A, Ninv, h, g, rho_y, g_th, lam, alpha, 1e9, u0, u0,
            T=T, probe=4, **kwargs)
        assert int(t_s) == 4


def test_sprint_stop_vmap_grid_matches_fallback(rng):
    """The custom_vmap batch rule (explicit grid-over-instances kernel)
    must match the vmapped XLA fallback (interpret mode)."""
    import jax

    from abip_tpu.ops.admm_pallas import fused_admm_sprint_stop

    B, m, n = 3, 8, 24
    l = m + n + 1
    A = rng.standard_normal((B, m, n)).astype(np.float32) * 0.3
    Ninv = np.stack([np.linalg.inv(1e-3 * np.eye(m) + a @ a.T)
                     for a in A]).astype(np.float32)
    h = rng.standard_normal((B, l)).astype(np.float32) * 0.1
    g = rng.standard_normal((B, l)).astype(np.float32) * 0.1
    u = np.abs(rng.standard_normal((B, l))).astype(np.float32)
    v = np.abs(rng.standard_normal((B, l))).astype(np.float32)
    th = np.zeros(B, np.float32)

    def call(**kw):
        return jax.vmap(
            lambda A_, N_, h_, g_, t_, u_, v_: fused_admm_sprint_stop(
                A_, N_, h_, g_, 1e-3, 0.7, 0.05, 1.8, t_, u_, v_,
                T=8, probe=4, **kw))(
            *map(jnp.asarray, (A, Ninv, h, g, th, u, v)))

    ux, vx, tx, qx = call(use_pallas=False)
    up, vp, tp, qp = call(use_pallas=True, interpret=True)
    assert np.asarray(tp).tolist() == np.asarray(tx).tolist()
    np.testing.assert_allclose(np.asarray(up), np.asarray(ux),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(qp), np.asarray(qx),
                               rtol=1e-4, atol=1e-6)


def test_sprint2_engine_solves_batch(rng):
    """engine='sprint2' (two-phase: stopping-sprint bulk + anchored-f64
    endgame) reaches the scipy optima at 1e-6 with honest per-lane
    iteration counts carried across the phase hand-off."""
    import jax.numpy as jnp
    from scipy.optimize import linprog

    from abip_tpu.parallel.batched import solve_lp_batch
    from tests.conftest import random_lp

    B, m, n = 3, 20, 60
    As, bs, cs, refs = [], [], [], []
    for i in range(B):
        A, b, c = random_lp(np.random.default_rng(200 + i), m, n)
        As.append(A); bs.append(b); cs.append(c)
        refs.append(linprog(c, A_eq=A, b_eq=b, bounds=(0, None),
                            method="highs").fun)
    res = solve_lp_batch(jnp.asarray(np.stack(As)), jnp.asarray(np.stack(bs)),
                         jnp.asarray(np.stack(cs)), eps=1e-6,
                         precision="mixed", solver="inverse",
                         engine="sprint2", qres_period=256, probe_period=8)
    for i in range(B):
        assert int(res.status[i]) == 1
        assert int(res.admm_iters[i]) > 0
        assert float(res.rel_gap[i]) < 1.05e-6
        assert float(res.pobj[i]) == pytest.approx(
            refs[i], abs=1e-4 * (1 + abs(refs[i])))


def test_sprint2_terminates_on_ipm_cap(rng):
    """A lane that exits device_solve_lp via the max_ipm cap (status 0,
    admm_iters < max_admm) must still be marked finished by the phase-2
    compaction loop -- with the cap unhandled the host `while active.size`
    loop re-ran the lane forever (advisor finding, round 3)."""
    import jax.numpy as jnp

    from abip_tpu.parallel.batched import solve_lp_batch
    from tests.conftest import random_lp

    B, m, n = 3, 20, 60
    As, bs, cs = [], [], []
    for i in range(B):
        A, b, c = random_lp(np.random.default_rng(300 + i), m, n)
        As.append(A); bs.append(b); cs.append(c)
    res = solve_lp_batch(jnp.asarray(np.stack(As)), jnp.asarray(np.stack(bs)),
                         jnp.asarray(np.stack(cs)), eps=1e-6,
                         precision="mixed", solver="inverse",
                         engine="sprint2", qres_period=256, probe_period=8,
                         max_ipm=2)
    # must return (not hang); capped lanes come back status 0 with their
    # partial iterate, exactly like the whole-batch path did pre-compaction
    for i in range(B):
        assert int(res.status[i]) in (0, 1)
        assert int(res.ipm_iters[i]) <= 2 or int(res.status[i]) == 1


def test_mu_stop_and_init_state_resume(rng):
    """mu_stop exits the outer loop at the phase boundary with status 0;
    resuming via init_state finishes the solve with accumulated
    iteration counters."""
    import jax.numpy as jnp

    from abip_tpu.parallel.batched import device_solve_lp
    from tests.conftest import random_lp

    A, b, c = random_lp(np.random.default_rng(11), 15, 45)
    A, b, c = jnp.asarray(A), jnp.asarray(b), jnp.asarray(c)
    kw = dict(eps=1e-6, precision="mixed", solver="inverse",
              qres_period=64, probe_period=8, cadence="chunk")
    r1 = device_solve_lp(A, b, c, mu_stop=1e-3, **kw)
    assert int(r1.status) == 0
    assert float(r1.mu) < 1e-3
    assert int(r1.admm_iters) > 0
    r2 = device_solve_lp(
        A, b, c,
        init_state=(r1.u_raw, r1.v_raw, r1.mu, r1.admm_iters,
                    r1.ipm_iters, r1.status), **kw)
    assert int(r2.status) == 1
    assert int(r2.admm_iters) > int(r1.admm_iters)
    assert float(r2.rel_gap) < 1.05e-6
