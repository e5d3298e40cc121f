"""Anchored-delta endgame engine (`ops/admm_delta.py`).

The delta engine must reproduce the f64 steps-engine trajectory at
chunk granularity (same iteration counts, same solutions) while doing
all per-iteration work in f32 -- the correctness bar for replacing the
phase-2 endgame of the TPU sprint2 driver.  Reference hot loop:
`/root/reference/src/abip-lp/src/abip.c:2131-2215`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from abip_tpu import hsd
from abip_tpu.ops.admm_delta import run_delta_chunk
from abip_tpu.parallel.batched import device_solve_lp, solve_lp_batch

f64 = jnp.float64


def _smoke_lp(m=40, n=300, seed=0):
    rng = np.random.default_rng(seed)
    Ar = rng.standard_normal((m, n - m))
    A = np.concatenate([Ar, np.eye(m)], axis=1)
    x0 = rng.random(n) + 0.5
    y0 = rng.standard_normal(m)
    s0 = rng.random(n) + 0.5
    return A, A @ x0, A.T @ y0 + s0


def _setup(A, b, c, rho_y=1e-3):
    A = jnp.asarray(A, f64)
    b = jnp.asarray(b, f64)
    c = jnp.asarray(c, f64)
    m, n = A.shape
    N64 = rho_y * jnp.eye(m, dtype=f64) + A @ A.T
    chol = jax.lax.linalg.cholesky(N64)
    solve64 = lambda r: jax.scipy.linalg.cho_solve((chol, True), r)  # noqa: E731
    h = jnp.concatenate([-b, c])
    g_y = solve64(h[:m] + A @ h[m:])
    g_x = A.T @ g_y - h[m:]
    g = jnp.concatenate([g_y, -g_x])
    return A, b, c, solve64, h, g, jnp.dot(h, g), rho_y


def _absolute_step(A, solve64, h, g, g_th, rho_y, u, v, mu, alpha=1.8):
    m, n = A.shape
    l = m + n + 1
    r = u + v
    q = jnp.concatenate([rho_y * r[:m], r[m:m + n]])
    q = q - r[l - 1] * h
    q = q - (jnp.dot(q, g) / (g_th + 1.0)) * h
    wx = -q[m:]
    z_y = solve64(q[:m] + A @ wx)
    z_x = A.T @ z_y - wx
    tau_t = r[l - 1] + jnp.dot(z_y, h[:m]) + jnp.dot(z_x, h[m:])
    u_t = jnp.concatenate([z_y, z_x, tau_t[None]])
    return hsd.admm_update(u, v, u, u_t, mu, alpha, m)


def test_delta_chunk_matches_f64_trajectory():
    """T f32 delta iterations track T absolute f64 iterations to a
    small fraction of the iterate movement, and the stage-average
    accumulators agree."""
    A, b, c = _smoke_lp(seed=1)
    A, b, c, solve64, h, g, g_th, rho_y = _setup(A, b, c)
    m, n = A.shape
    l = m + n + 1
    u = jnp.concatenate([jnp.zeros((m,), f64), jnp.ones((l - m,), f64)])
    v = u
    for mu in (1.0, 1e-2, 1e-4):
        for _ in range(400):
            u, v = _absolute_step(A, solve64, h, g, g_th, rho_y, u, v, mu)
    mu, T = 1e-5, 192
    ua, va = u, v
    usum = jnp.zeros((l,), f64)
    vsum = jnp.zeros((l,), f64)
    for _ in range(T):
        ua, va = _absolute_step(A, solve64, h, g, g_th, rho_y, ua, va, mu)
        usum = usum + ua
        vsum = vsum + va
    res = run_delta_chunk(A, solve64, h, g, g_th, rho_y, mu, 1.8, 0.0,
                          u, v, jnp.zeros((l,), f64), jnp.zeros((l,), f64),
                          jnp.zeros((), jnp.int32), jnp.inf,
                          T=T, probe=8, use_pallas=False)
    assert int(res.t_done) == T
    movement = float(jnp.linalg.norm(ua - u)) + 1e-12
    err = float(jnp.abs(res.u - ua).max())
    assert err < 1e-4 * max(movement, 1.0), (err, movement)
    assert float(jnp.abs(res.v - va).max()) < 1e-4 * max(movement, 1.0)
    # accumulators track the running sums (straggler-fix invariant)
    rel = float(jnp.abs(res.u_sum - usum).max()) / (
        float(jnp.abs(usum).max()) + 1e-12)
    assert rel < 1e-6, rel


def test_delta_chunk_converged_lane_runs_zero_trips():
    """A lane whose entry qres already beats the threshold must not
    iterate (the vmapped endgame relies on this for lane idling)."""
    A, b, c = _smoke_lp(seed=2)
    A, b, c, solve64, h, g, g_th, rho_y = _setup(A, b, c)
    m, n = A.shape
    l = m + n + 1
    u = jnp.concatenate([jnp.zeros((m,), f64), jnp.ones((l - m,), f64)])
    v = u
    res = run_delta_chunk(A, solve64, h, g, g_th, rho_y, 1e-5, 1.8, 1e3,
                          u, v, jnp.zeros((l,), f64), jnp.zeros((l,), f64),
                          jnp.zeros((), jnp.int32), 1e-9,
                          T=256, probe=8, use_pallas=False)
    assert int(res.t_done) == 0
    np.testing.assert_array_equal(np.asarray(res.u), np.asarray(u))


@pytest.mark.parametrize("eps", [1e-6, 1e-8])
def test_delta_engine_full_solve_matches_steps(eps):
    """Full driver with engine='delta': same status and near-identical
    ADMM counts as the f64-authority steps engine, solution matches."""
    from bench import reference_smoke_lp

    A, b, c = reference_smoke_lp(m=30, n_rand=400, seed=11)
    kw = dict(eps=eps, max_ipm=200, max_admm=400_000, solver="inverse",
              qres_period=768, avg_period=20, precision="mixed",
              cadence="chunk")
    rs = device_solve_lp(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                         engine="steps", **kw)
    rd = device_solve_lp(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                         engine="delta", **kw)
    assert int(rs.status) == 1 and int(rd.status) == 1
    # trajectory parity: counts within 5% (chunk-granular check points)
    ks, kd = int(rs.admm_iters), int(rd.admm_iters)
    assert abs(ks - kd) <= max(0.05 * ks, 2 * 768), (ks, kd)
    assert float(rd.rel_gap) < 1.05 * eps
    assert abs(float(rs.pobj) - float(rd.pobj)) < 1e-4 * (
        1 + abs(float(rs.pobj)))


def test_sprint2_delta_endgame_batched():
    """sprint2 with endgame='delta' solves the batch to the same counts
    as endgame='steps' and matches the scipy oracle."""
    from scipy.optimize import linprog

    from bench import reference_smoke_lp

    data = [reference_smoke_lp(m=25, n_rand=300, seed=50 + i)
            for i in range(3)]
    batch = tuple(map(np.stack, zip(*data)))
    kw = dict(eps=1e-6, max_ipm=200, max_admm=200_000, solver="inverse",
              qres_period=768, avg_period=20, precision="mixed",
              engine="sprint2", sprint_T=32, sprint_mu_switch=1e-4)
    r_s = solve_lp_batch(*batch, endgame="steps", **kw)
    r_d = solve_lp_batch(*batch, endgame="delta", **kw)
    assert (np.asarray(r_d.status) == 1).all()
    np.testing.assert_allclose(np.asarray(r_d.admm_iters),
                               np.asarray(r_s.admm_iters), rtol=0.05)
    for i, (A, b, c) in enumerate(data):
        ref = linprog(c, A_eq=A, b_eq=b, bounds=(0, None),
                      method="highs")
        assert ref.status == 0
        assert abs(float(r_d.pobj[i]) - ref.fun) < 1e-5 * (1 + abs(ref.fun))


def test_delta_kernel_interpret_matches_ref():
    """Pallas kernel (interpret mode) vs the XLA fallback: identical
    math on the same operand set."""
    from abip_tpu.ops.admm_delta import (_delta_op, _delta_ref,
                                         delta_anchor)

    A, b, c = _smoke_lp(m=16, n=140, seed=5)
    A, b, c, solve64, h, g, g_th, rho_y = _setup(A, b, c)
    m, n = A.shape
    l = m + n + 1
    u = jnp.concatenate([jnp.zeros((m,), f64), jnp.ones((l - m,), f64)])
    v = u
    for mu in (1.0, 1e-2, 1e-4):
        for _ in range(200):
            u, v = _absolute_step(A, solve64, h, g, g_th, rho_y, u, v, mu)
    anc = delta_anchor(A, solve64, h, g, g_th, rho_y, 1e-5, 1.8, 0.0,
                       u, v, jnp.zeros((l,), f64), jnp.zeros((l,), f64),
                       jnp.zeros((), jnp.int32), jnp.inf)
    ref = _delta_ref(anc, T=64, probe=8)
    ker = _delta_op(64, 8, True)(*anc)
    for a, bb in zip(ref, ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("engine", ["steps", "delta"])
def test_delta_engine_certificates(engine):
    """Infeasible/unbounded detection must survive the engine swap
    (`abip.c:1565-1576` certificate classification)."""
    kw = dict(eps=1e-6, max_ipm=200, max_admm=200_000, solver="inverse",
              qres_period=768, avg_period=20, precision="mixed",
              cadence="chunk", engine=engine)
    A = jnp.asarray([[1.0, 1.0], [1.0, 1.0]])
    r = device_solve_lp(A, jnp.asarray([1.0, 3.0]),
                        jnp.asarray([1.0, 1.0]), **kw)
    assert int(r.status) == -2          # infeasible
    A2 = jnp.asarray([[1.0, -1.0]])
    r2 = device_solve_lp(A2, jnp.asarray([0.0]),
                         jnp.asarray([-1.0, 0.0]), **kw)
    assert int(r2.status) == -1         # unbounded
