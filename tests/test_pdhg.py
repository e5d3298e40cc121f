"""Restarted-PDHG competitor solver: golden-oracle and integration tests.

Covers the native analogue of the reference's external PDLP driver
(`/root/reference/scripts/bench-lp/pdlp_solve.py`): objective parity with
scipy linprog (HiGHS), KKT quality of the returned triple, and the MPS
suite-runner integration (`solve_mps(method="pdhg")`).
"""
import numpy as np
import pytest
from scipy.optimize import linprog

from abip_tpu.pdhg import estimate_spectral_norm, solve_lp_pdhg


def random_lp(seed, m, n):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    b = A @ (rng.random(n) + 0.5)
    c = A.T @ rng.standard_normal(m) + rng.random(n) + 0.5
    return A, b, c


@pytest.mark.parametrize("seed,m,n", [(3, 30, 90), (0, 50, 200),
                                      (11, 40, 400)])
def test_pdhg_matches_scipy(seed, m, n):
    A, b, c = random_lp(seed, m, n)
    sol = solve_lp_pdhg(A, b, c, eps=1e-6)
    ref = linprog(c, A_eq=A, b_eq=b, bounds=(0, None), method="highs")
    assert sol.status_name == "Solved"
    assert abs(sol.pobj - ref.fun) / max(1.0, abs(ref.fun)) < 1e-4


def test_pdhg_kkt_quality():
    A, b, c = random_lp(5, 25, 80)
    sol = solve_lp_pdhg(A, b, c, eps=1e-7)
    # primal feasibility
    assert np.linalg.norm(A @ sol.x - b) / (1 + np.linalg.norm(b)) < 1e-6
    assert sol.x.min() > -1e-9
    # dual feasibility: s = c - A'y >= 0 (up to tolerance)
    assert sol.s.min() > -1e-5
    # reported residuals consistent with the eps contract
    assert sol.res_pri < 1e-7 and sol.res_dual < 1e-7 and sol.rel_gap < 1e-7
    # the reported residuals must belong to the RETURNED iterate (the
    # convergence-forces-restart rule): recomputing pres from sol.x
    # reproduces res_pri exactly
    recomputed = np.linalg.norm(A @ sol.x - b) / (1 + np.linalg.norm(b))
    assert recomputed == pytest.approx(sol.res_pri, rel=1e-10)


def test_spectral_norm_estimate():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((40, 60))
    est = float(estimate_spectral_norm(np.asarray(A)))
    true = np.linalg.norm(A, 2)
    # power iteration converges from below; the 0.9 stepsize margin in
    # solve_lp_pdhg absorbs up to 10% underestimate
    assert est <= true * (1 + 1e-9)
    assert (true - est) / true < 0.05


def test_pdhg_via_mps(tmp_path):
    import scipy.sparse as sp

    from abip_tpu.io.mps import GeneralLP
    from abip_tpu.io.mps_write import write_mps
    from abip_tpu.io.presolve import solve_mps

    A, b, c = random_lp(9, 12, 30)
    m, n = A.shape
    p = GeneralLP(c=c, A=sp.csc_matrix(A), row_lo=b, row_hi=b,
                  lb=np.zeros(n), ub=np.full(n, np.inf))
    path = tmp_path / "pd.mps"
    write_mps(p, str(path))
    sol, _ = solve_mps(str(path), method="pdhg", eps=1e-6)
    ref = linprog(c, A_eq=A, b_eq=b, bounds=(0, None), method="highs")
    assert sol.status_name == "Solved"
    assert abs(sol.pobj - ref.fun) / max(1.0, abs(ref.fun)) < 1e-4


def test_pdhg_mixed_precision_trajectory():
    """Anchored f32-delta matvecs reproduce the f64 trajectory: same
    iteration count and the same (eps-consistent) solution."""
    A, b, c = random_lp(0, 50, 200)
    s64 = solve_lp_pdhg(A, b, c, eps=1e-6, precision="f64")
    smx = solve_lp_pdhg(A, b, c, eps=1e-6, precision="mixed")
    assert smx.status_name == "Solved"
    assert smx.admm_iters == s64.admm_iters
    assert abs(smx.pobj - s64.pobj) < 1e-6 * (1 + abs(s64.pobj))

    with pytest.raises(ValueError):
        solve_lp_pdhg(A, b, c, precision="f32")


@pytest.mark.parametrize("seed", [0, 1])
def test_pdhg_detects_infeasible(seed):
    from benchmarks.generate import infeasible_lp

    A, b, c = infeasible_lp(seed=seed)
    sol = solve_lp_pdhg(A, b, c, eps=1e-6, max_iters=100_000)
    assert sol.status_name == "Infeasible"
    assert sol.res_infeas < 1e-7


@pytest.mark.parametrize("seed", [0, 1])
def test_pdhg_detects_unbounded(seed):
    from benchmarks.generate import unbounded_lp

    A, b, c = unbounded_lp(seed=seed)
    sol = solve_lp_pdhg(A, b, c, eps=1e-6, max_iters=100_000)
    assert sol.status_name == "Unbounded"
    assert sol.res_unbdd < 1e-7


def test_pdhg_batch_matches_single_and_shards():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from abip_tpu.pdhg import solve_lp_pdhg_batch

    B, m, n = 4, 15, 45
    rng = np.random.default_rng(1)
    As, bs, cs = [], [], []
    for _ in range(B):
        A, b, c = (lambda A, x0: (A, A @ x0,
                                  A.T @ rng.standard_normal(m)
                                  + rng.random(n) + 0.5))(
            rng.standard_normal((m, n)), rng.random(n) + 0.5)
        As.append(A), bs.append(b), cs.append(c)
    As, bs, cs = map(np.stack, (As, bs, cs))

    st = solve_lp_pdhg_batch(As, bs, cs, eps=1e-6)
    assert (np.asarray(st.status) == 1).all()

    mesh = Mesh(np.array(jax.devices()[:4]), ("batch",))
    st2 = solve_lp_pdhg_batch(As, bs, cs, eps=1e-6, mesh=mesh)
    # sharded compilation may reorder reductions; agreement to 1e-8 is
    # the contract (both solve the same instance to eps=1e-6)
    np.testing.assert_allclose(np.asarray(st.pobj), np.asarray(st2.pobj),
                               rtol=1e-8)

    s0 = solve_lp_pdhg(As[0], bs[0], cs[0], eps=1e-6, precision="mixed")
    assert abs(float(np.asarray(st.pobj)[0]) - s0.pobj) < 1e-9
