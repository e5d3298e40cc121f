"""Conic-driver robustness parity with the LP driver (VERDICT round 1 #6):
warm start, checkpoint/resume, SIGINT best-effort exit, update_problem
factor reuse, and max_time stage-interior enforcement."""
import os
import signal
import threading
import time

import numpy as np
import pytest
from scipy.optimize import linprog

import abip_tpu
from abip_tpu import ConeSpec
from abip_tpu.qcp import ConicWorkspace, conic_defaults
from abip_tpu.utils.checkpoint import ConicCheckpoint
from tests.conftest import random_lp


def socp_instance(rng, k=4):
    """min t s.t. x = a, (t, x) in SOC -> t* = ||a||."""
    a = rng.standard_normal(k)
    n = k + 1
    A = np.zeros((k, n))
    A[:, 1:] = np.eye(k)
    c = np.zeros(n)
    c[0] = 1.0
    return A, a, c, np.linalg.norm(a)


def test_conic_warm_start(rng):
    A, b, c = random_lp(rng, 15, 40)
    ref = linprog(c, A_eq=A, b_eq=b, bounds=(0, None), method="highs").fun
    w = ConicWorkspace(A, b, c, ConeSpec.lp(40),
                       settings=conic_defaults(eps=1e-5))
    cold = w.solve()
    assert cold.status_name.startswith("Solved")
    # re-solve warm from the cold optimum: must converge in fewer ADMM iters
    w2 = ConicWorkspace(A, b, c, ConeSpec.lp(40),
                        settings=conic_defaults(eps=1e-5))
    hot = w2.solve(warm=(cold.x, cold.y, cold.s))
    assert hot.status_name.startswith("Solved")
    assert hot.pobj == pytest.approx(ref, abs=1e-3 * (1 + abs(ref)))
    assert hot.admm_iters < cold.admm_iters


def test_conic_warm_start_soc(rng):
    A, b, c, ref = socp_instance(rng)
    s = conic_defaults(eps=1e-6)
    cold = ConicWorkspace(A, b, c, ConeSpec(soc=(5,)), settings=s).solve()
    hot = ConicWorkspace(A, b, c, ConeSpec(soc=(5,)), settings=s).solve(
        warm=(cold.x, cold.y, cold.s))
    assert hot.status_name.startswith("Solved")
    assert hot.pobj == pytest.approx(ref, abs=1e-3)
    # the SOC optimum sits ON the cone boundary, so the interiorized warm
    # point cannot beat the centered cold start on this tiny instance --
    # require correctness and no blow-up rather than strict savings
    assert hot.admm_iters <= cold.admm_iters + 20


def test_conic_checkpoint_resume(rng, tmp_path):
    A, b, c = random_lp(rng, 12, 40)
    ref = linprog(c, A_eq=A, b_eq=b, bounds=(0, None), method="highs").fun
    ck = str(tmp_path / "cstate")

    s1 = conic_defaults(eps=1e-6, max_ipm_iters=3)
    w1 = ConicWorkspace(A, b, c, ConeSpec.lp(40), settings=s1)
    w1.solve(checkpoint_path=ck, checkpoint_every=1)

    state = ConicCheckpoint.load(ck)
    assert state.ipm_iters >= 1
    w2 = ConicWorkspace(A, b, c, ConeSpec.lp(40),
                        settings=conic_defaults(eps=1e-6))
    done = w2.solve(resume=state)
    assert done.status_name.startswith("Solved")
    assert done.pobj == pytest.approx(ref, abs=1e-3 * (1 + abs(ref)))


def test_conic_update_problem(rng):
    A, b, c = random_lp(rng, 12, 40)
    w = ConicWorkspace(A, b, c, ConeSpec.lp(40),
                       settings=conic_defaults(eps=1e-5))
    s1 = w.solve()
    assert s1.status_name.startswith("Solved")
    # new feasible b, c for the SAME A
    rng2 = np.random.default_rng(123)
    b2 = A @ (rng2.random(40) + 0.5)
    c2 = A.T @ rng2.standard_normal(12) + rng2.random(40) + 0.5
    ref2 = linprog(c2, A_eq=A, b_eq=b2, bounds=(0, None),
                   method="highs").fun
    s2 = w.update_problem(b2, c2).solve()
    assert s2.status_name.startswith("Solved")
    assert s2.pobj == pytest.approx(ref2, abs=1e-3 * (1 + abs(ref2)))


def test_conic_sigint_best_effort(rng):
    A, b, c = random_lp(rng, 20, 80)
    s = conic_defaults(eps=1e-18, inner_check_period=10)
    # warmup with identical settings so the timed run iterates immediately
    ConicWorkspace(A, b, c, ConeSpec.lp(80),
                   settings=conic_defaults(
                       eps=1e-18, inner_check_period=10,
                       max_ipm_iters=1, max_admm_iters=5)).solve()
    w = ConicWorkspace(A, b, c, ConeSpec.lp(80), settings=s)
    threading.Timer(
        1.5, lambda: os.kill(os.getpid(), signal.SIGINT)).start()
    sol = w.solve()
    assert sol.status == abip_tpu.Status.SIGINT
    assert sol.status_name == "Interrupted"
    assert np.isfinite(sol.x).all()


def test_conic_max_time_inside_stage(rng):
    """max_time must interrupt a long barrier stage, not only stage
    boundaries (reference checks time inline, `source/abip.c:1152`)."""
    A, b, c = random_lp(rng, 20, 80)
    s = conic_defaults(eps=1e-18, max_time=1.0, inner_check_period=10,
                       max_ipm_iters=5)
    # warmup compile so the timed solve measures iteration, not compile
    ConicWorkspace(A, b, c, ConeSpec.lp(80),
                   settings=conic_defaults(
                       eps=1e-18, max_time=1.0, inner_check_period=10,
                       max_ipm_iters=1, max_admm_iters=5)).solve()
    w = ConicWorkspace(A, b, c, ConeSpec.lp(80), settings=s)
    t0 = time.perf_counter()
    sol = w.solve()
    wall = time.perf_counter() - t0
    assert wall < 30.0, f"max_time=1.0 not enforced (took {wall:.1f}s)"
    # a timed-out solve reports best effort (Solved/Inaccurate), never NaN
    assert np.isfinite(sol.x).all()


def test_device_route_full_Q(rng):
    """The device conic route accepts a FULL (n, n) Q (primal Schur
    form) and matches the host driver on LP-cone and SOC-mixed QPs."""
    import jax.numpy as jnp

    from abip_tpu import ConeSpec
    from abip_tpu.parallel.batched_qcp import solve_qcp_batch, solve_qcp_device
    from abip_tpu.qcp import solve_qcp

    m, n = 8, 20
    A = rng.standard_normal((m, n))
    b = A @ (rng.random(n) + 0.5)
    M = rng.standard_normal((n, n))
    Q = M @ M.T + 0.5 * np.eye(n)
    c = rng.standard_normal(n)
    kw = dict(eps=1e-7, precision="mixed", normalize=True, rho_y=1e-3,
              solver="inverse", inner_crit_period=8, max_admm=1_000_000)
    for cones in (ConeSpec.lp(n), ConeSpec(soc=(5,), nonneg=15)):
        host = solve_qcp(A, b, c, cones, Q=Q, eps=1e-7)
        dev = solve_qcp_device(jnp.asarray(A), jnp.asarray(b),
                               jnp.asarray(c), jnp.asarray(Q),
                               cones=cones, **kw)
        assert int(dev.status) == 1
        assert abs(float(dev.pobj) - host.pobj) / (1 + abs(host.pobj)) < 1e-5

    # batched full Qs: (B, n, n)
    B = 3
    As = np.stack([A] * B)
    bs = np.stack([b * (1 + 0.01 * k) for k in range(B)])
    cs = np.stack([c] * B)
    Qs = np.stack([Q] * B)
    rb = solve_qcp_batch(jnp.asarray(As), jnp.asarray(bs), jnp.asarray(cs),
                         jnp.asarray(Qs), cones=ConeSpec.lp(n), **kw)
    assert all(int(s) == 1 for s in np.asarray(rb.status))
    host0 = solve_qcp(A, bs[0], c, ConeSpec.lp(n), Q=Q, eps=1e-7)
    assert abs(float(np.asarray(rb.pobj)[0]) - host0.pobj) / (
        1 + abs(host0.pobj)) < 1e-5

    # Woodbury + full Q is rejected with guidance
    import pytest as _pytest
    with _pytest.raises(ValueError, match="diagonal"):
        solve_qcp_device(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                         jnp.asarray(Q), cones=ConeSpec.lp(n),
                         form="woodbury", **kw)
