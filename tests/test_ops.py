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
