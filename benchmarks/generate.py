"""Benchmark instance generators.

Mirrors the reference's generators: the install-test random LP
(`test/test_abip_install.m:7-21`), the Hilbert LP
(`scripts/bench-lp/generate_hilbert.jl`), and the LASSO/SVM simulation
data (`scripts/bench-qcp/get_lasso_simu_data.m`, `test_svm.m`).
"""
from __future__ import annotations

import numpy as np


def smoke_lp(m=50, n_rand=1950, density=0.3, seed=0):
    """A = [sprand, I], b = A x0, c = A'y0 + s0 -- always solvable."""
    rng = np.random.default_rng(seed)
    Ar = rng.standard_normal((m, n_rand)) * (rng.random((m, n_rand)) < density)
    A = np.concatenate([Ar, np.eye(m)], axis=1)
    n = n_rand + m
    b = A @ (rng.random(n) + 0.5)
    c = A.T @ rng.standard_normal(m) + rng.random(n) + 0.5
    return A, b, c


def hilbert_lp(n=1000, shift=1.0, seed=1):
    """min c'x s.t. H x - s = b, x,s >= 0 with H = Hilbert(n) + shift*I --
    an ill-conditioned LP family (`generate_hilbert.jl`)."""
    rng = np.random.default_rng(seed)
    i = np.arange(n)
    H = 1.0 / (i[:, None] + i[None, :] + 1.0) + shift * np.eye(n)
    # standard form: [H, -I] [x; s] = b
    A = np.concatenate([H, -np.eye(n)], axis=1)
    b = rng.random(n)
    c = np.concatenate([rng.random(n), np.zeros(n)])
    return A, b, c


def lasso_instance(m=1000, n=5000, sparsity=0.1, noise=0.1, seed=0):
    """X, y, lam for the LASSO sweeps (`test_lasso.m:36-120` protocol:
    lam = 0.1 * ||X'y||_inf)."""
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((m, n)) / np.sqrt(m)
    k = max(1, int(sparsity * n))
    w = np.zeros(n)
    w[rng.choice(n, k, replace=False)] = rng.standard_normal(k)
    y = X @ w + noise * rng.standard_normal(m)
    lam = 0.1 * np.abs(X.T @ y).max()
    return X, y, lam


def svm_instance(m=500, n=50, margin=1.0, seed=0):
    """Linearly-separable-ish labeled data for the SVM benchmarks."""
    rng = np.random.default_rng(seed)
    w = rng.standard_normal(n)
    w /= np.linalg.norm(w)
    X = rng.standard_normal((m, n))
    y = np.sign(X @ w + margin * 0.1 * rng.standard_normal(m))
    y[y == 0] = 1.0
    return X, y


def infeasible_lp(m=20, n=60, seed=0):
    """Standard-form LP that is infeasible by a Farkas certificate:
    construct y with A'y <= -margin and b'y = 1 > 0, so {x>=0: Ax=b} = {}.
    Used by the parity/status tests (reference classifies via res_infeas,
    `abip.c:1565-1576`)."""
    rng = np.random.default_rng(seed)
    y = rng.standard_normal(m)
    y /= np.linalg.norm(y)
    A = rng.standard_normal((m, n))
    margin = 0.1
    viol = A.T @ y + margin          # want A'y <= -margin
    A = A - np.outer(y, np.maximum(viol, 0.0))
    b = y.copy()                     # b'y = 1 > 0
    c = rng.random(n) + 0.5
    assert (A.T @ y <= -margin + 1e-9).all() and b @ y > 0
    return A, b, c


def unbounded_lp(m=20, n=60, seed=0):
    """Standard-form LP unbounded below: a ray d >= 0 with Ad = 0 and
    c'd < 0 is built in."""
    rng = np.random.default_rng(seed)
    d = rng.random(n) + 0.1          # strictly positive ray
    A = rng.standard_normal((m, n))
    A = A - np.outer(A @ d, d) / (d @ d)     # Ad = 0
    x0 = rng.random(n) + 0.5
    b = A @ x0                        # feasible
    c = rng.standard_normal(n)
    c = c - ((c @ d) + 1.0) * d / (d @ d)    # c'd = -1 < 0
    assert abs(c @ d + 1.0) < 1e-9 and np.abs(A @ d).max() < 1e-9
    return A, b, c


def degenerate_lp(m=30, n=120, basis_deficit=3, dual_ties=5, seed=0):
    """LP with a DEGENERATE optimal vertex, primal and dual.

    What Netlib actually stresses (round-3 verdict item 7): the benign
    random classes draw strictly-complementary optima, but real suites
    have optimal vertices where (a) fewer than m basic variables are
    nonzero (primal degeneracy) and (b) reduced costs vanish on nonbasic
    columns (dual degeneracy -> non-unique optima).  Construction: pick
    an optimal pair by complementarity, then force `basis_deficit` of
    the m "basic" slots to x=0 AND s=0, and zero the reduced cost on
    `dual_ties` extra nonbasic columns.  b = A x0 and c = A'y0 + s0
    keep the pair optimal; the ties are exact, not perturbed."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    # optimal primal support: m - basis_deficit strictly positive entries
    support = rng.choice(n, m - basis_deficit, replace=False)
    x0 = np.zeros(n)
    x0[support] = rng.random(m - basis_deficit) + 0.5
    y0 = rng.standard_normal(m)
    s0 = rng.random(n) + 0.5
    s0[support] = 0.0                       # complementarity on the support
    # dual degeneracy: zero reduced cost on extra columns with x0 = 0
    off = np.setdiff1d(np.arange(n), support)
    ties = rng.choice(off, min(dual_ties, off.size), replace=False)
    s0[ties] = 0.0
    b = A @ x0
    c = A.T @ y0 + s0
    return A, b, c


def illscaled_lp(m=30, n=120, spread=1e6, density=0.5, seed=0):
    """Well-posed LP hidden under a ~`spread` row/column scaling range.

    Netlib's bad-scaling pathology (`conf/netlib.json` tolerances down
    to 1e-8 exist to expose exactly this): draw a benign primal-dual
    pair, then scale rows and columns log-uniformly over
    [1/sqrt(spread), sqrt(spread)] -- the scaled data spans ~spread in
    magnitude while staying exactly solvable (A<-RAC, b<-Rb, c<-Cc maps
    the optimum through x* <- C^-1 x0).  Equilibration (scaling.py)
    must undo this or the fixed-rho ADMM stalls."""
    rng = np.random.default_rng(seed)
    Ar = rng.standard_normal((m, n - m)) * (rng.random((m, n - m)) < density)
    A = np.concatenate([Ar, np.eye(m)], axis=1)
    x0 = rng.random(n) + 0.5
    y0 = rng.standard_normal(m)
    s0 = rng.random(n) + 0.5
    # row and column factors each span spread^(1/2), so the COMBINED
    # element magnitude range is ~spread
    q = np.log10(spread) / 4.0
    R = 10.0 ** rng.uniform(-q, q, m)
    C = 10.0 ** rng.uniform(-q, q, n)
    A0T_y0 = np.concatenate([Ar.T @ y0, y0])
    A = R[:, None] * A * C[None, :]
    b = A @ (x0 / C)                  # = R (A0 x0): feasible by construction
    c = C * (A0T_y0 + s0)             # dual slack C*s0 >= 0 at y = y0/R
    return A, b, c


def near_rankdef_lp(m=30, n=120, dep_rows=3, perturb=1e-8, seed=0):
    """LP whose last `dep_rows` rows are near-exact linear combinations
    of the others (distance ~`perturb`): numerically rank-deficient A.

    Netlib's rank-deficiency pathology: the normal matrix rho I + AA'
    has dep_rows eigenvalues ~ rho + perturb^2, so the KKT solve is as
    ill-conditioned as the regularization allows, and the duplicated
    constraints make the dual non-unique.  b is built from a primal
    point x0 so the system stays CONSISTENT (feasible, bounded)."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    W = rng.standard_normal((dep_rows, m - dep_rows))
    A[m - dep_rows:] = W @ A[: m - dep_rows] \
        + perturb * rng.standard_normal((dep_rows, n))
    x0 = rng.random(n) + 0.5
    y0 = rng.standard_normal(m)
    s0 = rng.random(n) + 0.5
    b = A @ x0
    c = A.T @ y0 + s0
    return A, b, c


def pagerank_lp(n=20000, deg=6, alpha=0.85, seed=0):
    """PageRank as a standard-form LP over a random power-law-ish digraph.

    The reference's fourth LP suite builds these from SuiteSparse graph
    matrices (`scripts/README.md:38-39`, `conf/pagerank.json`); with no
    network in this environment we generate the graph: each node links to
    `deg` uniform random targets, P is the row-normalized adjacency, and

        min 1'x   s.t.  (I - alpha P') x = ((1-alpha)/n) 1,   x >= 0.

    (I - alpha P') is a nonsingular M-matrix, so the equality system has
    the unique solution x* = the PageRank vector (elementwise >= 0): the
    LP is feasibility-tight and its optimum is 1'x* = 1 exactly.  Returns
    (A_csr, b, c); A is sparse (nnz ~ n*(deg+1)) -- the CG/scattered-
    sparsity path, not the dense Cholesky path.
    """
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, n * deg)
    P = sp.csr_matrix((np.ones(n * deg), (rows, cols)), shape=(n, n))
    P = sp.diags(1.0 / np.maximum(np.asarray(P.sum(axis=1)).ravel(), 1)) @ P
    A = (sp.eye(n) - alpha * P.T).tocsr()
    b = (1.0 - alpha) / n * np.ones(n)
    c = np.ones(n)
    return A, b, c
