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
