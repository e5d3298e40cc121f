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
