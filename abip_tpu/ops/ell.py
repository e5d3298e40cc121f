"""ELL (padded-row) sparse format for scattered sparsity.

BCSR (8,128) tiles suit block-structured sparsity; for SCATTERED patterns
(e.g. graph Laplacians / PageRank LPs with ~10 nnz/row) each tile holds
O(1) nonzeros and the padding explodes.  ELL stores exactly `K` =
max-nnz-per-row entries per row:

    data (n_rows, K), cols (n_rows, K)     y[i] = sum_k data[i,k]*x[cols[i,k]]

The matvec is one gather + one multiply-reduce -- bandwidth-proportional
to nnz (padded to K), vectorizing cleanly on VPU lanes.
`LinearOperator.from_scipy_sparse` picks ELL automatically when BCSR tile
fill is poor.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ELLMatrix:
    data: jnp.ndarray    # (m, K)
    cols: jnp.ndarray    # (m, K) int32; padded entries point at col 0 with 0 data
    shape: tuple
    nnz: int

    def tree_flatten(self):
        return (self.data, self.cols), (self.shape, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, cols = children
        shape, nnz = aux
        return cls(data=data, cols=cols, shape=shape, nnz=nnz)

    @classmethod
    def from_scipy(cls, A, dtype=jnp.float64) -> "ELLMatrix":
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        m, n = A.shape
        counts = np.diff(A.indptr)
        K = max(1, int(counts.max()) if len(counts) else 1)
        data = np.zeros((m, K))
        cols = np.zeros((m, K), np.int32)
        for i in range(m):
            lo, hi = A.indptr[i], A.indptr[i + 1]
            k = hi - lo
            data[i, :k] = A.data[lo:hi]
            cols[i, :k] = A.indices[lo:hi]
        return cls(data=jnp.asarray(data, dtype), cols=jnp.asarray(cols),
                   shape=(m, n), nnz=int(A.nnz))

    @property
    def fill(self) -> float:
        m, K = self.data.shape
        return self.nnz / max(1, m * K)


@jax.jit
def ell_matvec(A: ELLMatrix, x):
    """y = A @ x via gather + row reduction."""
    gathered = x[A.cols]                     # (m, K)
    return jnp.sum(A.data * gathered.astype(A.data.dtype), axis=1)
