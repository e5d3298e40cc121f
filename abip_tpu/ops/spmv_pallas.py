"""Block-sparse (BCSR) matrix-vector product as a Pallas TPU kernel.

TPU-native replacement for the reference's CSC SpMV kernels
(`_accum_by_A` / `_accum_by_Atrans`, `src/abip-lp/linsys/common.c:598-695`):
scalar gather/scatter loops become dense (BR, BC) tile matmuls.  The host
packs a scipy sparse matrix into padded block rows once at setup
(`BCSRMatrix.from_scipy`); the kernel walks each block row's tiles with a
scalar-prefetched column-index array and accumulates `tile @ x[cols]` on
the MXU.

Tiles default to (8, 128) -- the f32 minimum tile -- and the row/column
dims are zero-padded up to multiples, so arbitrary shapes work.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BR = 8     # block rows  (sublane)
BC = 128   # block cols  (lane)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BCSRMatrix:
    """Padded block-compressed sparse rows.

    data:  (n_block_rows, max_blocks, BR, BC) tile values (zero-padded)
    cols:  (n_block_rows, max_blocks) int32 block-column ids (0 for pads;
           padded tiles are all-zero so they contribute nothing)
    shape: logical (m, n)
    """

    data: jnp.ndarray
    cols: jnp.ndarray
    shape: tuple
    nnz: int

    def tree_flatten(self):
        return (self.data, self.cols), (self.shape, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, cols = children
        shape, nnz = aux
        return cls(data=data, cols=cols, shape=shape, nnz=nnz)

    @property
    def padded_shape(self):
        return (self.data.shape[0] * BR, None)

    @classmethod
    def from_scipy(cls, A, dtype=jnp.float32) -> "BCSRMatrix":
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        m, n = A.shape
        nbr = -(-m // BR)
        nbc = -(-n // BC)
        m_pad, n_pad = nbr * BR, nbc * BC
        Ap = sp.csr_matrix((A.data, A.indices, A.indptr), shape=(m, n))
        Ap = sp.vstack([Ap, sp.csr_matrix((m_pad - m, n))]).tocsc()
        Ap = sp.hstack([Ap, sp.csc_matrix((m_pad, n_pad - n))]).tocsr()

        # find nonempty (block_row, block_col) tiles
        coo = Ap.tocoo()
        br = coo.row // BR
        bc = coo.col // BC
        tiles = {}
        for r, c, i, j, v in zip(br, bc, coo.row, coo.col, coo.data):
            key = (int(r), int(c))
            if key not in tiles:
                tiles[key] = np.zeros((BR, BC), np.float64)
            tiles[key][i - r * BR, j - c * BC] = v

        per_row = [[] for _ in range(nbr)]
        for (r, c), blk in sorted(tiles.items()):
            per_row[r].append((c, blk))
        max_blocks = max(1, max(len(row) for row in per_row))
        data = np.zeros((nbr, max_blocks, BR, BC), np.float64)
        cols = np.zeros((nbr, max_blocks), np.int32)
        for r, row in enumerate(per_row):
            for k, (c, blk) in enumerate(row):
                data[r, k] = blk
                cols[r, k] = c
        return cls(data=jnp.asarray(data, dtype), cols=jnp.asarray(cols),
                   shape=(m, n), nnz=int(A.nnz))

    @property
    def density_blocks(self) -> float:
        nbr, maxk = self.cols.shape
        return maxk / max(1, -(-self.shape[1] // BC))


try:  # pallas import kept lazy-safe for platforms without TPU support
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _bcsr_kernel(cols_ref, data_ref, x_ref, out_ref):
    """Grid (nbr, maxk): out[i] += data[i, k] @ x[cols[i, k]].

    The x gather happens in the BlockSpec index_map via the
    scalar-prefetched `cols` array (the canonical Mosaic gather idiom),
    so the body is branch-free and does no dynamic indexing -- real-TPU
    lowering rejects both dynamic sublane reads and sub-(8,128) output
    blocks (the round-2 hardware session caught the latter).
    `cols_ref` is consumed by the index_maps only.
    """
    del cols_ref
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[0, 0, :] = jnp.zeros((out_ref.shape[-1],), out_ref.dtype)

    xs = x_ref[0, 0, :].reshape(1, -1)         # (1, BC)
    tile = data_ref[0, 0]                      # (BR, BC)
    y = jax.lax.dot_general(tile, xs, (((1,), (1,)), ((), ())),
                            preferred_element_type=out_ref.dtype)
    out_ref[0, 0, :] += y[:, 0]


def vmem_params(per_step_bytes):
    """CompilerParams raising the scoped-VMEM budget for kernels whose
    resident operand set exceeds the compiler's 16 MiB default.

    v5e's PHYSICAL VMEM is 128 MiB -- measured (r5): a 96 MiB VMEM
    operand loads and computes fine once `vmem_limit_bytes` is raised.
    The 16 MiB default had been mistaken for a hardware ceiling and
    forced the beyond-VMEM LP shapes (m=500 x n=5000 up) off the delta
    engine onto the steps fallback.  Returns None (compiler default)
    for small operand sets; otherwise a budget of ~2.2x the per-grid-
    step operand bytes (double-buffering headroom) capped at 110 MiB.
    """
    # ~2.8x operands + 4 MiB: just above the scheduler's MINIMAL plan
    # (double-buffered grid operands + loop carries + matmul scratch;
    # measured 31.1 MiB against 11.7 MiB of operands at m=500 x n=5000)
    # but BELOW the next buffering quantum -- given 41.6 MiB the Mosaic
    # scheduler prefetched ~6 grid steps and demanded 74.5 MiB, so a
    # generous budget re-OOMs itself.  Cap at 110 MiB of the 128 MiB
    # physical VMEM.
    need = int(per_step_bytes * 2.8) + (4 << 20)
    if need <= (16 << 20):
        return None
    from jax.experimental.pallas import tpu as _pltpu

    return _pltpu.CompilerParams(vmem_limit_bytes=min(need, 110 << 20))


# Per-lane operand-set budget for the fused VMEM kernels.  Above this,
# the grid-over-instances kernels hit the Mosaic scoped-VMEM stack
# planner's non-monotonic buffering: at m=500 x n=5000 (11.7 MiB of
# operands) it demanded 31.1 MiB under a 28.6 MiB limit and 74.5 MiB
# under 35-42 MiB limits -- raising the budget makes it prefetch MORE
# grid steps and re-OOM.  Large shapes route to the XLA fallback
# (identical math, HBM-streamed matmuls) instead.
PALLAS_OPBYTES_SAFE = 6 << 20


def pallas_fits(op_bytes) -> bool:
    """True when a fused kernel's per-lane operand set is small enough
    for the VMEM-resident Pallas path (see PALLAS_OPBYTES_SAFE)."""
    return int(op_bytes) <= PALLAS_OPBYTES_SAFE


def pallas_default() -> bool:
    """Use the Pallas kernels when compiling for a real TPU backend.

    On CPU (tests, fallback bench) the XLA gather/einsum path is both the
    only compilable option and faster; on TPU the custom kernel avoids
    materializing the (nbr, maxk, BC) gathered operand in HBM.
    """
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("interpret", "use_pallas"))
def bcsr_matvec(A: BCSRMatrix, x, interpret=False, use_pallas=None):
    """y = A @ x for a BCSRMatrix; returns the logical (m,) slice.

    use_pallas=None resolves via `pallas_default()` (TPU backend only).
    """
    if use_pallas is None:
        use_pallas = pallas_default()
    m, n = A.shape
    nbr, maxk = A.cols.shape
    n_pad = int(np.prod([-(-n // BC), BC]))
    x_pad = jnp.zeros((n_pad,), A.data.dtype).at[:n].set(x.astype(A.data.dtype))

    if use_pallas and _HAVE_PALLAS:
        # Middle unit dims keep every block's trailing two dims at the
        # (8, 128) Mosaic tile or equal to the full array dim -- the
        # real-TPU lowering requirement (see _bcsr_kernel docstring).
        x3d = x_pad.reshape(-1, 1, BC)
        # index_map constants must be i32 NON-TRACER values: a literal
        # `0` traces as i64 under jax_enable_x64 (Mosaic fails to
        # legalize the index transform), and jnp.int32(0) inside the
        # jitted caller is a captured tracer (also rejected); a numpy
        # scalar satisfies both (caught on real TPU v5e, round 2)
        z = np.int32(0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbr, maxk),
            in_specs=[
                pl.BlockSpec((1, 1, BR, BC), lambda i, k, cols: (i, k, z, z)),
                pl.BlockSpec((1, 1, BC), lambda i, k, cols: (cols[i, k], z, z)),
            ],
            out_specs=pl.BlockSpec((1, 1, BR), lambda i, k, cols: (i, z, z)),
        )
        y = pl.pallas_call(
            _bcsr_kernel,
            out_shape=jax.ShapeDtypeStruct((nbr, 1, BR), A.data.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(A.cols, A.data, x3d).reshape(-1)
    else:
        # XLA fallback: gather x tiles and batch the tile matmuls
        xs = x_pad.reshape(-1, BC)[A.cols]          # (nbr, maxk, BC)
        y = jnp.einsum("rkij,rkj->ri", A.data, xs).reshape(-1)
    return y[:m]
