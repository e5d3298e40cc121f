"""Pallas TPU kernels for the hot ops.

The compute path of the framework is jnp/XLA; these kernels cover the
spots XLA cannot fuse or tile well (SURVEY.md section 7 "M2"):

  * `bcsr`: block-sparse (BCSR) matrix-vector products, the TPU-native
    replacement for the reference's CSC SpMV (`linsys/common.c:598-695`).
    Tiles are (8, 128)-aligned so the products ride the MXU.
  * `fused_prox`: barrier prox + over-relaxation + dual update in one
    kernel (one HBM round-trip instead of several elementwise passes).

Every kernel has an `interpret=True` path so tests run on CPU.
"""
from .spmv_pallas import BCSRMatrix, bcsr_matvec
from .prox_pallas import fused_barrier_step
from .admm_pallas import fused_admm_sprint

__all__ = ["BCSRMatrix", "bcsr_matvec", "fused_barrier_step", "fused_admm_sprint"]
