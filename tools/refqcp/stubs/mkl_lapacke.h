/* LAPACKE stub: dense-Cholesky backend (linsys_solver=5) is never
   selected by the parity driver (see mkl_types.h header comment). */
#ifndef MKL_LAPACKE_STUB_H
#define MKL_LAPACKE_STUB_H
#include "mkl_types.h"

#define LAPACK_COL_MAJOR 102
typedef int lapack_int;

static inline lapack_int LAPACKE_dpotrf(int layout, char uplo, lapack_int n,
                                        double *a, lapack_int lda)
{ (void)layout; (void)uplo; (void)n; (void)a; (void)lda; return -1; }
static inline lapack_int LAPACKE_dpotrs(int layout, char uplo, lapack_int n,
                                        lapack_int nrhs, const double *a,
                                        lapack_int lda, double *b,
                                        lapack_int ldb)
{ (void)layout; (void)uplo; (void)n; (void)nrhs; (void)a; (void)lda;
  (void)b; (void)ldb; return -1; }
#endif
