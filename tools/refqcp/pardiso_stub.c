/* Stub for the uppercase PARDISO symbol referenced by the (unused)
   pardiso backend in the reference linsys.c.  Aborts if ever reached:
   the parity driver pins linsys_solver=1 (QDLDL). */
#include <stdio.h>
#include <stdlib.h>
#include "stubs/mkl_pardiso.h"

void PARDISO(void **pt, MKL_INT *maxfct, MKL_INT *mnum, MKL_INT *mtype,
             MKL_INT *phase, MKL_INT *n, void *a, MKL_INT *ia, MKL_INT *ja,
             MKL_INT *perm, MKL_INT *nrhs, MKL_INT *iparm, MKL_INT *msglvl,
             void *b, void *x, MKL_INT *error) {
    (void)pt; (void)maxfct; (void)mnum; (void)mtype; (void)phase; (void)n;
    (void)a; (void)ia; (void)ja; (void)perm; (void)nrhs; (void)iparm;
    (void)msglvl; (void)b; (void)x;
    fprintf(stderr, "PARDISO stub reached -- parity build only supports "
                    "linsys_solver=1 (QDLDL)\n");
    if (error) *error = -1;
    exit(2);
}
