/* MKL-PARDISO stub: the uppercase PARDISO symbol is defined in
   pardiso_stub.c (see mkl_types.h header comment). */
#ifndef MKL_PARDISO_STUB_H
#define MKL_PARDISO_STUB_H
#include "mkl_types.h"

void PARDISO(void **pt, MKL_INT *maxfct, MKL_INT *mnum, MKL_INT *mtype,
             MKL_INT *phase, MKL_INT *n, void *a, MKL_INT *ia, MKL_INT *ja,
             MKL_INT *perm, MKL_INT *nrhs, MKL_INT *iparm, MKL_INT *msglvl,
             void *b, void *x, MKL_INT *error);
#endif
