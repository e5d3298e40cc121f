/* MKL-DSS stub: no-op declarations (see mkl_types.h header comment). */
#ifndef MKL_DSS_STUB_H
#define MKL_DSS_STUB_H
#include "mkl_types.h"

#define MKL_DSS_DEFAULTS 0
#define MKL_DSS_ZERO_BASED_INDEXING 0
#define MKL_DSS_SYMMETRIC 0
#define MKL_DSS_INDEFINITE 0
#define MKL_DSS_SUCCESS 0

static inline _INTEGER_t dss_create(_MKL_DSS_HANDLE_t h, MKL_INT o)
{ (void)h; (void)o; return -1; }
static inline _INTEGER_t dss_define_structure(
    _MKL_DSS_HANDLE_t h, MKL_INT sym, const void *p, MKL_INT m, MKL_INT n,
    const void *i, MKL_INT nnz)
{ (void)h; (void)sym; (void)p; (void)m; (void)n; (void)i; (void)nnz;
  return -1; }
static inline _INTEGER_t dss_reorder(_MKL_DSS_HANDLE_t h, MKL_INT o,
                                     const MKL_INT *perm)
{ (void)h; (void)o; (void)perm; return -1; }
static inline _INTEGER_t dss_factor_real(_MKL_DSS_HANDLE_t h, MKL_INT t,
                                         const void *x)
{ (void)h; (void)t; (void)x; return -1; }
static inline _INTEGER_t dss_solve_real(_MKL_DSS_HANDLE_t h, MKL_INT o,
                                        const void *b, MKL_INT nrhs, void *x)
{ (void)h; (void)o; (void)b; (void)nrhs; (void)x; return -1; }
static inline _INTEGER_t dss_delete(_MKL_DSS_HANDLE_t h, MKL_INT o)
{ (void)h; (void)o; return -1; }
#endif
