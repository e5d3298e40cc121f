/* File-driven ML (LASSO/SVM/SVMQP) driver for the reference ABIP-QCP
   solver -- the abip_ml front door (mex/abip_ml_mex.c:90-146) without
   MATLAB: the reformulation happens INSIDE the solver via
   init_problem(LASSO|SVM|SVMQP), with the matrix-free operators of
   lasso_config.c / svm_config.c.

   Binary format (written by benchmarks/ml_sweep.py::export_ml):

     int64 prob_type              (0 lasso, 1 svm, 3 svmqp)
     int64 m, n, nnz
     int64 Xp[n+1], int64 Xi[nnz], double Xx[nnz]    (CSC X)
     double y[m]
     double lambda

   Prints one JSON result line.  linsys_solver is forced to 1 (QDLDL on
   the per-problem custom KKT, lasso_config.c:507-565): the MKL
   dense/DSS backends are stubbed out in this build, and the reference's
   OWN PCG route (linsys_solver=3) SEGFAULTS for the ML problem types --
   pre_calculate passes pcg_warm_start=ABIP_NULL
   (source/abip.c:899), and the generic pcg dereferences it
   unconditionally (source/linsys.c:642 -> lasso_AT_times
   lasso_config.c:117 reads x[0]).  Only the qcp_pcg/svmqp_pcg variants
   guard NULL; the prob_type dispatch quirk (linsys.c:1158-1165) routes
   LASSO/SVM to the unguarded one.  Reference bug, reproduced under
   ASAN 2026-08-20; documented in SURVEY.md quirks.
   Usage: mlref instance.bin [eps] [time_limit_sec] */
#include <stdio.h>
#include <stdlib.h>
#include <time.h>
#include <string.h>
#include <math.h>
#include "abip.h"
#include "util.h"
#include "amatrix.h"

static double now_sec(void) {
    struct timespec t; clock_gettime(CLOCK_MONOTONIC, &t);
    return t.tv_sec + 1e-9 * t.tv_nsec;
}

static void *xread(FILE *f, void *p, size_t sz, size_t cnt) {
    if (fread(p, sz, cnt, f) != cnt) { fprintf(stderr, "short read\n"); exit(1); }
    return p;
}

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s instance.bin [eps] [tlimit]\n", argv[0]); return 1; }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", argv[1]); return 1; }
    long long hdr[4];
    xread(f, hdr, sizeof(long long), 1);
    int prob_type = (int)hdr[0];
    xread(f, hdr, sizeof(long long), 3);
    abip_int m = (abip_int)hdr[0], n = (abip_int)hdr[1];
    long long nnz = hdr[2];

    ABIPMatrix *A = (ABIPMatrix*)calloc(1, sizeof(ABIPMatrix));
    A->m = m; A->n = n;
    A->p = (abip_int*)malloc((n+1)*sizeof(abip_int));
    A->i = (abip_int*)malloc((nnz > 0 ? nnz : 1)*sizeof(abip_int));
    A->x = (abip_float*)malloc((nnz > 0 ? nnz : 1)*sizeof(abip_float));
    long long *tmp = (long long*)malloc((size_t)(n+1 > nnz ? n+1 : nnz)
                                        *sizeof(long long));
    xread(f, tmp, sizeof(long long), n+1);
    for (abip_int j = 0; j <= n; ++j) A->p[j] = (abip_int)tmp[j];
    if (nnz > 0) {
        xread(f, tmp, sizeof(long long), nnz);
        for (long long k2 = 0; k2 < nnz; ++k2) A->i[k2] = (abip_int)tmp[k2];
        xread(f, A->x, sizeof(double), nnz);
    }
    free(tmp);

    abip_float *y = (abip_float*)malloc(m*sizeof(abip_float));
    xread(f, y, sizeof(double), m);
    double lambda;
    xread(f, &lambda, sizeof(double), 1);
    fclose(f);

    ABIPData *d = (ABIPData*)calloc(1, sizeof(ABIPData));
    d->m = m; d->n = n; d->A = A; d->Q = NULL; d->b = y; d->c = NULL;
    d->lambda = (abip_float)lambda;
    d->stgs = (ABIPSettings*)calloc(1, sizeof(ABIPSettings));
    ABIP(set_default_settings)(d);
    double eps = argc > 2 ? atof(argv[2]) : 1e-3;
    d->stgs->eps = eps;
    d->stgs->eps_p = eps; d->stgs->eps_d = eps; d->stgs->eps_g = eps;
    d->stgs->eps_inf = eps * 1e-2; d->stgs->eps_unb = eps * 1e-2;
    d->stgs->verbose = 0;
    d->stgs->linsys_solver = 1;   /* QDLDL on the custom KKT (see header) */
    d->stgs->prob_type = prob_type;
    d->stgs->time_limit = argc > 3 ? atof(argv[3]) : 2000.0;

    /* cone construction per reformulation (abip_ml_mex.c:320-346) */
    ABIPCone K; memset(&K, 0, sizeof(K));
    abip_int rq0 = 0;
    if (prob_type == 0) {          /* LASSO */
        K.rqsize = 1; rq0 = 2 + m; K.rq = &rq0; K.l = 2 * n;
    } else if (prob_type == 1) {   /* SVM (SOCP) */
        K.rqsize = 1; rq0 = 2 + n; K.rq = &rq0;
        K.l = 2 + 2 * m + 2 * n;
    } else if (prob_type == 3) {   /* SVM (QP) */
        K.f = n + 1; K.l = 2 * m;
    } else {
        fprintf(stderr, "unsupported prob_type %d\n", prob_type);
        return 1;
    }

    ABIPSolution sol; memset(&sol, 0, sizeof(sol));
    ABIPInfo info; memset(&info, 0, sizeof(info));
    double t0 = now_sec();
    abip(d, &sol, &info, &K);
    double dt = now_sec() - t0;
    printf("{\"status\": \"%s\", \"ipm\": %d, \"admm\": %d, \"time_sec\": %.4f, "
           "\"pobj\": %.10e, \"dobj\": %.10e, \"pres\": %.3e, \"dres\": %.3e, "
           "\"gap\": %.3e}\n",
           info.status, (int)info.ipm_iter, (int)info.admm_iter, dt,
           info.pobj, info.dobj, info.res_pri, info.res_dual, info.rel_gap);
    return 0;
}
