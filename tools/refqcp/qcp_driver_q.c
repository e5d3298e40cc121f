/* File-driven parity/benchmark driver for the reference ABIP-QCP solver
   (QDLDL backend).  Reads the binary instance format written by
   tools/parity_qcp.py::export_conic:

     int64 m, n, nnz
     int64 Ap[n+1], int64 Ai[nnz], double Ax[nnz]        (CSC)
     double b[m], double c[n]
     int64 f, z, l, qsize, rqsize
     int64 q[qsize], int64 rq[rqsize]
     [optional Q block (Q-aware build):
        int64 qnnz; int64 Qp[n+1], Qi[qnnz], double Qx[qnnz]]

   qnnz == 0 or EOF means Q = NULL.  Prints one JSON result line.
   Build recipe: tools/refqcp/build.sh (stub MKL headers in stubs/).
   Usage: qcpref_q instance.bin [eps] */
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

/* read an int64 CSC block into an ABIPMatrix (abip_int indices) */
static ABIPMatrix *read_csc(FILE *f, abip_int m, abip_int n, long long nnz) {
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
        for (long long k = 0; k < nnz; ++k) A->i[k] = (abip_int)tmp[k];
        xread(f, A->x, sizeof(double), nnz);
    }
    free(tmp);
    return A;
}

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s instance.bin [eps]\n", argv[0]); return 1; }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", argv[1]); return 1; }
    long long dims[3];
    xread(f, dims, sizeof(long long), 3);
    abip_int m = (abip_int)dims[0], n = (abip_int)dims[1];
    ABIPMatrix *A = read_csc(f, m, n, dims[2]);

    abip_float *b = (abip_float*)malloc(m*sizeof(abip_float));
    abip_float *c = (abip_float*)malloc(n*sizeof(abip_float));
    xread(f, b, sizeof(double), m);
    xread(f, c, sizeof(double), n);

    long long kdims[5];
    xread(f, kdims, sizeof(long long), 5);
    ABIPCone K; memset(&K, 0, sizeof(K));
    K.f = (abip_int)kdims[0];
    K.z = (abip_int)kdims[1];
    K.l = (abip_int)kdims[2];
    K.qsize = (abip_int)kdims[3];
    K.rqsize = (abip_int)kdims[4];
    K.q = (abip_int*)calloc(K.qsize > 0 ? K.qsize : 1, sizeof(abip_int));
    K.rq = (abip_int*)calloc(K.rqsize > 0 ? K.rqsize : 1, sizeof(abip_int));
    long long tmp8;
    for (abip_int i = 0; i < K.qsize; ++i) {
        xread(f, &tmp8, sizeof(long long), 1); K.q[i] = (abip_int)tmp8;
    }
    for (abip_int i = 0; i < K.rqsize; ++i) {
        xread(f, &tmp8, sizeof(long long), 1); K.rq[i] = (abip_int)tmp8;
    }

    /* optional trailing Q block (absent or qnnz=0 -> Q = NULL) */
    ABIPMatrix *Q = NULL;
    long long qnnz;
    if (fread(&qnnz, sizeof(long long), 1, f) == 1 && qnnz > 0)
        Q = read_csc(f, n, n, qnnz);
    fclose(f);

    ABIPData *d = (ABIPData*)calloc(1, sizeof(ABIPData));
    d->m = m; d->n = n; d->A = A; d->Q = Q; d->b = b; d->c = c;
    d->stgs = (ABIPSettings*)calloc(1, sizeof(ABIPSettings));
    ABIP(set_default_settings)(d);
    double eps = argc > 2 ? atof(argv[2]) : 1e-4;
    d->stgs->eps = eps;
    d->stgs->eps_p = eps; d->stgs->eps_d = eps; d->stgs->eps_g = eps;
    d->stgs->eps_inf = eps; d->stgs->eps_unb = eps;
    d->stgs->verbose = 0;
    d->stgs->linsys_solver = 1;   /* QDLDL: the only backend in this build */
    d->stgs->prob_type = 2;       /* the abip() entry maps 2 -> enum QCP
                                     (source/abip.c:1341-1348 quirk) */
    d->stgs->time_limit = 1e9;

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
