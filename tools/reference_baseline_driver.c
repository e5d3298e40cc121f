/* Baseline measurement driver for the reference ABIP-LP direct solver.
   Generates the smoke-test LP (test_abip_install.m shape): A=[rand sparse, I],
   b = A x0, c = A'y0 + s0, solves at eps=1e-6, reports admm iters and time. */
#include <stdio.h>
#include <stdlib.h>
#include <time.h>
#include <string.h>
#include "abip.h"
#include "util.h"
#include "amatrix.h"

static double now_sec(void) {
    struct timespec t; clock_gettime(CLOCK_MONOTONIC, &t);
    return t.tv_sec + 1e-9 * t.tv_nsec;
}

/* xorshift RNG for reproducibility */
static unsigned long long rs = 0x9E3779B97F4A7C15ull;
static double urand(void) {
    rs ^= rs << 13; rs ^= rs >> 7; rs ^= rs << 17;
    return (double)(rs >> 11) / 9007199254740992.0;
}
static double nrand(void) { /* Box-Muller */
    double u1 = urand() + 1e-16, u2 = urand();
    return sqrt(-2.0 * log(u1)) * cos(6.283185307179586 * u2);
}

#ifndef PARITY_MAIN
int main(int argc, char **argv) {
    abip_int m = 50, n_rand = 1950; double density = 0.3;
    abip_int n = n_rand + m;
    /* build dense then compress to CSC */
    double *Ad = (double*)calloc((size_t)m*n, sizeof(double));
    for (abip_int j = 0; j < n_rand; ++j)
        for (abip_int i = 0; i < m; ++i) {
            double r = nrand(); double keep = urand();
            if (keep < density) Ad[(size_t)j*m+i] = r;
        }
    for (abip_int j = 0; j < m; ++j) Ad[(size_t)(n_rand+j)*m + j] = 1.0;

    abip_int nnz = 0;
    for (size_t k = 0; k < (size_t)m*n; ++k) if (Ad[k] != 0) nnz++;

    ABIPMatrix *A = (ABIPMatrix*)calloc(1, sizeof(ABIPMatrix));
    A->m = m; A->n = n;
    A->p = (abip_int*)malloc((n+1)*sizeof(abip_int));
    A->i = (abip_int*)malloc(nnz*sizeof(abip_int));
    A->x = (abip_float*)malloc(nnz*sizeof(abip_float));
    abip_int pos = 0;
    for (abip_int j = 0; j < n; ++j) {
        A->p[j] = pos;
        for (abip_int i = 0; i < m; ++i) {
            double v = Ad[(size_t)j*m+i];
            if (v != 0) { A->i[pos] = i; A->x[pos] = v; pos++; }
        }
    }
    A->p[n] = pos;

    double *x0 = malloc(n*sizeof(double)), *y0 = malloc(m*sizeof(double)), *s0 = malloc(n*sizeof(double));
    for (abip_int i = 0; i < n; ++i) x0[i] = urand() + 0.5;
    for (abip_int i = 0; i < m; ++i) y0[i] = nrand();
    for (abip_int i = 0; i < n; ++i) s0[i] = urand() + 0.5;

    abip_float *b = calloc(m, sizeof(abip_float));
    abip_float *c = calloc(n, sizeof(abip_float));
    for (abip_int j = 0; j < n; ++j)
        for (abip_int k = A->p[j]; k < A->p[j+1]; ++k)
            b[A->i[k]] += A->x[k]*x0[j];
    for (abip_int j = 0; j < n; ++j) {
        double acc = s0[j];
        for (abip_int k = A->p[j]; k < A->p[j+1]; ++k) acc += A->x[k]*y0[A->i[k]];
        c[j] = acc;
    }

    ABIPData *d = (ABIPData*)calloc(1, sizeof(ABIPData));
    d->m = m; d->n = n; d->A = A; d->b = b; d->c = c;
    d->sp = (double)nnz / ((double)m*n);
    d->stgs = (ABIPSettings*)calloc(1, sizeof(ABIPSettings));
    ABIP(set_default_settings)(d);
    d->stgs->eps = 1e-6;
    d->stgs->verbose = (argc > 1);
    d->stgs->max_time = 1e9;

    ABIPSolution sol = {0};
    ABIPInfo info;
    double t0 = now_sec();
    ABIP(main)(d, &sol, &info);
    double dt = now_sec() - t0;
    printf("{\"status\": \"%s\", \"ipm\": %d, \"admm\": %d, \"time_sec\": %.4f, \"iters_per_sec\": %.1f, \"pres\": %.3e, \"dres\": %.3e, \"gap\": %.3e}\n",
           info.status, (int)info.ipm_iter, (int)info.admm_iter, dt,
           info.admm_iter/dt, info.res_pri, info.res_dual, info.rel_gap);
    return 0;
}
#endif /* !PARITY_MAIN */

const char *ABIP(version)(void) { return "2.0.0"; }

/* ---- file-driven mode (added for parity comparison) ----------------
   Binary format (little-endian):
     int64 m, n, nnz
     int64 Ap[n+1], int64 Ai[nnz], double Ax[nnz]   (CSC)
     double b[m], double c[n]
   Build with -DPARITY_MAIN to use this entry instead of main(). */
#ifdef PARITY_MAIN
static void *xread(FILE *f, void *p, size_t sz, size_t cnt) {
    if (fread(p, sz, cnt, f) != cnt) { fprintf(stderr, "short read\n"); exit(1); }
    return p;
}

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s instance.bin [eps]\n", argv[0]); return 1; }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", argv[1]); return 1; }
    long long dims[3];
    xread(f, dims, sizeof(long long), 3);
    abip_int m = (abip_int)dims[0], n = (abip_int)dims[1];
    long long nnz = dims[2];

    ABIPMatrix *A = (ABIPMatrix*)calloc(1, sizeof(ABIPMatrix));
    A->m = m; A->n = n;
    A->p = (abip_int*)malloc((n+1)*sizeof(abip_int));
    A->i = (abip_int*)malloc(nnz*sizeof(abip_int));
    A->x = (abip_float*)malloc(nnz*sizeof(abip_float));
    {
        long long *tmp = (long long*)malloc((n+1)*sizeof(long long));
        xread(f, tmp, sizeof(long long), n+1);
        for (abip_int j = 0; j <= n; ++j) A->p[j] = (abip_int)tmp[j];
        free(tmp);
        tmp = (long long*)malloc(nnz*sizeof(long long));
        xread(f, tmp, sizeof(long long), nnz);
        for (long long k = 0; k < nnz; ++k) A->i[k] = (abip_int)tmp[k];
        free(tmp);
    }
    xread(f, A->x, sizeof(double), nnz);
    abip_float *b = (abip_float*)malloc(m*sizeof(abip_float));
    abip_float *c = (abip_float*)malloc(n*sizeof(abip_float));
    xread(f, b, sizeof(double), m);
    xread(f, c, sizeof(double), n);
    fclose(f);

    ABIPData *d = (ABIPData*)calloc(1, sizeof(ABIPData));
    d->m = m; d->n = n; d->A = A; d->b = b; d->c = c;
    d->sp = (double)nnz / ((double)m*n);
    d->stgs = (ABIPSettings*)calloc(1, sizeof(ABIPSettings));
    ABIP(set_default_settings)(d);
    d->stgs->eps = argc > 2 ? atof(argv[2]) : 1e-6;
    d->stgs->verbose = 0;
    d->stgs->max_time = 1e9;

    ABIPSolution sol = {0};
    ABIPInfo info;
    double t0 = now_sec();
    ABIP(main)(d, &sol, &info);
    double dt = now_sec() - t0;
    printf("{\"status\": \"%s\", \"ipm\": %d, \"admm\": %d, \"time_sec\": %.4f, "
           "\"pobj\": %.10e, \"dobj\": %.10e, \"pres\": %.3e, \"dres\": %.3e, \"gap\": %.3e}\n",
           info.status, (int)info.ipm_iter, (int)info.admm_iter, dt,
           info.pobj, info.dobj, info.res_pri, info.res_dual, info.rel_gap);
    return 0;
}
#endif /* PARITY_MAIN */
