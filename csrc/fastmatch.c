/* fastmatch: native data-path kernels for the multi-fidelity data manager.
 *
 * The reference framework is pure Python (SURVEY.md §2: zero native files);
 * its subset detection is an O(n1*n2*d) torch broadcast
 * (`FidelityFusion_Models/MF_data.py:196-205`).  This C module provides the
 * runtime-side equivalent the TPU framework uses on the host data path:
 * exact-row matching between two fidelity datasets in O((n1+n2) log(n1+n2) d)
 * via lexicographic sort + linear merge.  Loaded with ctypes
 * (`fidelityfusion_tpu/utils/native.py`); numpy fallback when unavailable.
 *
 * Build:  cc -O3 -shared -fPIC -o libfastmatch.so fastmatch.c
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    const double *data; /* row-major (n, d) */
    int64_t d;
} RowCtx;

static RowCtx g_ctx;

static int cmp_rows(const void *pa, const void *pb) {
    int64_t ia = *(const int64_t *)pa;
    int64_t ib = *(const int64_t *)pb;
    const double *ra = g_ctx.data + ia * g_ctx.d;
    const double *rb = g_ctx.data + ib * g_ctx.d;
    for (int64_t k = 0; k < g_ctx.d; ++k) {
        if (ra[k] < rb[k]) return -1;
        if (ra[k] > rb[k]) return 1;
    }
    return 0;
}

static int row_cmp2(const double *a, const double *b, int64_t d) {
    for (int64_t k = 0; k < d; ++k) {
        if (a[k] < b[k]) return -1;
        if (a[k] > b[k]) return 1;
    }
    return 0;
}

/* Mark rows of x1 that appear in x2 (out1) and rows of x2 that appear in
 * x1 (out2).  Exact floating-point equality, matching the reference's
 * broadcast-equality semantics. Returns 0 on success, -1 on alloc fail. */
int match_rows(const double *x1, int64_t n1, const double *x2, int64_t n2,
               int64_t d, uint8_t *out1, uint8_t *out2) {
    memset(out1, 0, (size_t)n1);
    memset(out2, 0, (size_t)n2);
    if (n1 == 0 || n2 == 0) return 0;

    int64_t *idx1 = (int64_t *)malloc(sizeof(int64_t) * (size_t)n1);
    int64_t *idx2 = (int64_t *)malloc(sizeof(int64_t) * (size_t)n2);
    if (!idx1 || !idx2) {
        free(idx1);
        free(idx2);
        return -1;
    }
    for (int64_t i = 0; i < n1; ++i) idx1[i] = i;
    for (int64_t i = 0; i < n2; ++i) idx2[i] = i;

    g_ctx.data = x1;
    g_ctx.d = d;
    qsort(idx1, (size_t)n1, sizeof(int64_t), cmp_rows);
    g_ctx.data = x2;
    qsort(idx2, (size_t)n2, sizeof(int64_t), cmp_rows);

    int64_t i = 0, j = 0;
    while (i < n1 && j < n2) {
        const double *r1 = x1 + idx1[i] * d;
        const double *r2 = x2 + idx2[j] * d;
        int c = row_cmp2(r1, r2, d);
        if (c < 0) {
            ++i;
        } else if (c > 0) {
            ++j;
        } else {
            /* mark every duplicate of this row value on both sides */
            int64_t i0 = i, j0 = j;
            while (i < n1 && row_cmp2(x1 + idx1[i] * d, r1, d) == 0) {
                out1[idx1[i]] = 1;
                ++i;
            }
            while (j < n2 && row_cmp2(x2 + idx2[j] * d, r2, d) == 0) {
                out2[idx2[j]] = 1;
                ++j;
            }
            (void)i0;
            (void)j0;
        }
    }
    free(idx1);
    free(idx2);
    return 0;
}

/* Gather rows of src (n, d) by index into dst (m, d). Host-side dataset
 * assembly helper (padding / reordering for static-shape buffers). */
void gather_rows(const double *src, int64_t d, const int64_t *index,
                 int64_t m, double *dst) {
    for (int64_t i = 0; i < m; ++i) {
        memcpy(dst + i * d, src + index[i] * d, sizeof(double) * (size_t)d);
    }
}
