/* Golden test-vector generator: runs the REFERENCE library's transforms on
 * synthetic inputs and dumps raw arrays, so the new TPU framework can be
 * verified for exact semantic parity.  (This file is ours; it only *calls*
 * the reference.)  Output: a simple binary container consumed by
 * tests/make_golden.py.  */
#include "libdwt.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static FILE *out;

static void dump(const char *name, const char *dtype, int ny, int nx, const void *data, size_t elem)
{
    int namelen = (int)strlen(name);
    int dtypelen = (int)strlen(dtype);
    fwrite(&namelen, 4, 1, out);
    fwrite(name, 1, namelen, out);
    fwrite(&dtypelen, 4, 1, out);
    fwrite(dtype, 1, dtypelen, out);
    fwrite(&ny, 4, 1, out);
    fwrite(&nx, 4, 1, out);
    fwrite(data, elem, (size_t)ny * nx, out);
}

/* deterministic pseudo-random floats in [-1, 1) */
static unsigned lcg_state = 12345;
static float frand(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)((double)lcg_state / 2147483648.0 - 1.0);
}
static void reset_rand(unsigned seed) { lcg_state = seed; }

static void gen_1d_float(int N)
{
    char name[128];
    float *src = malloc(sizeof(float) * N);
    float *tmp = malloc(sizeof(float) * (N + 16) * 4); /* worker-padded temp */
    float *lo = malloc(sizeof(float) * N);
    float *hi = malloc(sizeof(float) * N);
    int nl = (N + 1) / 2, nh = N / 2;

    reset_rand(1000 + N);
    for (int i = 0; i < N; i++) src[i] = frand();
    snprintf(name, sizeof name, "x_f32_%d", N);
    dump(name, "f32", 1, N, src, 4);

    /* CDF 9/7 float */
    dwt_cdf97_f_ex_stride_s(src, lo, hi, tmp, N, sizeof(float));
    snprintf(name, sizeof name, "cdf97_f32_%d_L", N);
    dump(name, "f32", 1, nl, lo, 4);
    snprintf(name, sizeof name, "cdf97_f32_%d_H", N);
    dump(name, "f32", 1, nh, hi, 4);

    /* CDF 5/3 float */
    dwt_cdf53_f_ex_stride_s(src, lo, hi, tmp, N, sizeof(float));
    snprintf(name, sizeof name, "cdf53_f32_%d_L", N);
    dump(name, "f32", 1, nl, lo, 4);
    snprintf(name, sizeof name, "cdf53_f32_%d_H", N);
    dump(name, "f32", 1, nh, hi, 4);

    /* interp 5/3 float */
    dwt_interp53_f_ex_stride_s(src, lo, hi, tmp, N, sizeof(float));
    snprintf(name, sizeof name, "interp53_f32_%d_L", N);
    dump(name, "f32", 1, nl, lo, 4);
    snprintf(name, sizeof name, "interp53_f32_%d_H", N);
    dump(name, "f32", 1, nh, hi, 4);

    free(src); free(tmp); free(lo); free(hi);
}

static void gen_1d_double(int N)
{
    char name[128];
    double *src = malloc(sizeof(double) * N);
    double *tmp = malloc(sizeof(double) * (N + 16));
    double *lo = malloc(sizeof(double) * N);
    double *hi = malloc(sizeof(double) * N);
    int nl = (N + 1) / 2, nh = N / 2;

    reset_rand(2000 + N);
    for (int i = 0; i < N; i++) src[i] = (double)frand();
    snprintf(name, sizeof name, "x_f64_%d", N);
    dump(name, "f64", 1, N, src, 8);

    dwt_cdf97_f_ex_stride_d(src, lo, hi, tmp, N, sizeof(double));
    snprintf(name, sizeof name, "cdf97_f64_%d_L", N);
    dump(name, "f64", 1, nl, lo, 8);
    snprintf(name, sizeof name, "cdf97_f64_%d_H", N);
    dump(name, "f64", 1, nh, hi, 8);

    dwt_cdf53_f_ex_stride_d(src, lo, hi, tmp, N, sizeof(double));
    snprintf(name, sizeof name, "cdf53_f64_%d_L", N);
    dump(name, "f64", 1, nl, lo, 8);
    snprintf(name, sizeof name, "cdf53_f64_%d_H", N);
    dump(name, "f64", 1, nh, hi, 8);

    free(src); free(tmp); free(lo); free(hi);
}

static void gen_1d_int(int N)
{
    char name[128];
    int *src = malloc(sizeof(int) * N);
    int *tmp = malloc(sizeof(int) * (N + 16));
    int *lo = malloc(sizeof(int) * N);
    int *hi = malloc(sizeof(int) * N);
    int nl = (N + 1) / 2, nh = N / 2;

    reset_rand(3000 + N);
    for (int i = 0; i < N; i++) src[i] = (int)(frand() * 30000.f);
    snprintf(name, sizeof name, "x_i32_%d", N);
    dump(name, "i32", 1, N, src, 4);

    dwt_cdf97_f_ex_stride_i(src, lo, hi, tmp, N, sizeof(int));
    snprintf(name, sizeof name, "cdf97_i32_%d_L", N);
    dump(name, "i32", 1, nl, lo, 4);
    snprintf(name, sizeof name, "cdf97_i32_%d_H", N);
    dump(name, "i32", 1, nh, hi, 4);

    dwt_cdf53_f_ex_stride_i(src, lo, hi, tmp, N, sizeof(int));
    snprintf(name, sizeof name, "cdf53_i32_%d_L", N);
    dump(name, "i32", 1, nl, lo, 4);
    snprintf(name, sizeof name, "cdf53_i32_%d_H", N);
    dump(name, "i32", 1, nh, hi, 4);

    free(src); free(tmp); free(lo); free(hi);
}

/* Some 1-D entries exist in the reference but are not declared in the
 * public header; declare them here (defined in libdwt.c and
 * eaw-experimental.c). */
extern void dwt_interp53_f_ex_stride_s(const float *src, float *dst_l,
    float *dst_h, float *tmp, int N, int stride);
extern void dwt_eaw53_f_ex_stride_s(const float *src, float *dst_l,
    float *dst_h, float *tmp, int N, int stride, float *w, float alpha);
extern void dwt_eaw97_f_ex_stride_s(const float *src, float *dst_l,
    float *dst_h, float *tmp, int N, int stride, float *w, float alpha);
#include "swt.h"

static void gen_1d_eaw(int N)
{
    char name[128];
    float *src = malloc(sizeof(float) * N);
    float *tmp = malloc(sizeof(float) * (N + 16));
    float *lo = malloc(sizeof(float) * N);
    float *hi = malloc(sizeof(float) * N);
    float *w = malloc(sizeof(float) * (N + 1));
    int nl = (N + 1) / 2, nh = N / 2;
    const float alpha = 0.8f;

    reset_rand(5000 + N);
    for (int i = 0; i < N; i++) src[i] = frand();
    snprintf(name, sizeof name, "eawx_f32_%d", N);
    dump(name, "f32", 1, N, src, 4);

    dwt_eaw97_f_ex_stride_s(src, lo, hi, tmp, N, sizeof(float), w, alpha);
    snprintf(name, sizeof name, "eaw97_f32_%d_L", N);
    dump(name, "f32", 1, nl, lo, 4);
    snprintf(name, sizeof name, "eaw97_f32_%d_H", N);
    dump(name, "f32", 1, nh, hi, 4);
    snprintf(name, sizeof name, "eaw97_f32_%d_W", N);
    dump(name, "f32", 1, N, w, 4);

    dwt_eaw53_f_ex_stride_s(src, lo, hi, tmp, N, sizeof(float), w, alpha);
    snprintf(name, sizeof name, "eaw53_f32_%d_L", N);
    dump(name, "f32", 1, nl, lo, 4);
    snprintf(name, sizeof name, "eaw53_f32_%d_H", N);
    dump(name, "f32", 1, nh, hi, 4);

    free(src); free(tmp); free(lo); free(hi); free(w);
}

#include "eaw-experimental.h"

static void gen_2d_eaw(int ny, int nx, int j)
{
    char name[128];
    const int stride_y = sizeof(float);
    const int stride_x = nx * sizeof(float);
    float *img = malloc((size_t)ny * nx * sizeof(float));
    float *wH[16] = {0};
    float *wV[16] = {0};
    const float alpha = 0.8f;

    reset_rand(7000 + ny * 131 + nx);
    for (int i = 0; i < ny * nx; i++) img[i] = frand();
    snprintf(name, sizeof name, "eawimg_f32_%dx%d", ny, nx);
    dump(name, "f32", ny, nx, img, 4);

    int jj = j;
    dwt_eaw97_2f_s(img, stride_x, stride_y, nx, ny, nx, ny, &jj, 0, 0,
                   wH, wV, alpha);
    snprintf(name, sizeof name, "eaw97_2f_f32_%dx%d_j%d", ny, nx, j);
    dump(name, "f32", ny, nx, img, 4);
    for (int lvl = 0; lvl < jj; lvl++) {
        int sy = (ny + (1 << lvl) - 1) >> lvl;
        int sx = (nx + (1 << lvl) - 1) >> lvl;
        snprintf(name, sizeof name, "eaw97_2f_f32_%dx%d_j%d_wH%d", ny, nx, j, lvl);
        dump(name, "f32", sy, sx, wH[lvl], 4);
        snprintf(name, sizeof name, "eaw97_2f_f32_%dx%d_j%d_wV%d", ny, nx, j, lvl);
        dump(name, "f32", sx, sy, wV[lvl], 4);
    }
    /* inverse back for inverse parity */
    dwt_eaw97_2i_s(img, stride_x, stride_y, nx, ny, nx, ny, jj, 0, 0, wH, wV);
    snprintf(name, sizeof name, "eaw97_2i_f32_%dx%d_j%d", ny, nx, j);
    dump(name, "f32", ny, nx, img, 4);

    for (int lvl = 0; lvl < jj; lvl++) { free(wH[lvl]); free(wV[lvl]); }
    free(img);
}

static void gen_1d_swt(int N)
{
    char name[128];
    float *src = malloc(sizeof(float) * N);
    float *lo = malloc(sizeof(float) * N);
    float *hi = malloc(sizeof(float) * N);

    reset_rand(6000 + N);
    for (int i = 0; i < N; i++) src[i] = frand();
    snprintf(name, sizeof name, "swtx_f32_%d", N);
    dump(name, "f32", 1, N, src, 4);

    for (int level = 0; level < 3; level++) {
        swt_cdf97_f_ex_stride_s(src, lo, hi, N, sizeof(float), level);
        snprintf(name, sizeof name, "swt97_f32_%d_l%d_L", N, level);
        dump(name, "f32", 1, N, lo, 4);
        snprintf(name, sizeof name, "swt97_f32_%d_l%d_H", N, level);
        dump(name, "f32", 1, N, hi, 4);
        swt_cdf53_f_ex_stride_s(src, lo, hi, N, sizeof(float), level);
        snprintf(name, sizeof name, "swt53_f32_%d_l%d_L", N, level);
        dump(name, "f32", 1, N, lo, 4);
        snprintf(name, sizeof name, "swt53_f32_%d_l%d_H", N, level);
        dump(name, "f32", 1, N, hi, 4);
    }
    free(src); free(lo); free(hi);
}

static void gen_2d_float(int ny, int nx, int j)
{
    char name[128];
    const int stride_y = sizeof(float);
    const int stride_x = nx * sizeof(float);
    float *img = malloc((size_t)ny * nx * sizeof(float));

    dwt_util_test_image_fill_s(img, stride_x, stride_y, nx, ny, 0);
    snprintf(name, sizeof name, "img_f32_%dx%d", ny, nx);
    dump(name, "f32", ny, nx, img, 4);

    int jj = j;
    dwt_cdf97_2f_s(img, stride_x, stride_y, nx, ny, nx, ny, &jj, 0, 0);
    snprintf(name, sizeof name, "cdf97_2f_f32_%dx%d_j%d", ny, nx, j);
    dump(name, "f32", ny, nx, img, 4);

    /* round-trip back for inverse parity too */
    dwt_cdf97_2i_s(img, stride_x, stride_y, nx, ny, nx, ny, jj, 0, 0);
    snprintf(name, sizeof name, "cdf97_2i_f32_%dx%d_j%d", ny, nx, j);
    dump(name, "f32", ny, nx, img, 4);

    /* CDF 5/3 */
    dwt_util_test_image_fill_s(img, stride_x, stride_y, nx, ny, 0);
    jj = j;
    dwt_cdf53_2f_s(img, stride_x, stride_y, nx, ny, nx, ny, &jj, 0, 0);
    snprintf(name, sizeof name, "cdf53_2f_f32_%dx%d_j%d", ny, nx, j);
    dump(name, "f32", ny, nx, img, 4);

    free(img);
}

static void gen_2d_int(int ny, int nx, int j)
{
    char name[128];
    const int stride_y = sizeof(int);
    const int stride_x = nx * sizeof(int);
    int *img = malloc((size_t)ny * nx * sizeof(int));

    reset_rand(4000 + ny * 131 + nx);
    for (int i = 0; i < ny * nx; i++) img[i] = (int)(frand() * 255.f);
    snprintf(name, sizeof name, "img_i32_%dx%d", ny, nx);
    dump(name, "i32", ny, nx, img, 4);

    int jj = j;
    dwt_cdf97_2f_i(img, stride_x, stride_y, nx, ny, nx, ny, &jj, 0, 0);
    snprintf(name, sizeof name, "cdf97_2f_i32_%dx%d_j%d", ny, nx, j);
    dump(name, "i32", ny, nx, img, 4);

    reset_rand(4000 + ny * 131 + nx);
    for (int i = 0; i < ny * nx; i++) img[i] = (int)(frand() * 255.f);
    jj = j;
    dwt_cdf53_2f_i(img, stride_x, stride_y, nx, ny, nx, ny, &jj, 0, 0);
    snprintf(name, sizeof name, "cdf53_2f_i32_%dx%d_j%d", ny, nx, j);
    dump(name, "i32", ny, nx, img, 4);

    free(img);
}

/* Sparse-reconstruction parity: in-place forward, then the three
 * inverse border families (plain/mirror, hole, zero;
 * libdwt.h:889-933) on (a) the full coefficient set and (b) an
 * LL-only set with every detail coefficient zeroed. */
static void gen_2d_sparse(int ny, int nx, int j)
{
    char name[128];
    const int stride_y = sizeof(float);
    const int stride_x = nx * sizeof(float);
    float *img = malloc((size_t)ny * nx * sizeof(float));
    float *coef = malloc((size_t)ny * nx * sizeof(float));
    float *work = malloc((size_t)ny * nx * sizeof(float));

    dwt_util_test_image_fill_s(img, stride_x, stride_y, nx, ny, 0);
    memcpy(coef, img, (size_t)ny * nx * sizeof(float));
    int jj = j;
    dwt_cdf97_2f_inplace_s(coef, stride_x, stride_y, nx, ny, nx, ny, &jj, 0, 0);
    snprintf(name, sizeof name, "sparse_src_f32_%dx%d_j%d", ny, nx, j);
    dump(name, "f32", ny, nx, img, 4);

    for (int llonly = 0; llonly < 2; llonly++) {
        float *set = malloc((size_t)ny * nx * sizeof(float));
        memcpy(set, coef, (size_t)ny * nx * sizeof(float));
        if (llonly) { /* keep only the deepest LL (interleaved layout) */
            int step = 1 << jj;
            for (int y = 0; y < ny; y++)
                for (int x = 0; x < nx; x++)
                    if (y % step || x % step)
                        set[y * nx + x] = 0.f;
        }
        const char *tag = llonly ? "llonly" : "full";

        memcpy(work, set, (size_t)ny * nx * sizeof(float));
        dwt_cdf97_2i_inplace_s(work, stride_x, stride_y, nx, ny, nx, ny, jj, 0, 0);
        snprintf(name, sizeof name, "sparse_mirror_%s_f32_%dx%d_j%d", tag, ny, nx, j);
        dump(name, "f32", ny, nx, work, 4);

        memcpy(work, set, (size_t)ny * nx * sizeof(float));
        dwt_cdf97_2i_inplace_hole_s(work, stride_x, stride_y, nx, ny, nx, ny, jj, 0, 0);
        snprintf(name, sizeof name, "sparse_hole_%s_f32_%dx%d_j%d", tag, ny, nx, j);
        dump(name, "f32", ny, nx, work, 4);

        memcpy(work, set, (size_t)ny * nx * sizeof(float));
        dwt_cdf97_2i_inplace_zero_s(work, stride_x, stride_y, nx, ny, nx, ny, jj, 0, 0);
        snprintf(name, sizeof name, "sparse_zero_%s_f32_%dx%d_j%d", tag, ny, nx, j);
        dump(name, "f32", ny, nx, work, 4);
        free(set);
    }
    free(img);
    free(coef);
    free(work);
}

int main(void)
{
    dwt_util_init();
    dwt_util_set_num_threads(1);
    dwt_util_set_accel(0); /* plain C kernels: the semantic ground truth */

    out = fopen("golden.bin", "wb");
    if (!out) return 1;

    int sizes1d[] = {2, 3, 5, 7, 8, 15, 16, 17, 37, 64, 100};
    for (unsigned i = 0; i < sizeof(sizes1d) / sizeof(int); i++) {
        gen_1d_float(sizes1d[i]);
        gen_1d_double(sizes1d[i]);
        gen_1d_int(sizes1d[i]);
    }

    gen_2d_float(16, 16, 1);
    gen_2d_float(16, 16, 3);
    gen_2d_float(17, 13, 2);
    gen_2d_float(32, 32, 5);
    gen_2d_float(33, 31, 4);
    gen_2d_float(64, 48, -1); /* full depth via clamp */
    gen_2d_int(16, 16, 3);
    gen_2d_int(17, 13, 2);
    gen_2d_int(32, 32, 5);
    gen_2d_sparse(32, 32, 2);
    gen_2d_sparse(16, 16, 2);
    gen_2d_sparse(64, 48, 3);

    int sizes_eaw[] = {8, 15, 16, 17, 64, 100};
    for (unsigned i = 0; i < sizeof(sizes_eaw) / sizeof(int); i++) {
        gen_1d_eaw(sizes_eaw[i]);
        gen_1d_swt(sizes_eaw[i]);
    }

    gen_2d_eaw(16, 16, 2);
    gen_2d_eaw(32, 24, 2);

    fclose(out);
    dwt_util_finish();
    return 0;
}
