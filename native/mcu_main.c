/* Standalone on-target smoke for .nvsb bundles: no Python, no JAX.
 *
 *   make -C native mcu_demo
 *   ./native/mcu_demo model.nvsb H W [image.f32]
 *
 * image.f32: optional raw little-endian H*W*3 float32 NHWC file; without
 * it a deterministic synthetic ramp image is used. Prints per-output
 * shape + mean/min/max and the wall time of one inference — the analog
 * of running the reference's model.pte under the ExecuTorch runner.
 */

#define _POSIX_C_SOURCE 199309L
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

typedef struct Bundle Bundle;
extern Bundle *nvsb_load(const char *path);
extern void nvsb_free(Bundle *bd);
extern int nvsb_n_outputs(Bundle *bd);
extern const char *nvsb_output_name(Bundle *bd, int i);
extern int nvsb_run(Bundle *bd, const float *image, int H, int W,
                    float **out, int *out_h, int *out_w, int *out_c);

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s model.nvsb H W [image.f32]\n", argv[0]);
        return 2;
    }
    int H = atoi(argv[2]), W = atoi(argv[3]);
    Bundle *bd = nvsb_load(argv[1]);
    if (!bd) { fprintf(stderr, "failed to load %s\n", argv[1]); return 1; }

    float *img = (float *)malloc(sizeof(float) * (size_t)H * W * 3);
    if (argc > 4) {
        FILE *f = fopen(argv[4], "rb");
        if (!f || fread(img, sizeof(float), (size_t)H * W * 3, f)
            != (size_t)H * W * 3) {
            fprintf(stderr, "failed to read %s\n", argv[4]);
            return 1;
        }
        fclose(f);
    } else {
        for (int h = 0; h < H; h++)
            for (int w = 0; w < W; w++)
                for (int c = 0; c < 3; c++)
                    img[(h * W + w) * 3 + c] =
                        0.5f + 0.4f * sinf(0.3f * h + 0.7f * w + c);
    }

    int n = nvsb_n_outputs(bd);
    int oh[8], ow[8], oc[8];
    int mrc = nvsb_run(bd, img, H, W, NULL, oh, ow, oc); /* metadata */
    if (mrc != 0) {
        fprintf(stderr, "metadata pass rc=%d (input %dx%d not divisible "
                "by the downsample cell, or concat mismatch)\n",
                mrc, H, W);
        return 1;
    }
    float *bufs[8];
    for (int i = 0; i < n; i++)
        bufs[i] = (float *)malloc(sizeof(float) * (size_t)oh[i] * ow[i]
                                  * oc[i]);

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    int rc = nvsb_run(bd, img, H, W, bufs, oh, ow, oc);
    clock_gettime(CLOCK_MONOTONIC, &t1);
    if (rc != 0) { fprintf(stderr, "run failed rc=%d\n", rc); return 1; }
    double ms = (t1.tv_sec - t0.tv_sec) * 1e3
                + (t1.tv_nsec - t0.tv_nsec) / 1e6;

    for (int i = 0; i < n; i++) {
        int64_t len = (int64_t)oh[i] * ow[i] * oc[i];
        double mean = 0, mn = INFINITY, mx = -INFINITY;
        for (int64_t p = 0; p < len; p++) {
            double v = bufs[i][p];
            mean += v;
            if (v < mn) mn = v;
            if (v > mx) mx = v;
        }
        printf("%-8s (%d, %d, %d) mean=%.5f min=%.5f max=%.5f\n",
               nvsb_output_name(bd, i), oh[i], ow[i], oc[i],
               mean / (double)len, mn, mx);
        free(bufs[i]);
    }
    printf("inference: %.2f ms (%dx%d)\n", ms, H, W);
    free(img);
    nvsb_free(bd);
    return 0;
}
