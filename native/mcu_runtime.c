/* MCU deployment runtime for KP2DTiny bundles (.nvsb).
 *
 * TPU-native analog of the reference's ExecuTorch path
 * (/root/reference/quantize.py:18-56): the reference lowers the
 * torch-quantized graph to a .pte flatbuffer executed by the ExecuTorch
 * C++ runtime on MCU. Here the deployment artifact is a single .nvsb
 * file (ASCII op manifest + raw little-endian blobs, written by
 * nanovs_slam_tpu/deploy.py) and THIS file is the runtime: dependency-free
 * C99, int8 conv arithmetic identical to quant.int8_conv (symmetric
 * per-output-channel weights, round-half-to-even activation quantization,
 * int32 accumulation), folded inference BatchNorm, and the exact MCU-config
 * op set (conv3x3, maxpool2x2, ConvTranspose k3 s2 p1 op1, concat,
 * sigmoid/tanh). Parity with the JAX int8_execution forward is pinned by
 * tests/test_deploy_bundle.py.
 *
 * Build: make -C native libmcu.so   (or compile standalone on the target)
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define MAX_OPS 64
#define MAX_TENSORS 64
#define MAX_OUTPUTS 8
#define LEAKY_SLOPE 0.01f

typedef struct {
    int kind;       /* 0 conv8, 1 convbn(f32), 2 convf, 3 pool, 4 tconv,
                       5 concat, 6 sigmoid, 7 tanh */
    int in0, in1, out;
    int cin, cin1, cout;
    int act;        /* 0 none, 1 relu, 2 leaky(0.01) */
    float in_scale; /* conv8: activation quantization scale */
    int64_t off_w, off_s, off_a, off_b;
} Op;

typedef struct {
    char name[32];
    int tid;
} OutputSpec;

typedef struct {
    Op ops[MAX_OPS];
    int n_ops;
    OutputSpec outputs[MAX_OUTPUTS];
    int n_outputs;
    unsigned char *data;
    int64_t data_len;
    int in_channels;
} Bundle;

typedef struct {
    float *buf;
    int h, w, c;
} Tensor;

static float actf(float v, int act) {
    if (act == 1) return v > 0.f ? v : 0.f;
    if (act == 2) return v > 0.f ? v : LEAKY_SLOPE * v;
    return v;
}

/* ---------------------------------------------------------------- ops -- */

/* int8 conv3x3 SAME + folded BN + act. Weights laid out [O][3][3][I] int8,
 * per-O scale s_w; input quantized with rintf (round-half-to-even under the
 * default FP environment, matching jnp.round). Accumulation in int32 is
 * exact, so the integer part is bit-identical to the XLA lowering. */
static void conv8(const Tensor *x, Tensor *y, const int8_t *w,
                  const float *s_w, const float *a, const float *b,
                  float s_in, int cout, int act) {
    int H = x->h, W = x->w, C = x->c;
    int8_t *xq = (int8_t *)malloc((size_t)H * W * C);
    for (int64_t i = 0; i < (int64_t)H * W * C; i++) {
        float q = rintf(x->buf[i] / s_in);
        xq[i] = (int8_t)(q > 127.f ? 127 : (q < -127.f ? -127 : q));
    }
    y->h = H; y->w = W; y->c = cout;
    for (int h = 0; h < H; h++)
        for (int wi = 0; wi < W; wi++)
            for (int o = 0; o < cout; o++) {
                int32_t acc = 0;
                const int8_t *wo = w + (int64_t)o * 9 * C;
                for (int kh = 0; kh < 3; kh++) {
                    int ih = h + kh - 1;
                    if (ih < 0 || ih >= H) continue;
                    for (int kw = 0; kw < 3; kw++) {
                        int iw = wi + kw - 1;
                        if (iw < 0 || iw >= W) continue;
                        const int8_t *xp = xq + ((int64_t)ih * W + iw) * C;
                        const int8_t *wp = wo + (kh * 3 + kw) * C;
                        for (int i = 0; i < C; i++) acc += (int32_t)xp[i] * wp[i];
                    }
                }
                float v = (float)acc * (s_in * s_w[o]);
                v = a[o] * v + b[o];
                y->buf[((int64_t)h * W + wi) * cout + o] = actf(v, act);
            }
    free(xq);
}

/* f32 conv3x3 SAME; bn!=0: folded BN (a,b) + act; bn==0: bias add only.
 * Weights [O][3][3][I] f32. */
static void convf32(const Tensor *x, Tensor *y, const float *w,
                    const float *a, const float *b, int cout, int act,
                    int bn) {
    int H = x->h, W = x->w, C = x->c;
    y->h = H; y->w = W; y->c = cout;
    for (int h = 0; h < H; h++)
        for (int wi = 0; wi < W; wi++)
            for (int o = 0; o < cout; o++) {
                float acc = 0.f;
                const float *wo = w + (int64_t)o * 9 * C;
                for (int kh = 0; kh < 3; kh++) {
                    int ih = h + kh - 1;
                    if (ih < 0 || ih >= H) continue;
                    for (int kw = 0; kw < 3; kw++) {
                        int iw = wi + kw - 1;
                        if (iw < 0 || iw >= W) continue;
                        const float *xp = x->buf + ((int64_t)ih * W + iw) * C;
                        const float *wp = wo + (kh * 3 + kw) * C;
                        for (int i = 0; i < C; i++) acc += xp[i] * wp[i];
                    }
                }
                float v = bn ? a[o] * acc + b[o] : acc + b[o];
                y->buf[((int64_t)h * W + wi) * cout + o] = actf(v, act);
            }
}

static void pool2x2(const Tensor *x, Tensor *y) {
    int H = x->h / 2, W = x->w / 2, C = x->c;
    y->h = H; y->w = W; y->c = C;
    for (int h = 0; h < H; h++)
        for (int w = 0; w < W; w++)
            for (int c = 0; c < C; c++) {
                float m = -INFINITY;
                for (int dh = 0; dh < 2; dh++)
                    for (int dw = 0; dw < 2; dw++) {
                        float v = x->buf[(((int64_t)(2 * h + dh)) * x->w
                                          + 2 * w + dw) * C + c];
                        if (v > m) m = v;
                    }
                y->buf[((int64_t)h * W + w) * C + c] = m;
            }
}

/* ConvTranspose2d(k3, s2, p1, op1): out (2H, 2W). Scatter form:
 * out[2*ih+kh-1, 2*iw+kw-1, o] += x[ih, iw, i] * w[o, kh, kw, i]
 * (torch semantics == flax conv_transpose with transpose_kernel=True,
 * padding ((1,2),(1,2)); see modules/blocks.TransposedConvKernel).
 * Followed by folded BN + act. */
static void tconv(const Tensor *x, Tensor *y, const float *w,
                  const float *a, const float *b, int cout, int act) {
    int H = x->h, W = x->w, C = x->c, OH = 2 * H, OW = 2 * W;
    y->h = OH; y->w = OW; y->c = cout;
    memset(y->buf, 0, sizeof(float) * (size_t)OH * OW * cout);
    for (int ih = 0; ih < H; ih++)
        for (int iw = 0; iw < W; iw++) {
            const float *xp = x->buf + ((int64_t)ih * W + iw) * C;
            for (int kh = 0; kh < 3; kh++) {
                int oh = 2 * ih + kh - 1;
                if (oh < 0 || oh >= OH) continue;
                for (int kw = 0; kw < 3; kw++) {
                    int ow = 2 * iw + kw - 1;
                    if (ow < 0 || ow >= OW) continue;
                    float *yp = y->buf + ((int64_t)oh * OW + ow) * cout;
                    for (int o = 0; o < cout; o++) {
                        const float *wp = w + (((int64_t)o * 3 + kh) * 3 + kw) * C;
                        float acc = 0.f;
                        for (int i = 0; i < C; i++) acc += xp[i] * wp[i];
                        yp[o] += acc;
                    }
                }
            }
        }
    for (int64_t p = 0; p < (int64_t)OH * OW; p++)
        for (int o = 0; o < cout; o++) {
            float v = a[o] * y->buf[p * cout + o] + b[o];
            y->buf[p * cout + o] = actf(v, act);
        }
}

/* ------------------------------------------------------------- bundle -- */

static int parse_manifest(FILE *f, Bundle *bd) {
    char line[512];
    bd->n_ops = 0; bd->n_outputs = 0; bd->in_channels = 3;
    while (fgets(line, sizeof line, f)) {
        if (strncmp(line, "DATA", 4) == 0) return 0;
        Op *op = &bd->ops[bd->n_ops];
        memset(op, 0, sizeof *op);
        op->in1 = -1;
        long long w = 0, s = 0, aa = 0, b = 0;
        if (sscanf(line, "input %d", &bd->in_channels) == 1) continue;
        if (sscanf(line, "conv8 %d %d %d %d %f %d %lld %lld %lld %lld",
                   &op->in0, &op->out, &op->cin, &op->cout, &op->in_scale,
                   &op->act, &w, &s, &aa, &b) == 10) op->kind = 0;
        else if (sscanf(line, "convbn %d %d %d %d %d %lld %lld %lld",
                        &op->in0, &op->out, &op->cin, &op->cout, &op->act,
                        &w, &aa, &b) == 8) op->kind = 1;
        else if (sscanf(line, "convf %d %d %d %d %lld %lld",
                        &op->in0, &op->out, &op->cin, &op->cout, &w, &b) == 6)
            op->kind = 2;
        else if (sscanf(line, "pool %d %d %d", &op->in0, &op->out,
                        &op->cin) == 3) op->kind = 3;
        else if (sscanf(line, "tconv %d %d %d %d %d %lld %lld %lld",
                        &op->in0, &op->out, &op->cin, &op->cout, &op->act,
                        &w, &aa, &b) == 8) op->kind = 4;
        else if (sscanf(line, "concat %d %d %d %d %d", &op->in0, &op->in1,
                        &op->out, &op->cin, &op->cin1) == 5) op->kind = 5;
        else if (sscanf(line, "sigmoid %d %d %d", &op->in0, &op->out,
                        &op->cin) == 3) op->kind = 6;
        else if (sscanf(line, "tanh %d %d %d", &op->in0, &op->out,
                        &op->cin) == 3) op->kind = 7;
        else if (strncmp(line, "out ", 4) == 0) {
            if (bd->n_outputs >= MAX_OUTPUTS) return -1;
            OutputSpec *o = &bd->outputs[bd->n_outputs];
            if (sscanf(line, "out %31s %d", o->name, &o->tid) == 2) {
                if (o->tid < 0 || o->tid >= MAX_TENSORS) return -1;
                bd->n_outputs++;
            }
            continue;
        } else continue;  /* comment / blank */
        /* tensor ids index the fixed ts[] array in nvsb_run — a corrupt
         * manifest must fail to LOAD, not write out of bounds */
        if (op->in0 < 0 || op->in0 >= MAX_TENSORS ||
            op->out < 0 || op->out >= MAX_TENSORS ||
            (op->kind == 5 && (op->in1 < 0 || op->in1 >= MAX_TENSORS)))
            return -1;
        if (op->cin < 0 || op->cout < 0 || op->cin > 65536 ||
            op->cout > 65536)
            return -1;
        op->off_w = w; op->off_s = s; op->off_a = aa; op->off_b = b;
        if (bd->n_ops + 1 >= MAX_OPS) return -1;
        bd->n_ops++;
    }
    return -1; /* no DATA section */
}

/* Reject blob references outside the DATA section (truncated/corrupt
 * bundle => load error instead of an out-of-bounds read at run time). */
static int validate_blobs(const Bundle *bd) {
    for (int k = 0; k < bd->n_ops; k++) {
        const Op *op = &bd->ops[k];
        int64_t wsz = 0, par = 4LL * op->cout; /* per-channel f32 vecs */
        switch (op->kind) {
        case 0: wsz = 9LL * op->cin * op->cout; break;      /* int8 */
        case 1: case 2: case 4:
            wsz = 4LL * 9 * op->cin * op->cout; break;      /* f32 */
        default: continue;                                  /* no blobs */
        }
        if (op->off_w < 0 || op->off_w + wsz > bd->data_len) return -1;
        if (op->kind == 0 &&
            (op->off_s < 0 || op->off_s + par > bd->data_len)) return -1;
        if (op->kind != 2 &&
            (op->off_a < 0 || op->off_a + par > bd->data_len)) return -1;
        if (op->off_b < 0 || op->off_b + par > bd->data_len) return -1;
    }
    return 0;
}

void nvsb_free(Bundle *bd);

Bundle *nvsb_load(const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) return NULL;
    char magic[16];
    if (!fgets(magic, sizeof magic, f) ||
        strncmp(magic, "NVSBNDL1", 8) != 0) { fclose(f); return NULL; }
    Bundle *bd = (Bundle *)calloc(1, sizeof(Bundle));
    if (parse_manifest(f, bd) != 0) { free(bd); fclose(f); return NULL; }
    long start = ftell(f);
    fseek(f, 0, SEEK_END);
    bd->data_len = ftell(f) - start;
    fseek(f, start, SEEK_SET);
    bd->data = (unsigned char *)malloc((size_t)bd->data_len);
    if (fread(bd->data, 1, (size_t)bd->data_len, f)
        != (size_t)bd->data_len) {
        free(bd->data); free(bd); fclose(f); return NULL;
    }
    fclose(f);
    if (validate_blobs(bd) != 0) { nvsb_free(bd); return NULL; }
    return bd;
}

void nvsb_free(Bundle *bd) {
    if (bd) { free(bd->data); free(bd); }
}

int nvsb_n_outputs(Bundle *bd) { return bd->n_outputs; }

/* Output i metadata: name copied into `name` (cap bytes), channels
 * returned; spatial dims depend on input size — see nvsb_run. */
const char *nvsb_output_name(Bundle *bd, int i) {
    return bd->outputs[i].name;
}

/* Run the graph on an H x W x C f32 NHWC image. Outputs are written into
 * caller buffers out[i] (each sized out_h[i]*out_w[i]*out_c[i] as returned
 * by a first metadata pass with out==NULL). Returns 0 on success. */
int nvsb_run(Bundle *bd, const float *image, int H, int W,
             float **out, int *out_h, int *out_w, int *out_c) {
    Tensor ts[MAX_TENSORS];
    memset(ts, 0, sizeof ts);
    ts[0].h = H; ts[0].w = W; ts[0].c = bd->in_channels;
    /* shape inference pass. Odd-at-pool input sizes make the tconv
     * output (2*floor) and the skip tensor diverge; the concat check
     * below turns that into a load-time rc instead of a silent
     * misaligned read (the numpy/JAX paths raise loudly in the same
     * case). */
    for (int k = 0; k < bd->n_ops; k++) {
        Op *op = &bd->ops[k];
        Tensor *x = &ts[op->in0], *y = &ts[op->out];
        switch (op->kind) {
        case 0: case 1: case 2:
            y->h = x->h; y->w = x->w; y->c = op->cout; break;
        case 3:
            if ((x->h & 1) || (x->w & 1)) return -2;
            y->h = x->h / 2; y->w = x->w / 2; y->c = x->c; break;
        case 4: y->h = 2 * x->h; y->w = 2 * x->w; y->c = op->cout; break;
        case 5: {
            Tensor *x1 = &ts[op->in1];
            if (x->h != x1->h || x->w != x1->w) return -2;
            y->h = x->h; y->w = x->w; y->c = op->cin + op->cin1; break;
        }
        default: y->h = x->h; y->w = x->w; y->c = x->c; break;
        }
    }
    for (int i = 0; i < bd->n_outputs; i++) {
        Tensor *t = &ts[bd->outputs[i].tid];
        out_h[i] = t->h; out_w[i] = t->w; out_c[i] = t->c;
    }
    if (!out) return 0; /* metadata-only pass */

    for (int i = 0; i < MAX_TENSORS; i++)
        if (ts[i].h)
            ts[i].buf = (float *)malloc(sizeof(float) * (size_t)ts[i].h
                                        * ts[i].w * ts[i].c);
    memcpy(ts[0].buf, image,
           sizeof(float) * (size_t)H * W * bd->in_channels);

    for (int k = 0; k < bd->n_ops; k++) {
        Op *op = &bd->ops[k];
        Tensor *x = &ts[op->in0], *y = &ts[op->out];
        const unsigned char *d = bd->data;
        switch (op->kind) {
        case 0:
            conv8(x, y, (const int8_t *)(d + op->off_w),
                  (const float *)(d + op->off_s),
                  (const float *)(d + op->off_a),
                  (const float *)(d + op->off_b),
                  op->in_scale, op->cout, op->act);
            break;
        case 1:
            convf32(x, y, (const float *)(d + op->off_w),
                    (const float *)(d + op->off_a),
                    (const float *)(d + op->off_b), op->cout, op->act, 1);
            break;
        case 2:
            convf32(x, y, (const float *)(d + op->off_w), NULL,
                    (const float *)(d + op->off_b), op->cout, 0, 0);
            break;
        case 3: pool2x2(x, y); break;
        case 4:
            tconv(x, y, (const float *)(d + op->off_w),
                  (const float *)(d + op->off_a),
                  (const float *)(d + op->off_b), op->cout, op->act);
            break;
        case 5: {
            Tensor *x1 = &ts[op->in1];
            int C0 = x->c, C1 = x1->c;
            for (int64_t p = 0; p < (int64_t)y->h * y->w; p++) {
                memcpy(y->buf + p * (C0 + C1), x->buf + p * C0,
                       sizeof(float) * C0);
                memcpy(y->buf + p * (C0 + C1) + C0, x1->buf + p * C1,
                       sizeof(float) * C1);
            }
            break;
        }
        case 6:
            for (int64_t p = 0; p < (int64_t)x->h * x->w * x->c; p++)
                y->buf[p] = 1.f / (1.f + expf(-x->buf[p]));
            break;
        case 7:
            for (int64_t p = 0; p < (int64_t)x->h * x->w * x->c; p++)
                y->buf[p] = tanhf(x->buf[p]);
            break;
        }
    }
    for (int i = 0; i < bd->n_outputs; i++) {
        Tensor *t = &ts[bd->outputs[i].tid];
        memcpy(out[i], t->buf,
               sizeof(float) * (size_t)t->h * t->w * t->c);
    }
    for (int i = 0; i < MAX_TENSORS; i++) free(ts[i].buf);
    return 0;
}
