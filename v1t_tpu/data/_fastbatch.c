/* Native host-side batch assembly for the packed-array data path.
 *
 * The Python pipeline (datasets.py get_batch) assembles a batch as
 *   gather rows -> (x - mean) / std -> optional gray reduce -> dtype cast
 * through four full-size numpy temporaries per batch (~25 ms at the
 * Sensorium shapes, single thread). On an 8-chip slice the host must
 * sustain >4,800 images/s (BENCH_NOTES.md input-pipeline headroom), so the
 * whole chain is fused here into one multithreaded pass: each output row is
 * produced by a single read of its source row, normalized in the SAME
 * arithmetic the numpy path uses (float64 when numpy type promotion selects
 * it, see fastbatch.py), and written once as fp32 or round-to-nearest-even
 * bf16. Loaded via ctypes (fastbatch.py builds it with g++ on first use);
 * every call site keeps the pure-numpy fallback.
 *
 * Semantics pinned by tests/test_fastbatch.py: bit-exact equality with the
 * numpy reference path for every mode.
 */

#include <stdint.h>
#include <string.h>

#ifdef _OPENMP
#include <omp.h>
#endif

#define EXPORT __attribute__((visibility("default")))

/* float32 -> bfloat16 with round-to-nearest-even — the same conversion
 * ml_dtypes uses for ndarray.astype(bfloat16). */
static inline uint16_t f32_to_bf16(float f) {
    uint32_t bits;
    memcpy(&bits, &f, sizeof(bits));
    if ((bits & 0x7fffffffu) > 0x7f800000u) { /* NaN: quiet, keep sign */
        return (uint16_t)((bits >> 16) | 0x0040u);
    }
    uint32_t lsb = (bits >> 16) & 1u;
    bits += 0x7fffu + lsb;
    return (uint16_t)(bits >> 16);
}

/* Gather rows `idx` from a packed (num_rows, channels * hw) float32 array
 * and standardize: out = (x - mean) / std, optionally averaging the
 * channel axis to one (franke2022 gray_scale, datasets.py color2gray).
 *
 * mean/std are per-element arrays of length channels*hw (broadcast by the
 * caller from the scalar/per-channel statistics). use_double selects
 * float64 intermediate arithmetic to mirror numpy's promotion when the
 * statistics arrays are float64. out_bf16 selects the wire dtype.
 */
EXPORT void v1t_gather_image(
    const float *src, int64_t row_elems, const int64_t *idx, int64_t n,
    const double *mean, const double *stdv, int use_double,
    int64_t channels, int64_t hw, int reduce_gray, int out_bf16, void *out) {
    const int64_t out_elems = reduce_gray ? hw : row_elems;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; ++i) {
        const float *row = src + idx[i] * row_elems;
        float *out_f32 = (float *)out + i * out_elems;
        uint16_t *out_b16 = (uint16_t *)out + i * out_elems;
        if (!reduce_gray) {
            for (int64_t j = 0; j < row_elems; ++j) {
                float v;
                if (use_double) {
                    v = (float)(((double)row[j] - mean[j]) / stdv[j]);
                } else {
                    v = (row[j] - (float)mean[j]) / (float)stdv[j];
                }
                if (out_bf16) out_b16[j] = f32_to_bf16(v);
                else out_f32[j] = v;
            }
        } else {
            /* np.mean over the channel axis accumulates in the working
             * dtype: float64 when the normalized image is float64 (float64
             * stats), else float32 pairwise — channels<=4 so a simple
             * ordered sum matches numpy's float32 reduction exactly. */
            for (int64_t p = 0; p < hw; ++p) {
                float v;
                if (use_double) {
                    double acc = 0.0;
                    for (int64_t c = 0; c < channels; ++c) {
                        int64_t j = c * hw + p;
                        acc += ((double)row[j] - mean[j]) / stdv[j];
                    }
                    v = (float)(acc / (double)channels);
                } else {
                    float acc = 0.0f;
                    for (int64_t c = 0; c < channels; ++c) {
                        int64_t j = c * hw + p;
                        acc += (row[j] - (float)mean[j]) / (float)stdv[j];
                    }
                    v = acc / (float)channels;
                }
                if (out_bf16) out_b16[p] = f32_to_bf16(v);
                else out_f32[p] = v;
            }
        }
    }
}

/* Gather rows and scale each column: out[i, j] = src[idx[i], j] * scale[j]
 * (the response-precision transform, datasets.py transform_response). */
EXPORT void v1t_gather_scale(
    const float *src, int64_t cols, const int64_t *idx, int64_t n,
    const float *scale, float *out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; ++i) {
        const float *row = src + idx[i] * cols;
        float *dst = out + i * cols;
        for (int64_t j = 0; j < cols; ++j) dst[j] = row[j] * scale[j];
    }
}

/* Plain row gather (behavior/pupil fields stay numpy-transformed — they are
 * tiny — but gathering via the same mmap walk keeps one code path). */
EXPORT void v1t_gather_rows(
    const float *src, int64_t cols, const int64_t *idx, int64_t n,
    float *out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; ++i) {
        memcpy(out + i * cols, src + idx[i] * cols, (size_t)cols * sizeof(float));
    }
}

EXPORT int v1t_fastbatch_abi_version(void) { return 1; }
