/* Native data-plane kernels for the host feature pipeline.
 *
 * The TPU feeds from host-assembled feature batches; string hashing is the
 * per-sample hot loop (reference: Go hash/fnv in HashOneHot32,
 * /root/reference/feature/multihot.go:26-49 — compiled Go; the Python loop
 * equivalent is ~50x slower, so this tier restores compiled-language speed).
 *
 * Strings arrive as one packed UTF-8 buffer + (n+1) offsets, so the ctypes
 * boundary moves two pointers instead of n PyObjects.
 *
 * Build: cc -O3 -shared -fPIC fnv.c -o _fnv.so  (see native/build.py)
 */
#include <stdint.h>
#include <stddef.h>

#define FNV_OFFSET32 0x811C9DC5u
#define FNV_PRIME32 0x01000193u

static inline uint32_t fnv1_32(const uint8_t *p, int64_t len) {
    uint32_t h = FNV_OFFSET32;
    for (int64_t i = 0; i < len; i++) {
        h *= FNV_PRIME32;
        h ^= p[i];
    }
    return h;
}

static inline uint32_t fnv1a_32(const uint8_t *p, int64_t len) {
    uint32_t h = FNV_OFFSET32;
    for (int64_t i = 0; i < len; i++) {
        h ^= p[i];
        h *= FNV_PRIME32;
    }
    return h;
}

/* out[i] = fnv1_32(buf[offsets[i]:offsets[i+1]]) */
void fnv1_32_batch(const uint8_t *buf, const int64_t *offsets, int64_t n,
                   uint32_t *out) {
    for (int64_t i = 0; i < n; i++)
        out[i] = fnv1_32(buf + offsets[i], offsets[i + 1] - offsets[i]);
}

void fnv1a_32_batch(const uint8_t *buf, const int64_t *offsets, int64_t n,
                    uint32_t *out) {
    for (int64_t i = 0; i < n; i++)
        out[i] = fnv1a_32(buf + offsets[i], offsets[i + 1] - offsets[i]);
}

/* out[i] = fnv1_32(value_i) % size  (HashOneHot32 bucket assignment) */
void hash_bucket_batch(const uint8_t *buf, const int64_t *offsets, int64_t n,
                       int32_t size, int32_t *out) {
    for (int64_t i = 0; i < n; i++)
        out[i] = (int32_t)(fnv1_32(buf + offsets[i],
                                   offsets[i + 1] - offsets[i]) %
                           (uint32_t)size);
}

/* Dense multi-hot rows: for each input string, split on `sep`, lowercase
 * each token (ASCII; multi-byte UTF-8 passes through unchanged, matching
 * Go strings.ToLower for ASCII genre data), set out[i*size + bucket] = 1.
 * (StringSplitMultiHot multihot.go:37-49.) out must be zeroed by caller. */
void multihot_batch(const uint8_t *buf, const int64_t *offsets, int64_t n,
                    uint8_t sep, int32_t size, float *out) {
    for (int64_t i = 0; i < n; i++) {
        const uint8_t *p = buf + offsets[i];
        int64_t len = offsets[i + 1] - offsets[i];
        int64_t start = 0;
        for (int64_t j = 0; j <= len; j++) {
            if (j == len || p[j] == sep) {
                uint32_t h = FNV_OFFSET32;
                for (int64_t k = start; k < j; k++) {
                    uint8_t c = p[k];
                    if (c >= 'A' && c <= 'Z') c += 32;
                    h *= FNV_PRIME32;
                    h ^= c;
                }
                out[i * size + (int32_t)(h % (uint32_t)size)] = 1.0f;
                start = j + 1;
            }
        }
    }
}

/* Row gather+concat: X[r] = concat(blockA[idxA[r]], blockB[idxB[r]], ...)
 * expressed as a single generic primitive: copy rows of `src` (row width w)
 * selected by idx into the strided destination at column offset `col`.
 * Drives batched sample assembly (rcmd.go:375-397's goroutine fan-out
 * becomes one C pass per feature block). */
void gather_rows(const float *src, const int64_t *idx, int64_t n,
                 int64_t w, float *dst, int64_t dst_stride, int64_t col) {
    for (int64_t r = 0; r < n; r++) {
        const float *s = src + idx[r] * w;
        float *d = dst + r * dst_stride + col;
        for (int64_t j = 0; j < w; j++) d[j] = s[j];
    }
}
