/* Native host-side runtime helpers for supersampler_tpu.
 *
 * This library holds the bit-exactness-critical scalar routines that
 * cannot be reproduced faithfully from Python (80-bit long double math)
 * and fast host-side codecs used by the IO layer.
 *
 * Built as a shared library, loaded via ctypes (no pybind11 dependency).
 */

#include <math.h>
#include <stdint.h>
#include <stddef.h>
#include <string.h>

/* FHS selection threshold, exactly as the reference computes it
 * (reference SubSampler.cpp:622-631): all intermediates in long double,
 * truncate to uint64, then double. */
uint64_t spsp_threshold(uint64_t k, uint64_t m, double sampling_rate) {
    if (sampling_rate <= 1.0) return (uint64_t)-1;
    uint64_t mmerinkmer = k - m + 1;
    long double fraction = (long double)1 / sampling_rate;
    long double root = powl((long double)1 - fraction,
                            (long double)1 / mmerinkmer);
    long double result = ((long double)1 - root) * ((uint64_t)1 << 63);
    return (uint64_t)result * 2;
}

/* XXHash64 over the 8 LE bytes of x with the given seed
 * (reference include/xxhash64.h:158-163, 8-byte specialization). */
static const uint64_t P1 = 11400714785074694791ULL;
static const uint64_t P2 = 14029467366897019727ULL;
static const uint64_t P3 = 1609587929392839161ULL;
static const uint64_t P4 = 9650029242287828579ULL;
static const uint64_t P5 = 2870177450012600261ULL;

static inline uint64_t rotl(uint64_t x, int r) {
    return (x << r) | (x >> (64 - r));
}

uint64_t spsp_xxh64_u64(uint64_t x, uint64_t seed) {
    uint64_t h = seed + P5 + 8;
    uint64_t single = rotl(x * P2, 31) * P1;
    h = rotl(h ^ single, 27) * P1 + P4;
    h ^= h >> 33; h *= P2; h ^= h >> 29; h *= P3; h ^= h >> 32;
    return h;
}

/* Vectorized hash over n input values (host-side batch helper). */
void spsp_xxh64_u64_batch(const uint64_t* in, uint64_t* out, size_t n,
                          uint64_t seed) {
    for (size_t i = 0; i < n; ++i) out[i] = spsp_xxh64_u64(in[i], seed);
}

/* 2-bit encode: ASCII -> (c/2)%4 (reference utils.cpp:13-16). */
void spsp_encode2bit(const unsigned char* in, unsigned char* out, size_t n) {
    for (size_t i = 0; i < n; ++i) out[i] = (in[i] / 2) & 3;
}

/* Event-chain walker: follow successor links from the initial state
 * (see supersampler_tpu/ops/minimizer.py). Types: 0 = adoption,
 * 1 = rescan. Returns the number of events written. */
int64_t spsp_walk_chain(const int32_t* nxt_pos_a,
                        const unsigned char* nxt_adopt_a,
                        const int32_t* nxt_pos_r,
                        const unsigned char* nxt_adopt_r,
                        int32_t init_pos, unsigned char init_adopt,
                        int32_t* out_pos, unsigned char* out_type,
                        int64_t max_out) {
    int64_t n = 0;
    int32_t p = init_pos;
    unsigned char ty = init_adopt ? 0 : 1;
    while (p >= 0 && n < max_out) {
        out_pos[n] = p;
        out_type[n] = ty;
        n++;
        int32_t np;
        unsigned char na;
        if (ty == 0) { np = nxt_pos_a[p]; na = nxt_adopt_a[p]; }
        else         { np = nxt_pos_r[p]; na = nxt_adopt_r[p]; }
        p = np;
        ty = na ? 0 : 1;
    }
    return n;
}

/* clean_dna compaction: keep ACGTacgt, uppercase, return new length
 * (reference utils.cpp:675-702). */
size_t spsp_clean_dna(const unsigned char* in, unsigned char* out, size_t n) {
    static const unsigned char up[256] = {0};
    size_t j = 0;
    (void)up;
    for (size_t i = 0; i < n; ++i) {
        unsigned char c = in[i];
        switch (c) {
            case 'a': case 'c': case 'g': case 't':
                out[j++] = (unsigned char)(c - 32); break;
            case 'A': case 'C': case 'G': case 'T':
                out[j++] = c; break;
            default: break;
        }
    }
    return j;
}
