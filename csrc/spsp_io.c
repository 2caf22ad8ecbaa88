/* Native host-side input prep for the sketch pipeline.
 *
 * Replicates the reference's parse semantics (clean_dna strips every
 * non-ACGT byte and uppercases, JOINING flanks — reference
 * utils.cpp:675-702) and the pipeline's 2-bit packing for the H2D
 * link, as single C passes instead of Python translate + concatenate
 * + numpy fold over multi-MB temporaries.  The launcher thread is on
 * the e2e critical path once the device kernels outrun it.
 *
 * Code mapping: nuc2int(c) = (c/2)%4 -> A=0, C=1, T=2, G=3
 * (reference utils.cpp:13-16).
 */

#include <stdint.h>
#include <string.h>

/* Clean raw record bytes: keep ACGT/acgt only, uppercased into
 * ref_out, with the 2-bit code of each kept base in codes_out.
 * ref_out/codes_out must hold n bytes.  Returns the cleaned length. */
int64_t spsp_clean_codes(const uint8_t *raw, int64_t n,
                         uint8_t *ref_out, uint8_t *codes_out)
{
    static uint8_t lut[256];
    static int lut_ready = 0;
    if (!lut_ready) {
        memset(lut, 0xFF, sizeof lut);
        lut['A'] = lut['a'] = 0;
        lut['C'] = lut['c'] = 1;
        lut['T'] = lut['t'] = 2;
        lut['G'] = lut['g'] = 3;
        lut_ready = 1;
    }
    static const uint8_t up[4] = {'A', 'C', 'T', 'G'};
    int64_t o = 0;
    for (int64_t i = 0; i < n; i++) {
        uint8_t c = lut[raw[i]];
        if (c != 0xFF) {
            ref_out[o] = up[c];
            codes_out[o] = c;
            o++;
        }
    }
    return o;
}

/* One-pass clean + pack: raw record bytes (headers stripped, newlines
 * still embedded) -> uppercased ACGT ref bytes AND the 2-bit packed
 * slab the device consumes, in a single traversal.  Replaces the
 * clean_codes + pack_halo pair (two extra multi-MB passes + Python
 * copies) on the sketch pipeline's prep stage.
 *
 * The 2-bit code is (c>>1)&3 for any of ACGTacgt (reference
 * utils.cpp:13-16: nuc2int(c) = (c/2)%4, case-insensitive since
 * 'a'-'A' = 32 keeps bit 1 fixed); uppercasing is c & 0xDF.
 *
 * packed_out must hold (halo+padded)/4 bytes (halo, padded multiples
 * of 4) and is fully zeroed first, so tail fill and the slow path's
 * |= both work.  ref_out must hold n bytes.  Returns the cleaned
 * length o (always <= n; caller guarantees n + margin <= padded). */
int64_t spsp_clean_pack(const uint8_t *raw, int64_t n,
                        uint8_t *ref_out, uint8_t *packed_out,
                        int64_t halo, int64_t padded)
{
    static uint8_t ok[256];
    static int ok_ready = 0;
    if (!ok_ready) {
        memset(ok, 0, sizeof ok);
        ok['A'] = ok['C'] = ok['G'] = ok['T'] = 1;
        ok['a'] = ok['c'] = ok['g'] = ok['t'] = 1;
        ok_ready = 1;
    }
    memset(packed_out, 0, (halo + padded) >> 2);
    uint8_t *pk = packed_out + (halo >> 2);
    int64_t o = 0, i = 0;
    /* SWAR helpers: per-byte 'all bytes equal one of ACGT' and the
     * 2-bit pack, 8 input bytes -> 2 packed bytes per uint64. */
    const uint64_t DF = 0xDFDFDFDFDFDFDFDFULL;
    const uint64_t LO = 0x0101010101010101ULL;
    const uint64_t HI = 0x8080808080808080ULL;
    const uint64_t eA = 0x4141414141414141ULL;   /* 'A' x8 */
    const uint64_t eC = 0x4343434343434343ULL;
    const uint64_t eG = 0x4747474747474747ULL;
    const uint64_t eT = 0x5454545454545454ULL;
    while (i < n) {
        if (n - i >= 64 && (o & 3) == 0) {
            const uint8_t *r = raw + i;
            uint8_t *rr = ref_out + o;
            uint8_t *pp = pk + (o >> 2);
            uint64_t allhit = HI;
            for (int j = 0; j < 8; j++) {
                uint64_t x;
                memcpy(&x, r + 8 * j, 8);
                uint64_t u = x & DF;
                /* per-byte match mask: 0x80 where byte == target */
                uint64_t hz, hit = 0;
                hz = u ^ eA; hit |= (hz - LO) & ~hz & HI;
                hz = u ^ eC; hit |= (hz - LO) & ~hz & HI;
                hz = u ^ eG; hit |= (hz - LO) & ~hz & HI;
                hz = u ^ eT; hit |= (hz - LO) & ~hz & HI;
                allhit &= hit;
                memcpy(rr + 8 * j, &u, 8);
                /* 2-bit codes: (c>>1)&3 per byte; fold each 32-bit
                 * half's four codes into one output byte */
                uint64_t c8 = (x >> 1) & 0x0303030303030303ULL;
                uint64_t f = c8 | (c8 >> 6) | (c8 >> 12) | (c8 >> 18);
                pp[2 * j] = (uint8_t)(f & 0xFF);
                pp[2 * j + 1] = (uint8_t)((f >> 32) & 0xFF);
            }
            if (allhit == HI) {
                o += 64;
                i += 64;
                continue;
            }
            /* a non-ACGT byte in the chunk: discard the speculative
             * stores (pk bytes are rewritten below via |=; they must
             * be re-zeroed first) and recompact byte-by-byte */
            memset(pp, 0, 16);
        }
        /* slow path: one 64-byte stretch with a non-ACGT byte (or the
         * tail / an unaligned o) compacted byte-by-byte */
        int64_t stop = i + 64 < n ? i + 64 : n;
        for (; i < stop; i++) {
            uint8_t c = raw[i];
            if (ok[c]) {
                ref_out[o] = (uint8_t)(c & 0xDF);
                pk[o >> 2] |= (uint8_t)(((c >> 1) & 3) << ((o & 3) << 1));
                o++;
            }
        }
    }
    return o;
}

/* Pack 2-bit codes 4:1 (little-endian within the byte: position p
 * lands at bits 2*(p%4)) with `halo` zero positions prepended and
 * zero fill out to `padded` positions.  halo and padded must be
 * multiples of 4; out must hold (halo+padded)/4 bytes. */
void spsp_pack_halo(const uint8_t *codes, int64_t n, uint8_t *out,
                    int64_t halo, int64_t padded)
{
    int64_t hb = halo >> 2;
    memset(out, 0, hb);
    uint8_t *p = out + hb;
    int64_t full = n >> 2;
    for (int64_t i = 0; i < full; i++) {
        const uint8_t *c = codes + (i << 2);
        p[i] = (uint8_t)(c[0] | (c[1] << 2) | (c[2] << 4) | (c[3] << 6));
    }
    int64_t done = full << 2;
    if (done < n) {
        uint8_t b = 0;
        for (int64_t j = done; j < n; j++)
            b |= (uint8_t)(codes[j] << ((j - done) << 1));
        p[full] = b;
        done = (full + 1) << 2;
        full++;
    }
    memset(p + full, 0, (padded >> 2) - full);
}
