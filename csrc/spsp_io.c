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
