/* CABAC arithmetic coding engine — native serial finalizer.
 *
 * The TPU-native entropy split (SURVEY.md §7.1): bins and context
 * indices are produced in batch (device/Python); this module runs the
 * strictly-serial arithmetic automaton over the bin stream (spec
 * §9.3.4) and emits the slice payload bytes.  Dual of the pure-Python
 * enc_engine.py (which remains as the portable fallback and oracle).
 *
 * Also provides the serial CABAC *decode* primitive loop used by the
 * native slice parser (future work).
 *
 * Build: gcc -O3 -shared -fPIC -o libcabac.so cabac_engine.c
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

/* normative engine tables (ITU-T H.264 §9.3.3.2) */
static const uint8_t rangeTabLPS[64][4] = {
  {128,176,208,240},{128,167,197,227},{128,158,187,216},{123,150,178,205},
  {116,142,169,195},{111,135,160,185},{105,128,152,175},{100,122,144,166},
  { 95,116,137,158},{ 90,110,130,150},{ 85,104,123,142},{ 81, 99,117,135},
  { 77, 94,111,128},{ 73, 89,105,122},{ 69, 85,100,116},{ 66, 80, 95,110},
  { 62, 76, 90,104},{ 59, 72, 86, 99},{ 56, 69, 81, 94},{ 53, 65, 77, 89},
  { 51, 62, 73, 85},{ 48, 59, 69, 80},{ 46, 56, 66, 76},{ 43, 53, 63, 72},
  { 41, 50, 59, 69},{ 39, 48, 56, 65},{ 37, 45, 54, 62},{ 35, 43, 51, 59},
  { 33, 41, 48, 56},{ 32, 39, 46, 53},{ 30, 37, 43, 50},{ 29, 35, 41, 48},
  { 27, 33, 39, 45},{ 26, 31, 37, 43},{ 24, 30, 35, 41},{ 23, 28, 33, 39},
  { 22, 27, 32, 37},{ 21, 26, 30, 35},{ 20, 24, 29, 33},{ 19, 23, 27, 31},
  { 18, 22, 26, 30},{ 17, 21, 25, 28},{ 16, 20, 23, 27},{ 15, 19, 22, 25},
  { 14, 18, 21, 24},{ 14, 17, 20, 23},{ 13, 16, 19, 22},{ 12, 15, 18, 21},
  { 12, 14, 17, 20},{ 11, 14, 16, 19},{ 11, 13, 15, 18},{ 10, 12, 15, 17},
  { 10, 12, 14, 16},{  9, 11, 13, 15},{  9, 11, 12, 14},{  8, 10, 12, 14},
  {  8,  9, 11, 13},{  7,  9, 11, 12},{  7,  9, 10, 12},{  7,  8, 10, 11},
  {  6,  8,  9, 11},{  6,  7,  9, 10},{  6,  7,  8,  9},{  2,  2,  2,  2}
};
static const uint8_t transIdxMPS[64] = {
   1, 2, 3, 4, 5, 6, 7, 8, 9,10,11,12,13,14,15,16,
  17,18,19,20,21,22,23,24,25,26,27,28,29,30,31,32,
  33,34,35,36,37,38,39,40,41,42,43,44,45,46,47,48,
  49,50,51,52,53,54,55,56,57,58,59,60,61,62,62,63
};
static const uint8_t transIdxLPS[64] = {
   0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9,11,11,12,
  13,13,15,15,16,16,18,18,19,19,21,21,22,22,23,24,
  24,25,26,26,27,27,28,29,29,30,30,30,31,32,32,33,
  33,33,34,34,35,35,35,36,36,36,37,37,37,38,38,63
};

typedef struct {
    uint8_t *out;
    size_t out_pos;      /* bits written */
    uint32_t low;
    uint32_t range;
    uint32_t outstanding;
    int first_bit_done;
} enc_t;

static inline void emit_bit(enc_t *e, int b) {
    if (b)
        e->out[e->out_pos >> 3] |= (uint8_t)(0x80u >> (e->out_pos & 7));
    e->out_pos++;
}

static inline void put_bit(enc_t *e, int b) {
    if (!e->first_bit_done) {
        e->first_bit_done = 1;
    } else {
        emit_bit(e, b);
    }
    while (e->outstanding) {
        emit_bit(e, 1 - b);
        e->outstanding--;
    }
}

static inline void renorm(enc_t *e) {
    while (e->range < 256) {
        if (e->low >= 512) {
            put_bit(e, 1);
            e->low -= 512;
        } else if (e->low < 256) {
            put_bit(e, 0);
        } else {
            e->outstanding++;
            e->low -= 256;
        }
        e->low <<= 1;
        e->range <<= 1;
    }
}

/* kinds: 0 = context decision, 1 = bypass, 2 = terminate */
/* Returns number of BITS written (payload continues at bit granularity;
 * the Python side owns overall byte alignment).  After the final
 * terminate(1) the flush is appended automatically. */
long cabac_encode_run(
    const uint8_t *kinds, const int32_t *ctx_idx, const uint8_t *bins,
    long n, uint8_t *states, uint8_t *mps, uint8_t *out, long out_capacity_bits)
{
    enc_t e;
    e.out = out; e.out_pos = 0; e.low = 0; e.range = 510;
    e.outstanding = 0; e.first_bit_done = 0;
    (void)out_capacity_bits;
    for (long i = 0; i < n; i++) {
        int kind = kinds[i];
        int b = bins[i];
        if (kind == 0) {
            int idx = ctx_idx[i];
            int st = states[idx];
            uint32_t rlps = rangeTabLPS[st][(e.range >> 6) & 3];
            e.range -= rlps;
            if (b != mps[idx]) {
                e.low += e.range;
                e.range = rlps;
                if (st == 0) mps[idx] ^= 1;
                states[idx] = transIdxLPS[st];
            } else {
                states[idx] = transIdxMPS[st];
            }
            renorm(&e);
        } else if (kind == 1) {
            e.low <<= 1;
            if (b) e.low += e.range;
            if (e.low >= 1024) { put_bit(&e, 1); e.low -= 1024; }
            else if (e.low < 512) { put_bit(&e, 0); }
            else { e.outstanding++; e.low -= 512; }
        } else {
            e.range -= 2;
            if (b) {
                e.low += e.range;
                e.range = 2;
                renorm(&e);
                /* flush */
                e.range = 2;
                renorm(&e);
                put_bit(&e, (e.low >> 9) & 1);
                emit_bit(&e, (e.low >> 8) & 1);
                emit_bit(&e, 1);
                /* byte-align with zeros */
                while (e.out_pos & 7) emit_bit(&e, 0);
            } else {
                renorm(&e);
            }
        }
    }
    return (long)e.out_pos;
}
