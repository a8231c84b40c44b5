/* Native CABAC slice-data writer: PictureParseState arrays -> payload.
 *
 * Fuses MB-layer binarization (the exact dual of
 * encoder/syntax_cabac.py, which remains the portable oracle), context
 * adaptation, and the serial arithmetic automaton (spec 9.3.4) into one
 * C pass over the committed per-MB state tensors, removing the per-MB
 * Python bin-generation tail from the encode hot path.  The reference's
 * equivalent layers are lencod/src/cabac.c (binarization + contexts)
 * and biariencode.c:256 (engine); this implementation is structured
 * around flat state tensors + a flat context array rather than JM's
 * per-MB trial coding.
 *
 * Frame coding, 4:2:0/monochrome, I/P/B slices, no IPCM/MBAFF (the
 * Python wrapper falls back to the oracle when unsupported).
 *
 * Build: gcc -O3 -shared -fPIC -o libcabac_writer.so cabac_writer.c
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

/* ---- engine tables (ITU-T H.264 9.3.3.2) ---- */
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

/* ---- flat context-group bases (entropy/cabac/engine.py layout) ---- */
enum {
  G_MB_TYPE = 0,          /* 3 x 11 */
  G_B8_TYPE = 33,         /* 2 x 9  */
  G_MV_RES = 51,          /* 2 x 10 */
  G_REF_NO = 71,          /* 2 x 6  */
  G_DELTA_QP = 83,        /* 1 x 4  */
  G_MB_AFF = 87,          /* 1 x 4  */
  G_TRANSFORM_SIZE = 91,  /* 1 x 3  */
  G_IPR = 94,             /* 1 x 2  */
  G_CIPR = 96,            /* 1 x 4  */
  G_CBP = 100,            /* 3 x 4  */
  G_BCBP = 112,           /* 22 x 4 */
  G_MAP = 200,            /* 22 x 15 */
  G_LAST = 530,           /* 22 x 15 */
  G_ONE = 860,            /* 22 x 5 */
  G_ABS = 970             /* 22 x 5 */
};

/* JM internal macroblock modes (decoder/mbtables.py) */
enum { PSKIP=0, P16x16=1, P16x8=2, P8x16=3, P8x8M=8, I4MB=9, I16MB=10,
       IBLOCK=11, I8MB=13, IPCM=14 };
enum { B8_DIRECT=0, B8_8x8=4, B8_8x4=5, B8_4x8=6, B8_4x4=7 };
enum { PD_L0=0, PD_L1=1, PD_BI=2 };
/* residual block categories */
enum { LUMA_16DC=0, LUMA_16AC=1, LUMA_8x8=2, LUMA_4x4=5,
       CHROMA_DC=6, CHROMA_AC=7 };
enum { ST_P=0, ST_B=1, ST_I=2 };

/* raw B mb_type from (pdir0, pdir1or2) */
static const int B16x8_CODE[3][3] = {{4,8,12},{10,6,14},{16,18,20}};
static const int B8x16_CODE[3][3] = {{5,9,13},{11,7,15},{17,19,21}};

/* block index -> (x4,y4) within MB (2-level Z order) */
static const int BLK4_X[16] = {0,1,0,1,2,3,2,3,0,1,0,1,2,3,2,3};
static const int BLK4_Y[16] = {0,0,1,1,0,0,1,1,2,2,3,3,2,2,3,3};

typedef struct {
    uint8_t *out;
    size_t pos;              /* bits written */
    uint32_t low, range, outstanding;
    int first_bit_done;
    uint8_t *states, *mps;
} enc_t;

static inline void emit_bit(enc_t *e, int b) {
    if (b) e->out[e->pos >> 3] |= (uint8_t)(0x80u >> (e->pos & 7));
    e->pos++;
}
static inline void put_bit(enc_t *e, int b) {
    if (!e->first_bit_done) e->first_bit_done = 1;
    else emit_bit(e, b);
    while (e->outstanding) { emit_bit(e, 1 - b); e->outstanding--; }
}
static inline void renorm(enc_t *e) {
    while (e->range < 256) {
        if (e->low >= 512) { put_bit(e, 1); e->low -= 512; }
        else if (e->low < 256) put_bit(e, 0);
        else { e->outstanding++; e->low -= 256; }
        e->low <<= 1; e->range <<= 1;
    }
}
static inline void decision(enc_t *e, int idx, int b) {
    int st = e->states[idx];
    uint32_t rlps = rangeTabLPS[st][(e->range >> 6) & 3];
    e->range -= rlps;
    if (b != e->mps[idx]) {
        e->low += e->range; e->range = rlps;
        if (st == 0) e->mps[idx] ^= 1;
        e->states[idx] = transIdxLPS[st];
    } else e->states[idx] = transIdxMPS[st];
    renorm(e);
}
static inline void bypass(enc_t *e, int b) {
    e->low <<= 1;
    if (b) e->low += e->range;
    if (e->low >= 1024) { put_bit(e, 1); e->low -= 1024; }
    else if (e->low < 512) put_bit(e, 0);
    else { e->outstanding++; e->low -= 512; }
}
static inline void terminate(enc_t *e, int b) {
    e->range -= 2;
    if (b) {
        e->low += e->range; e->range = 2;
        renorm(e);
        e->range = 2;           /* flush */
        renorm(e);
        put_bit(e, (e->low >> 9) & 1);
        emit_bit(e, (e->low >> 8) & 1);
        emit_bit(e, 1);
        while (e->pos & 7) emit_bit(e, 0);
    } else renorm(e);
}

/* ---- writer state ---- */
typedef struct {
    int W, H, nmb, w4;
    const int32_t *mb_type, *cbp, *qp, *c_ipred_mode, *b8mode, *b8pdir,
        *i16mode, *slice_id;
    const uint8_t *skip_flag, *is_intra, *t8;
    const int8_t *ipredmode, *ref_idx;
    const int32_t *mvd;
    const int32_t *ll, *l8, *ldc, *cdc, *cl;
    int slice_type, cur_qp, last_dquant;
    int n_ref0, n_ref1, t8_mode, cintra, cfmt;
    const int32_t *p2c_map, *p2c_last, *t2c;   /* [22*64], [22*64], [8*22] */
    const int32_t *zz4, *zz8;                  /* linear sample indices */
    int64_t *cbp_bits;
    enc_t e;
} wr_t;

#define T2C_BCBP(w, t)  ((w)->t2c[0*22 + (t)])
#define T2C_MAP(w, t)   ((w)->t2c[1*22 + (t)])
#define T2C_LAST(w, t)  ((w)->t2c[2*22 + (t)])
#define T2C_ONE(w, t)   ((w)->t2c[3*22 + (t)])
#define T2C_ABS(w, t)   ((w)->t2c[4*22 + (t)])
#define T2C_MAXPOS(w,t) ((w)->t2c[5*22 + (t)])
#define T2C_C1ISDC(w,t) ((w)->t2c[6*22 + (t)])
#define T2C_MAXC2(w, t) ((w)->t2c[7*22 + (t)])

/* ---- neighbors (decoder/state.py duals) ---- */
static inline int mb_avail(const wr_t *w, int a, int cur) {
    return a >= 0 && a < w->nmb && w->slice_id[a] == w->slice_id[cur];
}
static inline int mb_left(const wr_t *w, int addr) {
    if (addr % w->W == 0) return -1;
    return mb_avail(w, addr - 1, addr) ? addr - 1 : -1;
}
static inline int mb_up(const wr_t *w, int addr) {
    int a = addr - w->W;
    return (a >= 0 && mb_avail(w, a, addr)) ? a : -1;
}
/* luma 4x4 neighbor of pixel (xp, yp) relative to MB addr.
 * Returns avail; fills nb addr, block coords in nb MB, abs block coords. */
static int luma_nb(const wr_t *w, int addr, int xp, int yp,
                   int *nmb, int *bx, int *by, int *px4, int *py4) {
    int mbx = addr % w->W, mby = addr / w->W, n;
    if (xp < 0 && yp < 0) n = (mbx > 0 && mby > 0) ? addr - w->W - 1 : -1;
    else if (xp < 0) n = (mbx > 0 && yp < 16) ? addr - 1 : -1;
    else if (yp < 0) {
        if (xp < 16) n = mby > 0 ? addr - w->W : -1;
        else n = (mby > 0 && mbx < w->W - 1) ? addr - w->W + 1 : -1;
    } else if (xp < 16 && yp < 16) n = addr;
    else return 0;
    if (n < 0 || !mb_avail(w, n, addr)) return 0;
    int x = xp & 15, y = yp & 15;
    *nmb = n; *bx = x >> 2; *by = y >> 2;
    *px4 = 4 * (n % w->W) + (x >> 2);
    *py4 = 4 * (n / w->W) + (y >> 2);
    return 1;
}
/* chroma 4x4 neighbor (4:2:0: 8x8 chroma MB) */
static int chroma_nb(const wr_t *w, int addr, int xp, int yp,
                     int *nmb, int *bx, int *by) {
    int mbx = addr % w->W, mby = addr / w->W, n;
    if (xp < 0 && yp < 0) n = (mbx > 0 && mby > 0) ? addr - w->W - 1 : -1;
    else if (xp < 0) n = mbx > 0 ? addr - 1 : -1;
    else if (yp < 0) n = mby > 0 ? addr - w->W : -1;
    else if (xp < 8 && yp < 8) n = addr;
    else return 0;
    if (n < 0 || !mb_avail(w, n, addr)) return 0;
    *nmb = n; *bx = (xp & 7) >> 2; *by = (yp & 7) >> 2;
    return 1;
}

/* ---- syntax writers (duals of encoder/syntax_cabac.py) ---- */

static void write_mb_skip(wr_t *w, int addr, int skipped) {
    int up = mb_up(w, addr), left = mb_left(w, addr);
    int a = (left >= 0 && !w->skip_flag[left]) ? 1 : 0;
    int b = (up >= 0 && !w->skip_flag[up]) ? 1 : 0;
    if (w->slice_type == ST_B)
        decision(&w->e, G_MB_TYPE + 22 + 7 + a + b, skipped);
    else
        decision(&w->e, G_MB_TYPE + 11 + a + b, skipped);
}

static void write_i16_suffix(wr_t *w, int cbp, int i16) {
    terminate(&w->e, 0);  /* not IPCM */
    int base = G_MB_TYPE + 11;
    int ac = (cbp & 15) ? 1 : 0, cc = (cbp >> 4) & 3;
    decision(&w->e, base + 8, ac);
    if (cc == 0) decision(&w->e, base + 9, 0);
    else { decision(&w->e, base + 9, 1); decision(&w->e, base + 9, cc == 2); }
    decision(&w->e, base + 10, (i16 >> 1) & 1);
    decision(&w->e, base + 10, i16 & 1);
}

static void write_mb_type_I(wr_t *w, int addr, int mbt, int cbp) {
    int up = mb_up(w, addr), left = mb_left(w, addr);
    int base = G_MB_TYPE;
    int a = (left >= 0 && w->mb_type[left] != I4MB && w->mb_type[left] != I8MB) ? 1 : 0;
    int b = (up >= 0 && w->mb_type[up] != I4MB && w->mb_type[up] != I8MB) ? 1 : 0;
    if (mbt == I4MB || mbt == I8MB) { decision(&w->e, base + a + b, 0); return; }
    decision(&w->e, base + a + b, 1);
    terminate(&w->e, 0);
    int i16 = w->i16mode[addr];
    int ac = (cbp & 15) ? 1 : 0, cc = (cbp >> 4) & 3;
    decision(&w->e, base + 4, ac);
    if (cc == 0) decision(&w->e, base + 5, 0);
    else { decision(&w->e, base + 5, 1); decision(&w->e, base + 6, cc == 2); }
    decision(&w->e, base + 7, (i16 >> 1) & 1);
    decision(&w->e, base + 8, i16 & 1);
}

static void write_mb_type_P(wr_t *w, int addr, int mbt, int cbp) {
    int base = G_MB_TYPE + 11;
    if (w->is_intra[addr]) {
        decision(&w->e, base + 4, 1);
        if (mbt == I4MB || mbt == I8MB) { decision(&w->e, base + 7, 0); return; }
        decision(&w->e, base + 7, 1);
        write_i16_suffix(w, cbp, w->i16mode[addr]);
        return;
    }
    decision(&w->e, base + 4, 0);
    if (mbt == P16x16) { decision(&w->e, base + 5, 0); decision(&w->e, base + 6, 0); }
    else if (mbt == P16x8) { decision(&w->e, base + 5, 1); decision(&w->e, base + 7, 1); }
    else if (mbt == P8x16) { decision(&w->e, base + 5, 1); decision(&w->e, base + 7, 0); }
    else { decision(&w->e, base + 5, 0); decision(&w->e, base + 6, 1); } /* P8x8 */
}

static void write_mb_type_B(wr_t *w, int addr, int mbt, int cbp) {
    int up = mb_up(w, addr), left = mb_left(w, addr);
    int base = G_MB_TYPE + 22;
    int a = (left >= 0 && w->mb_type[left] != 0) ? 1 : 0;
    int b = (up >= 0 && w->mb_type[up] != 0) ? 1 : 0;
    int raw;
    const int32_t *pd = w->b8pdir + 4 * addr;
    if (mbt == I4MB || mbt == I8MB) raw = 23;
    else if (mbt == I16MB) raw = 24;
    else if (mbt == 0) raw = 0;
    else if (mbt == P16x16) raw = pd[0] + 1;
    else if (mbt == P16x8) raw = B16x8_CODE[pd[0]][pd[2]];
    else if (mbt == P8x16) raw = B8x16_CODE[pd[0]][pd[1]];
    else raw = 22; /* P8x8 */
    if (raw == 0) { decision(&w->e, base + a + b, 0); return; }
    decision(&w->e, base + a + b, 1);
    if (raw == 1 || raw == 2) {
        decision(&w->e, base + 4, 0);
        decision(&w->e, base + 6, raw == 2);
        return;
    }
    decision(&w->e, base + 4, 1);
    if (raw >= 3 && raw <= 10) {
        decision(&w->e, base + 5, 0);
        int v = raw - 3;
        decision(&w->e, base + 6, (v >> 2) & 1);
        decision(&w->e, base + 6, (v >> 1) & 1);
        decision(&w->e, base + 6, v & 1);
        return;
    }
    decision(&w->e, base + 5, 1);
    int act0, tail;
    if (raw == 11) { act0 = 24; tail = -1; }
    else if (raw == 22) { act0 = 26; tail = -1; }
    else if (raw == 23 || raw == 24) { act0 = 22; tail = raw - 23; }
    else { act0 = raw & ~1; tail = raw & 1; }
    int v = (act0 - 12) >> 1;
    decision(&w->e, base + 6, (v >> 2) & 1);
    decision(&w->e, base + 6, (v >> 1) & 1);
    decision(&w->e, base + 6, v & 1);
    if (tail >= 0) decision(&w->e, base + 6, tail);
    if (mbt == I16MB) write_i16_suffix(w, cbp, w->i16mode[addr]);
}

static void write_sub_mb_type_B(wr_t *w, int b8m, int pdir) {
    int base = G_B8_TYPE + 9;
    int val;
    if (b8m == B8_DIRECT) val = 0;
    else if (b8m == B8_8x8) val = 1 + pdir;
    else if (b8m == B8_8x4) val = pdir == 0 ? 4 : (pdir == 1 ? 6 : 8);
    else if (b8m == B8_4x8) val = pdir == 0 ? 5 : (pdir == 1 ? 7 : 9);
    else val = 10 + pdir;  /* B8_4x4 */
    if (val == 0) { decision(&w->e, base + 0, 0); return; }
    decision(&w->e, base + 0, 1);
    int act = val - 1;
    if (act <= 1) { decision(&w->e, base + 1, 0); decision(&w->e, base + 3, act); return; }
    decision(&w->e, base + 1, 1);
    if (act <= 5) {
        decision(&w->e, base + 2, 0);
        int v = act - 2;
        decision(&w->e, base + 3, (v >> 1) & 1);
        decision(&w->e, base + 3, v & 1);
        return;
    }
    decision(&w->e, base + 2, 1);
    if (act <= 9) {
        decision(&w->e, base + 3, 0);
        int v = act - 6;
        decision(&w->e, base + 3, (v >> 1) & 1);
        decision(&w->e, base + 3, v & 1);
        return;
    }
    decision(&w->e, base + 3, 1);
    decision(&w->e, base + 3, act - 10);
}

static void write_sub_mb_type(wr_t *w, int b8m, int pdir) {
    if (w->slice_type == ST_B) { write_sub_mb_type_B(w, b8m, pdir); return; }
    int base = G_B8_TYPE;
    if (b8m == B8_8x8) { decision(&w->e, base + 1, 1); return; }
    decision(&w->e, base + 1, 0);
    if (b8m == B8_8x4) decision(&w->e, base + 3, 0);
    else if (b8m == B8_4x8) { decision(&w->e, base + 3, 1); decision(&w->e, base + 4, 1); }
    else { decision(&w->e, base + 3, 1); decision(&w->e, base + 4, 0); }
}

static void write_transform_size(wr_t *w, int addr, int flag) {
    int up = mb_up(w, addr), left = mb_left(w, addr);
    int a = left >= 0 ? w->t8[left] : 0;
    int b = up >= 0 ? w->t8[up] : 0;
    decision(&w->e, G_TRANSFORM_SIZE + a + b, flag);
}

static int mpm(wr_t *w, int addr, int bx, int by) {
    int lm = -1, um = -1, nmb, nbx, nby, px, py;
    if (luma_nb(w, addr, (bx << 2) - 1, by << 2, &nmb, &nbx, &nby, &px, &py)) {
        if (!w->cintra || w->is_intra[nmb]) lm = w->ipredmode[py * w->w4 + px];
    }
    if (luma_nb(w, addr, bx << 2, (by << 2) - 1, &nmb, &nbx, &nby, &px, &py)) {
        if (!w->cintra || w->is_intra[nmb]) um = w->ipredmode[py * w->w4 + px];
    }
    if (lm < 0 || um < 0) return 2; /* DC */
    return lm < um ? lm : um;
}

static void write_intra_pred_modes(wr_t *w, int addr) {
    int x4 = 4 * (addr % w->W), y4 = 4 * (addr / w->W);
    int step = w->t8[addr] ? 2 : 1;
    for (int b8 = 0; b8 < 4; b8++) {
        if (w->b8mode[4 * addr + b8] != IBLOCK) continue;
        for (int j = 0; j < 2; j += step)
            for (int i = 0; i < 2; i += step) {
                int bx = ((b8 & 1) << 1) + i, by = (b8 & 2) + j;
                int mode = w->ipredmode[(y4 + by) * w->w4 + (x4 + bx)];
                int pm = mpm(w, addr, bx, by);
                if (mode == pm) decision(&w->e, G_IPR, 1);
                else {
                    int rem = mode < pm ? mode : mode - 1;
                    decision(&w->e, G_IPR, 0);
                    decision(&w->e, G_IPR + 1, rem & 1);
                    decision(&w->e, G_IPR + 1, (rem >> 1) & 1);
                    decision(&w->e, G_IPR + 1, (rem >> 2) & 1);
                }
            }
    }
}

static void write_cipred(wr_t *w, int addr) {
    int mode = w->c_ipred_mode[addr];
    int up = mb_up(w, addr), left = mb_left(w, addr);
    int a = (left >= 0 && w->c_ipred_mode[left] != 0 && w->mb_type[left] != IPCM) ? 1 : 0;
    int b = (up >= 0 && w->c_ipred_mode[up] != 0 && w->mb_type[up] != IPCM) ? 1 : 0;
    if (mode == 0) { decision(&w->e, G_CIPR + a + b, 0); return; }
    decision(&w->e, G_CIPR + a + b, 1);
    if (mode == 1) decision(&w->e, G_CIPR + 3, 0);
    else if (mode == 2) { decision(&w->e, G_CIPR + 3, 1); decision(&w->e, G_CIPR + 3, 0); }
    else { decision(&w->e, G_CIPR + 3, 1); decision(&w->e, G_CIPR + 3, 1); }
}

static void write_cbp(wr_t *w, int addr, int cbp) {
    int up = mb_up(w, addr), left = mb_left(w, addr);
    int acc = 0;
    for (int mb_y = 0; mb_y <= 2; mb_y += 2)
        for (int mb_x = 0; mb_x <= 2; mb_x += 2) {
            int a, b;
            if (mb_y == 0) {
                if (up < 0 || w->mb_type[up] == IPCM) b = 0;
                else b = (w->cbp[up] & (1 << (2 + mb_x / 2))) ? 0 : 1;
            } else b = (acc & (1 << (mb_x / 2))) ? 0 : 1;
            if (mb_x == 0) {
                int nmb, nbx, nby, px, py;
                if (luma_nb(w, addr, -1, mb_y << 2, &nmb, &nbx, &nby, &px, &py)) {
                    if (w->mb_type[nmb] == IPCM) a = 0;
                    else a = (w->cbp[nmb] & (1 << (2 * (nby / 2) + 1))) ? 0 : 1;
                } else a = 0;
            } else a = (acc & (1 << mb_y)) ? 0 : 1;
            int bit = (cbp & (1 << (mb_y + mb_x / 2))) ? 1 : 0;
            decision(&w->e, G_CBP + a + 2 * b, bit);
            if (bit) acc += 1 << (mb_y + mb_x / 2);
        }
    if (w->cfmt == 1 || w->cfmt == 2) {
        int b = (up >= 0 && (w->mb_type[up] == IPCM || w->cbp[up] > 15)) ? 1 : 0;
        int a = (left >= 0 && (w->mb_type[left] == IPCM || w->cbp[left] > 15)) ? 1 : 0;
        int cc = cbp >> 4;
        decision(&w->e, G_CBP + 4 + a + 2 * b, cc ? 1 : 0);
        if (cc) {
            b = (up >= 0 && (w->mb_type[up] == IPCM ||
                 (w->cbp[up] > 15 && (w->cbp[up] >> 4) == 2))) ? 1 : 0;
            a = (left >= 0 && (w->mb_type[left] == IPCM ||
                 (w->cbp[left] > 15 && (w->cbp[left] >> 4) == 2))) ? 1 : 0;
            decision(&w->e, G_CBP + 8 + a + 2 * b, cc == 2);
        }
    }
}

static void write_dquant(wr_t *w, int dq) {
    int base = G_DELTA_QP;
    int act_ctx = w->last_dquant != 0 ? 1 : 0;
    int act_sym = 2 * (dq < 0 ? -dq : dq) - (dq > 0 ? 1 : 0);
    if (act_sym == 0) decision(&w->e, base + act_ctx, 0);
    else {
        decision(&w->e, base + act_ctx, 1);
        if (act_sym == 1) decision(&w->e, base + 2, 0);
        else {
            decision(&w->e, base + 2, 1);
            for (int k = 0; k < act_sym - 2; k++) decision(&w->e, base + 3, 1);
            decision(&w->e, base + 3, 0);
        }
    }
    w->last_dquant = dq;
}

static void write_eg_bypass(wr_t *w, int value, int k) {
    while (value >= (1 << k)) { bypass(&w->e, 1); value -= 1 << k; k++; }
    bypass(&w->e, 0);
    while (k) { k--; bypass(&w->e, (value >> k) & 1); }
}

static void dec_mv_bin(wr_t *w, int base, int bit, int bin_idx, int max_bin) {
    int offset = 1, b = 1;
    for (int i = 0; i < bin_idx - 2; i++) {
        b += 1;
        if (b == 2) offset++;
        if (b == max_bin) offset++;
    }
    decision(&w->e, base + offset, bit);
}

static void write_ueg_mv(wr_t *w, int base, int symbol, int max_bin) {
    if (symbol == 0) { decision(&w->e, base, 0); return; }
    decision(&w->e, base, 1);
    int v = symbol;
    if (v <= 7) {
        for (int i = 0; i < v - 1; i++) dec_mv_bin(w, base, 1, i + 2, max_bin);
        dec_mv_bin(w, base, 0, v + 1, max_bin);
    } else {
        for (int i = 0; i < 7; i++) dec_mv_bin(w, base, 1, i + 2, max_bin);
        write_eg_bypass(w, v - 8, 3);
    }
}

static void write_ref_idx(wr_t *w, int addr, int lst, int bx, int by, int ref) {
    int a = 0, b = 0;
    int nmb, nbx, nby, px, py;
    if (luma_nb(w, addr, (bx << 2) - 1, by << 2, &nmb, &nbx, &nby, &px, &py)) {
        int b8 = (nbx / 2) % 2 + 2 * ((nby / 2) % 2);
        if (w->mb_type[nmb] != IPCM &&
            !(w->slice_type == ST_B && w->mb_type[nmb] == 0 && !w->is_intra[nmb]) &&
            !(w->b8mode[4 * nmb + b8] == 0 && w->b8pdir[4 * nmb + b8] == 2))
            a = w->ref_idx[(size_t)lst * 4 * w->H * w->w4 + py * w->w4 + px] > 0;
    }
    if (luma_nb(w, addr, bx << 2, (by << 2) - 1, &nmb, &nbx, &nby, &px, &py)) {
        int b8 = (nbx / 2) % 2 + 2 * ((nby / 2) % 2);
        if (w->mb_type[nmb] != IPCM &&
            !(w->slice_type == ST_B && w->mb_type[nmb] == 0 && !w->is_intra[nmb]) &&
            !(w->b8mode[4 * nmb + b8] == 0 && w->b8pdir[4 * nmb + b8] == 2))
            b = w->ref_idx[(size_t)lst * 4 * w->H * w->w4 + py * w->w4 + px] > 0;
    }
    int base = G_REF_NO;
    if (ref == 0) { decision(&w->e, base + a + 2 * b, 0); return; }
    decision(&w->e, base + a + 2 * b, 1);
    if (ref == 1) { decision(&w->e, base + 4, 0); return; }
    decision(&w->e, base + 4, 1);
    for (int k = 0; k < ref - 2; k++) decision(&w->e, base + 5, 1);
    decision(&w->e, base + 5, 0);
}

static void write_mvd_se(wr_t *w, int addr, int lst, int bx, int by,
                         int comp, int mvd_val) {
    size_t pstride = (size_t)4 * w->H * w->w4;
    int a_val = 0, b_val = 0;
    int nmb, nbx, nby, px, py;
    if (luma_nb(w, addr, (bx << 2) - 1, by << 2, &nmb, &nbx, &nby, &px, &py)) {
        int v = w->mvd[(lst * pstride + (size_t)py * w->w4 + px) * 2 + comp];
        a_val = v < 0 ? -v : v;
    }
    if (luma_nb(w, addr, bx << 2, (by << 2) - 1, &nmb, &nbx, &nby, &px, &py)) {
        int v = w->mvd[(lst * pstride + (size_t)py * w->w4 + px) * 2 + comp];
        b_val = v < 0 ? -v : v;
    }
    int err = a_val + b_val;
    int act_ctx;
    if (err < 3) act_ctx = 5 * comp;
    else if (err > 32) act_ctx = 5 * comp + 3;
    else act_ctx = 5 * comp + 2;
    if (mvd_val == 0) { decision(&w->e, G_MV_RES + act_ctx, 0); return; }
    decision(&w->e, G_MV_RES + act_ctx, 1);
    int mag = mvd_val < 0 ? -mvd_val : mvd_val;
    write_ueg_mv(w, G_MV_RES + 10 + 5 * comp, mag - 1, 3);
    bypass(&w->e, mvd_val < 0);
}

static void write_motion(wr_t *w, int addr, int mbt) {
    int x4 = 4 * (addr % w->W), y4 = 4 * (addr / w->W);
    int bframe = w->slice_type == ST_B;
    int n_active[2] = { w->n_ref0, w->n_ref1 };
    /* partitions: bx, by, w4, h4, b8 */
    int parts[4][5]; int np;
    if (mbt == P16x16) { np = 1; int t[5] = {0,0,4,4,0}; memcpy(parts[0], t, sizeof t); }
    else if (mbt == P16x8) {
        np = 2; int t0[5] = {0,0,4,2,0}, t1[5] = {0,2,4,2,2};
        memcpy(parts[0], t0, sizeof t0); memcpy(parts[1], t1, sizeof t1);
    } else if (mbt == P8x16) {
        np = 2; int t0[5] = {0,0,2,4,0}, t1[5] = {2,0,2,4,1};
        memcpy(parts[0], t0, sizeof t0); memcpy(parts[1], t1, sizeof t1);
    } else {
        np = 4;
        for (int b8 = 0; b8 < 4; b8++) {
            parts[b8][0] = (b8 & 1) * 2; parts[b8][1] = (b8 >> 1) * 2;
            parts[b8][2] = 2; parts[b8][3] = 2; parts[b8][4] = b8;
        }
    }
    size_t pstride = (size_t)4 * w->H * w->w4;
    for (int lst = 0; lst < 2; lst++) {
        if (lst == 1 && !bframe) break;
        if (n_active[lst] <= 1) continue;
        for (int p = 0; p < np; p++) {
            int b8 = parts[p][4];
            int b8m = w->b8mode[4 * addr + b8], pdir = w->b8pdir[4 * addr + b8];
            if (b8m == IBLOCK || (mbt == P8x8M && b8m == B8_DIRECT)) continue;
            if (bframe && pdir != lst && pdir != PD_BI) continue;
            int bx = parts[p][0], by = parts[p][1];
            write_ref_idx(w, addr, lst, bx, by,
                w->ref_idx[lst * pstride + (size_t)(y4 + by) * w->w4 + (x4 + bx)]);
        }
    }
    for (int lst = 0; lst < 2; lst++) {
        if (lst == 1 && !bframe) break;
        for (int p = 0; p < np; p++) {
            int b8 = parts[p][4];
            int b8m = w->b8mode[4 * addr + b8], pdir = w->b8pdir[4 * addr + b8];
            if (b8m == IBLOCK || (mbt == P8x8M && b8m == B8_DIRECT)) continue;
            if (bframe && pdir != lst && pdir != PD_BI) continue;
            int bx = parts[p][0], by = parts[p][1];
            int sxs[4], sys[4]; int ns = 0;
            if (mbt == P8x8M) {
                int sw = (b8m == B8_8x8 || b8m == B8_8x4) ? 2 : 1;
                int sh = (b8m == B8_8x8 || b8m == B8_4x8) ? 2 : 1;
                for (int dy = 0; dy < 2; dy += sh)
                    for (int dx = 0; dx < 2; dx += sw) {
                        sxs[ns] = bx + dx; sys[ns] = by + dy; ns++;
                    }
            } else { sxs[0] = bx; sys[0] = by; ns = 1; }
            for (int s = 0; s < ns; s++)
                for (int comp = 0; comp < 2; comp++)
                    write_mvd_se(w, addr, lst, sxs[s], sys[s], comp,
                        w->mvd[(lst * pstride + (size_t)(y4 + sys[s]) * w->w4
                                + (x4 + sxs[s])) * 2 + comp]);
        }
    }
}

/* ---- residual coding ---- */

static int cbf_bit_for(int btype, int is_v, int bx, int by) {
    if (btype == LUMA_16DC) return 0;
    if (btype == CHROMA_DC) return 17 + is_v;
    if (btype == CHROMA_AC) return (is_v ? 35 : 19) + 4 * by + bx;
    return 1 + 4 * by + bx;
}

static void write_cbf(wr_t *w, int addr, int btype, int is_v, int bx, int by,
                      int cbf) {
    int is_luma = (btype == LUMA_16DC || btype == LUMA_16AC ||
                   btype == LUMA_8x8 || btype == LUMA_4x4);
    int is_dc = (btype == LUMA_16DC || btype == CHROMA_DC);
    int default_bit = w->is_intra[addr] ? 1 : 0;
    int i = is_dc ? 0 : bx, j = is_dc ? 0 : by;
    int la = 0, ua = 0, lmb = -1, umb = -1, lbx = 0, lby = 0, ubx = 0, uby = 0;
    int px, py;
    if (is_luma) {
        la = luma_nb(w, addr, (i << 2) - 1, j << 2, &lmb, &lbx, &lby, &px, &py);
        ua = luma_nb(w, addr, i << 2, (j << 2) - 1, &umb, &ubx, &uby, &px, &py);
    } else {
        la = chroma_nb(w, addr, (i << 2) - 1, j << 2, &lmb, &lbx, &lby);
        ua = chroma_nb(w, addr, i << 2, (j << 2) - 1, &umb, &ubx, &uby);
    }
    int bit_a, bit_b;
    if (btype == LUMA_16DC) { bit_a = bit_b = 0; }
    else if (btype == CHROMA_DC) { bit_a = bit_b = 17 + is_v; }
    else if (btype == CHROMA_AC) {
        bit_a = (is_v ? 35 : 19) + (la ? 4 * lby + lbx : 0);
        bit_b = (is_v ? 35 : 19) + (ua ? 4 * uby + ubx : 0);
    } else {
        bit_a = 1 + (la ? 4 * lby + lbx : 0);
        bit_b = 1 + (ua ? 4 * uby + ubx : 0);
    }
    if (btype != LUMA_8x8) {
        int upper = default_bit, left = default_bit;
        if (ua) upper = w->mb_type[umb] == IPCM ? 1
                        : (int)((w->cbp_bits[umb] >> bit_b) & 1);
        if (la) left = w->mb_type[lmb] == IPCM ? 1
                       : (int)((w->cbp_bits[lmb] >> bit_a) & 1);
        int ctx2 = 2 * upper + left;
        decision(&w->e, G_BCBP + 4 * T2C_BCBP(w, btype) + ctx2, cbf);
    }
    if (cbf) {
        int bit = cbf_bit_for(btype, is_v, bx, by);
        int64_t mask = (int64_t)1 << bit;
        if (btype == LUMA_8x8)
            mask |= ((int64_t)1 << (bit + 1)) | ((int64_t)1 << (bit + 4)) |
                    ((int64_t)1 << (bit + 5));
        w->cbp_bits[addr] |= mask;
    }
}

static void write_level_suffix(wr_t *w, int idx, int symbol) {
    if (symbol == 0) { decision(&w->e, idx, 0); return; }
    decision(&w->e, idx, 1);
    int v = symbol;
    if (v <= 12) {
        for (int i = 0; i < v - 1; i++) decision(&w->e, idx, 1);
        decision(&w->e, idx, 0);
    } else {
        for (int i = 0; i < 12; i++) decision(&w->e, idx, 1);
        write_eg_bypass(w, v - 13, 0);
    }
}

/* coeff: scan-ordered coefficients, maxpos entries */
static void write_block(wr_t *w, int addr, int btype, int is_v, int bx, int by,
                        const int32_t *coeff) {
    int maxpos = T2C_MAXPOS(w, btype);
    int nz = 0, last_idx = -1;
    for (int k = 0; k < maxpos; k++)
        if (coeff[k]) { nz = 1; last_idx = k; }
    write_cbf(w, addr, btype, is_v, bx, by, nz);
    if (!nz) return;
    const int32_t *p2c_map = w->p2c_map + 64 * btype;
    const int32_t *p2c_last = w->p2c_last + 64 * btype;
    int base_m = G_MAP + 15 * T2C_MAP(w, btype);
    int base_l = G_LAST + 15 * T2C_LAST(w, btype);
    int c1isdc = T2C_C1ISDC(w, btype);
    int shift = c1isdc ? 0 : -1;
    int i0 = c1isdc ? 0 : 1;
    int i1 = c1isdc ? maxpos - 1 : maxpos;
    for (int i = i0; i < i1; i++) {
        int sig = coeff[i + shift] ? 1 : 0;
        decision(&w->e, base_m + p2c_map[i], sig);
        if (sig) {
            int is_last = (i + shift) == last_idx;
            decision(&w->e, base_l + p2c_last[i], is_last);
            if (is_last) break;
        }
    }
    int base_o = G_ONE + 5 * T2C_ONE(w, btype);
    int base_a = G_ABS + 5 * T2C_ABS(w, btype);
    int c1 = 1, c2 = 0, mc2 = T2C_MAXC2(w, btype);
    for (int idx = maxpos - 1; idx >= 0; idx--) {
        int v = coeff[idx];
        if (v == 0) continue;
        int mag = v < 0 ? -v : v;
        decision(&w->e, base_o + (c1 < 4 ? c1 : 4), mag == 1 ? 0 : 1);
        if (mag >= 2) {
            write_level_suffix(w, base_a + (c2 < mc2 ? c2 : mc2), mag - 2);
            c1 = 0; c2++;
        } else if (c1) c1++;
        bypass(&w->e, v < 0);
    }
}

static void write_residuals(wr_t *w, int addr) {
    int cbp = w->cbp[addr], mbt = w->mb_type[addr];
    int32_t coeff[64];
    if (mbt == I16MB) {
        const int32_t *dc = w->ldc + 16 * addr;
        for (int k = 0; k < 16; k++) coeff[k] = dc[w->zz4[k]];
        write_block(w, addr, LUMA_16DC, 0, 0, 0, coeff);
    }
    if (cbp & 15) {
        int t8 = w->t8[addr];
        for (int b8 = 0; b8 < 4; b8++) {
            if (!(cbp & (1 << b8))) continue;
            if (t8) {
                const int32_t *lv = w->l8 + ((size_t)addr * 4 + b8) * 64;
                for (int k = 0; k < 64; k++) coeff[k] = lv[w->zz8[k]];
                write_block(w, addr, LUMA_8x8, 0, (b8 & 1) * 2, (b8 >> 1) * 2,
                            coeff);
            } else {
                int btype = mbt == I16MB ? LUMA_16AC : LUMA_4x4;
                for (int b4 = 0; b4 < 4; b4++) {
                    int blk = b8 * 4 + b4;
                    const int32_t *lv = w->ll + ((size_t)addr * 16 + blk) * 16;
                    if (btype == LUMA_16AC)
                        for (int k = 1; k < 16; k++) coeff[k - 1] = lv[w->zz4[k]];
                    else
                        for (int k = 0; k < 16; k++) coeff[k] = lv[w->zz4[k]];
                    write_block(w, addr, btype, 0, BLK4_X[blk], BLK4_Y[blk],
                                coeff);
                }
            }
        }
    }
    if (w->cfmt == 1) {
        if (cbp > 15)
            for (int uv = 0; uv < 2; uv++) {
                const int32_t *d = w->cdc + ((size_t)addr * 2 + uv) * 4;
                coeff[0] = d[0]; coeff[1] = d[1]; coeff[2] = d[2]; coeff[3] = d[3];
                write_block(w, addr, CHROMA_DC, uv, 0, 0, coeff);
            }
        if (cbp > 31)
            for (int uv = 0; uv < 2; uv++)
                for (int blk = 0; blk < 4; blk++) {
                    const int32_t *lv =
                        w->cl + (((size_t)addr * 2 + uv) * 4 + blk) * 16;
                    for (int k = 1; k < 16; k++) coeff[k - 1] = lv[w->zz4[k]];
                    write_block(w, addr, CHROMA_AC, uv, blk & 1, blk >> 1,
                                coeff);
                }
    }
}

static void write_mb(wr_t *w, int addr) {
    int mbt = w->mb_type[addr];
    int cbp = w->cbp[addr];
    if (w->slice_type == ST_I) write_mb_type_I(w, addr, mbt, cbp);
    else if (w->slice_type == ST_B) write_mb_type_B(w, addr, mbt, cbp);
    else write_mb_type_P(w, addr, mbt, cbp);

    if (mbt == P8x8M)
        for (int b8 = 0; b8 < 4; b8++)
            write_sub_mb_type(w, w->b8mode[4 * addr + b8],
                              w->b8pdir[4 * addr + b8]);
    if ((mbt == I4MB || mbt == I8MB) && w->t8_mode)
        write_transform_size(w, addr, mbt == I8MB);
    if (mbt == I4MB || mbt == I8MB) write_intra_pred_modes(w, addr);
    if (w->is_intra[addr] && (w->cfmt == 1 || w->cfmt == 2))
        write_cipred(w, addr);
    if (!w->is_intra[addr] && mbt != 0) write_motion(w, addr, mbt);
    if (mbt != I16MB) {
        write_cbp(w, addr, cbp);
        if (cbp == 0) w->last_dquant = 0;
    }
    /* inter transform_size_8x8_flag after CBP (need_transform_size,
     * macroblock.c:2901); direct_8x8_inference is always 1 here */
    if (mbt != I4MB && mbt != I8MB && mbt != I16MB && (cbp & 15)
        && w->t8_mode) {
        int eligible = (mbt == P16x16 || mbt == P16x8 || mbt == P8x16
                        || (mbt == 0 && w->slice_type == ST_B));
        if (mbt == P8x8M) {
            eligible = 1;
            for (int b = 0; b < 4; b++) {
                int b8m = w->b8mode[4 * addr + b];
                if (b8m != B8_DIRECT && b8m != B8_8x8) eligible = 0;
            }
        }
        if (eligible) write_transform_size(w, addr, w->t8[addr]);
    }
    if (cbp != 0 || mbt == I16MB) {
        int dq = w->qp[addr] - w->cur_qp;
        w->cur_qp = w->qp[addr];
        write_dquant(w, dq);
    }
    write_residuals(w, addr);
}

/* Returns payload size in BITS (multiple of 8 after the final
 * terminate(1)+flush), or -1 on unsupported input. */
long cabac_write_slice(
    int W, int H,
    const int32_t *mb_type, const uint8_t *skip_flag, const int32_t *cbp,
    const int32_t *qp, const int32_t *c_ipred_mode,
    const int32_t *b8mode, const int32_t *b8pdir,
    const int32_t *i16mode, const uint8_t *is_intra, const uint8_t *t8,
    const int32_t *slice_id,
    const int8_t *ipredmode, const int8_t *ref_idx, const int32_t *mvd,
    const int32_t *luma_levels, const int32_t *luma8_levels,
    const int32_t *luma_dc, const int32_t *chroma_dc,
    const int32_t *chroma_levels,
    int slice_type, int init_qp, int n_ref0, int n_ref1,
    int t8_mode, int cintra, int cfmt,
    const int32_t *mb_addrs, int n_addrs,
    const int32_t *p2c_map, const int32_t *p2c_last, const int32_t *t2c,
    const int32_t *zz4, const int32_t *zz8,
    uint8_t *states, uint8_t *mps, int64_t *cbp_bits,
    uint8_t *out, long out_cap_bits)
{
    wr_t w;
    memset(&w, 0, sizeof w);
    w.W = W; w.H = H; w.nmb = W * H; w.w4 = 4 * W;
    w.mb_type = mb_type; w.skip_flag = skip_flag; w.cbp = cbp; w.qp = qp;
    w.c_ipred_mode = c_ipred_mode; w.b8mode = b8mode; w.b8pdir = b8pdir;
    w.i16mode = i16mode; w.is_intra = is_intra; w.t8 = t8;
    w.slice_id = slice_id; w.ipredmode = ipredmode; w.ref_idx = ref_idx;
    w.mvd = mvd; w.ll = luma_levels; w.l8 = luma8_levels; w.ldc = luma_dc;
    w.cdc = chroma_dc; w.cl = chroma_levels;
    w.slice_type = slice_type; w.cur_qp = init_qp; w.last_dquant = 0;
    w.n_ref0 = n_ref0; w.n_ref1 = n_ref1; w.t8_mode = t8_mode;
    w.cintra = cintra; w.cfmt = cfmt;
    w.p2c_map = p2c_map; w.p2c_last = p2c_last; w.t2c = t2c;
    w.zz4 = zz4; w.zz8 = zz8; w.cbp_bits = cbp_bits;
    w.e.out = out; w.e.pos = 0; w.e.low = 0; w.e.range = 510;
    w.e.outstanding = 0; w.e.first_bit_done = 0;
    w.e.states = states; w.e.mps = mps;
    long safety = out_cap_bits - 4096;
    for (int i = 0; i < n_addrs; i++) {
        int addr = mb_addrs[i];
        if (w.mb_type[addr] == IPCM) return -1; /* unsupported: oracle path */
        if (slice_type != ST_I) write_mb_skip(&w, addr, skip_flag[addr]);
        if (!skip_flag[addr]) write_mb(&w, addr);
        else w.last_dquant = 0;
        terminate(&w.e, i == n_addrs - 1);
        if ((long)w.e.pos > safety) return -1;  /* capacity */
    }
    return (long)w.e.pos;
}
