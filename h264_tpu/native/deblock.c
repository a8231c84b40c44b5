/* In-loop deblocking filter, native serial implementation.
 *
 * Exact port of the framework's own host oracle (h264_tpu/ops/deblock.py):
 * MB raster order, vertical edges then horizontal per MB, strengths
 * precomputed per 4x4 edge by the caller (spec 8.7 semantics; reference
 * behavior ldecod/src/loopFilter.c DeblockPicture:89 / EdgeLoop*Normal).
 * Frame coding, non-MBAFF, 4:2:0 or monochrome.  The caller falls back to
 * the Python oracle for anything else.
 */

#include <stdint.h>

static const int32_t ALPHA_TABLE[52] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182,
    203, 226, 255, 255};

static const int32_t BETA_TABLE[52] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
    17, 17, 18, 18};

static const int32_t CLIP_TAB[52][5] = {
    {0,0,0,0,0},{0,0,0,0,0},{0,0,0,0,0},{0,0,0,0,0},{0,0,0,0,0},
    {0,0,0,0,0},{0,0,0,0,0},{0,0,0,0,0},{0,0,0,0,0},{0,0,0,0,0},
    {0,0,0,0,0},{0,0,0,0,0},{0,0,0,0,0},{0,0,0,0,0},{0,0,0,0,0},
    {0,0,0,0,0},{0,0,0,0,0},
    {0,0,0,1,1},{0,0,0,1,1},{0,0,0,1,1},{0,0,0,1,1},
    {0,0,1,1,1},{0,0,1,1,1},{0,1,1,1,1},{0,1,1,1,1},
    {0,1,1,1,1},{0,1,1,1,1},{0,1,1,2,2},{0,1,1,2,2},
    {0,1,1,2,2},{0,1,1,2,2},{0,1,2,3,3},{0,1,2,3,3},
    {0,2,2,3,3},{0,2,2,4,4},{0,2,3,4,4},{0,2,3,4,4},
    {0,3,3,5,5},{0,3,4,6,6},{0,3,4,6,6},{0,4,5,7,7},
    {0,4,5,8,8},{0,4,6,9,9},{0,5,7,10,10},{0,6,8,11,11},
    {0,6,8,13,13},{0,7,10,14,14},{0,8,11,16,16},{0,9,12,18,18},
    {0,10,13,20,20},{0,11,15,23,23},{0,13,17,25,25}};

static inline int32_t iclip(int32_t v, int32_t lo, int32_t hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}
static inline int32_t iabs(int32_t v) { return v < 0 ? -v : v; }

/* One luma edge: 16 line filters.  p0 = pixel L0 of line 0; pstep strides
 * across the edge (toward R), lstep along the edge.  S4 = strength per
 * 4-line group. */
static void filter_luma_edge(int32_t *p0, long pstep, long lstep,
                             const int32_t *S4, int qp_avg, int alpha_off,
                             int beta_off, int32_t max_val) {
    int indexA = iclip(qp_avg + alpha_off, 0, 51);
    int indexB = iclip(qp_avg + beta_off, 0, 51);
    int32_t alpha = ALPHA_TABLE[indexA];
    int32_t beta = BETA_TABLE[indexB];
    if (alpha == 0) return;
    const int32_t *clip_row = CLIP_TAB[indexA];
    for (int line = 0; line < 16; line++) {
        int32_t s = S4[line >> 2];
        if (s == 0) continue;
        int32_t *q = p0 + line * lstep;
        int32_t L3 = q[-3 * pstep], L2 = q[-2 * pstep], L1 = q[-pstep];
        int32_t L0 = q[0], R0 = q[pstep], R1 = q[2 * pstep];
        int32_t R2 = q[3 * pstep], R3 = q[4 * pstep];
        int32_t delta = R0 - L0;
        if (iabs(delta) >= alpha || iabs(R0 - R1) >= beta ||
            iabs(L0 - L1) >= beta)
            continue;
        if (s == 4) {
            int32_t RL0 = L0 + R0;
            int small_gap = iabs(delta) < ((alpha >> 2) + 2);
            int ap = (iabs(L0 - L2) < beta) && small_gap;
            int aq = (iabs(R0 - R2) < beta) && small_gap;
            int32_t oL2 = ap ? ((((L3 + L2) << 1) + L2 + L1 + RL0 + 4) >> 3)
                             : L2;
            int32_t oL1 = ap ? ((L2 + L1 + L0 + R0 + 2) >> 2) : L1;
            int32_t oL0 = ap ? ((R1 + ((L1 + RL0) << 1) + L2 + 4) >> 3)
                             : (((L1 << 1) + L0 + R1 + 2) >> 2);
            int32_t oR0 = aq ? ((L1 + ((R1 + RL0) << 1) + R2 + 4) >> 3)
                             : (((R1 << 1) + R0 + L1 + 2) >> 2);
            int32_t oR1 = aq ? ((R2 + R0 + R1 + L0 + 2) >> 2) : R1;
            int32_t oR2 = aq ? ((((R3 + R2) << 1) + R2 + R1 + RL0 + 4) >> 3)
                             : R2;
            q[-2 * pstep] = oL2;
            q[-pstep] = oL1;
            q[0] = oL0;
            q[pstep] = oR0;
            q[2 * pstep] = oR1;
            q[3 * pstep] = oR2;
        } else {
            int32_t C0 = clip_row[s];
            int32_t RL0 = (L0 + R0 + 1) >> 1;
            int ap = iabs(L0 - L2) < beta;
            int aq = iabs(R0 - R2) < beta;
            int32_t c0 = C0 + ap + aq;
            int32_t dif =
                iclip(((delta << 2) + (L1 - R1) + 4) >> 3, -c0, c0);
            int32_t oL1 =
                ap ? L1 + iclip((L2 + RL0 - (L1 << 1)) >> 1, -C0, C0) : L1;
            int32_t oR1 =
                aq ? R1 + iclip((R2 + RL0 - (R1 << 1)) >> 1, -C0, C0) : R1;
            q[-pstep] = oL1;
            q[0] = iclip(L0 + dif, 0, max_val);
            q[pstep] = iclip(R0 - dif, 0, max_val);
            q[2 * pstep] = oR1;
        }
    }
}

/* One chroma edge: pelnum line filters (8 for 4:2:0).  Strength index per
 * line follows the oracle: for pelnum==8 line i uses S4[(((i>>1)<<2)+(i&1))>>2]
 * which reduces to S4[i>>1]. */
static void filter_chroma_edge(int32_t *p0, long pstep, long lstep,
                               const int32_t *S4, int qp_avg, int alpha_off,
                               int beta_off, int pelnum, int32_t max_val) {
    int indexA = iclip(qp_avg + alpha_off, 0, 51);
    int indexB = iclip(qp_avg + beta_off, 0, 51);
    int32_t alpha = ALPHA_TABLE[indexA];
    int32_t beta = BETA_TABLE[indexB];
    if (alpha == 0) return;
    const int32_t *clip_row = CLIP_TAB[indexA];
    for (int line = 0; line < pelnum; line++) {
        int sidx = (pelnum == 8) ? ((((line >> 1) << 2) + (line & 1)) >> 2)
                                 : (line >> 2);
        int32_t s = S4[sidx];
        if (s == 0) continue;
        int32_t *q = p0 + line * lstep;
        int32_t L1 = q[-pstep], L0 = q[0], R0 = q[pstep], R1 = q[2 * pstep];
        int32_t delta = R0 - L0;
        if (iabs(delta) >= alpha || iabs(R0 - R1) >= beta ||
            iabs(L0 - L1) >= beta)
            continue;
        if (s == 4) {
            q[0] = ((L1 << 1) + L0 + R1 + 2) >> 2;
            q[pstep] = ((R1 << 1) + R0 + L1 + 2) >> 2;
        } else {
            int32_t c0 = clip_row[s] + 1;
            int32_t dif =
                iclip(((delta << 2) + (L1 - R1) + 4) >> 3, -c0, c0);
            q[0] = iclip(L0 + dif, 0, max_val);
            q[pstep] = iclip(R0 - dif, 0, max_val);
        }
    }
}

/* Full-picture deblock.  BSV[y4*W4+x4] = strength of the vertical edge left
 * of 4x4 block (x4,y4); BSH likewise above.  chroma: cfi==1 (4:2:0) filters
 * U/V at edges 0 and 8 luma-pels (chroma cols 0 and 4); cfi==0 = mono. */
void deblock_run(int32_t *Y, int32_t *U, int32_t *V, int W_pix, int H_pix,
                 int n_mbW, int n_mbH, const int32_t *BSV, const int32_t *BSH,
                 const int32_t *qp, const int32_t *qpc,
                 const int32_t *lf_disable, const int32_t *lf_alpha,
                 const int32_t *lf_beta, const int32_t *transform8x8,
                 const int32_t *slice_id, int cfi, int32_t max_y,
                 int32_t max_c) {
    int W4 = 4 * n_mbW;
    int cW = W_pix >> 1; /* 4:2:0 chroma stride */
    int n_mbs = n_mbW * n_mbH;
    int32_t S[4];
    for (int addr = 0; addr < n_mbs; addr++) {
        if (lf_disable[addr] == 1) continue;
        int mb_x = addr % n_mbW, mb_y = addr / n_mbW;
        int t8 = transform8x8[addr];
        int alpha_off = lf_alpha[addr];
        int beta_off = lf_beta[addr];
        int filter_left = mb_x != 0;
        int filter_top = mb_y != 0;
        if (lf_disable[addr] == 2) {
            if (filter_left)
                filter_left = slice_id[addr - 1] == slice_id[addr];
            if (filter_top)
                filter_top = slice_id[addr - n_mbW] == slice_id[addr];
        }
        int x4o = 4 * mb_x, y4o = 4 * mb_y;
        for (int dir = 0; dir < 2; dir++) {
            int edge_cond0 = dir ? filter_top : filter_left;
            for (int edge_i = 0; edge_i < 4; edge_i++) {
                if (edge_i == 0 && !edge_cond0) continue;
                int any = 0;
                if (dir == 0)
                    for (int k = 0; k < 4; k++)
                        any |= (S[k] = BSV[(y4o + k) * W4 + x4o + edge_i]);
                else
                    for (int k = 0; k < 4; k++)
                        any |= (S[k] = BSH[(y4o + edge_i) * W4 + x4o + k]);
                if (!any) continue;
                int addr_p = addr;
                if (edge_i == 0) addr_p = dir == 0 ? addr - 1 : addr - n_mbW;
                int qp_avg = (qp[addr_p] + qp[addr] + 1) >> 1;
                if (!(t8 && (edge_i == 1 || edge_i == 3))) {
                    if (dir == 0)
                        filter_luma_edge(
                            Y + (long)(mb_y * 16) * W_pix + mb_x * 16 +
                                4 * edge_i - 1,
                            1, W_pix, S, qp_avg, alpha_off, beta_off, max_y);
                    else
                        filter_luma_edge(
                            Y + (long)(mb_y * 16 + 4 * edge_i - 1) * W_pix +
                                mb_x * 16,
                            W_pix, 1, S, qp_avg, alpha_off, beta_off, max_y);
                }
                if (cfi == 1 && U && (edge_i == 0 || edge_i == 2)) {
                    int edge_cr = edge_i == 0 ? 0 : 4;
                    for (int uv = 0; uv < 2; uv++) {
                        int32_t *C = uv ? V : U;
                        int qp_avg_c =
                            (qpc[2 * addr_p + uv] + qpc[2 * addr + uv] + 1) >>
                            1;
                        if (dir == 0)
                            filter_chroma_edge(
                                C + (long)(mb_y * 8) * cW + mb_x * 8 +
                                    edge_cr - 1,
                                1, cW, S, qp_avg_c, alpha_off, beta_off, 8,
                                max_c);
                        else
                            filter_chroma_edge(
                                C + (long)(mb_y * 8 + edge_cr - 1) * cW +
                                    mb_x * 8,
                                cW, 1, S, qp_avg_c, alpha_off, beta_off, 8,
                                max_c);
                    }
                }
            }
        }
    }
}

/* Boundary-strength precomputation (spec 8.7 bS derivation), the C dual
 * of ops/deblock.py:_precompute_strengths (frame, non-MBAFF).
 * is_intra: [H][W] u8 per MB; cbp_blk: [H*W] i64 (bit per 4x4 block);
 * rid0/rid1: [H4*W4] i64 ref-pic ids (REF_NONE for unused);
 * mv0/mv1: [H4*W4*2] i32; BSV/BSH out: [H4*W4] i32.
 * field: halves the vertical-mv threshold and weakens horizontal
 * intra MB edges to bS 3 (loopFilter.c mvlimit). */
void compute_strengths(const uint8_t *is_intra, const int64_t *cbp_blk,
                       const int64_t *rid0, const int64_t *rid1,
                       const int32_t *mv0, const int32_t *mv1,
                       int W, int H, int field,
                       int32_t *BSV, int32_t *BSH) {
    int W4 = 4 * W, H4 = 4 * H;
    int mvlim_y = field ? 2 : 4;
    int strong_h = field ? 3 : 4;
    for (long i = 0; i < (long)W4 * H4; i++) { BSV[i] = 0; BSH[i] = 0; }
    for (int y = 0; y < H4; y++) {
        for (int x = 0; x < W4; x++) {
            long q = (long)y * W4 + x;
            int mbq = (y >> 2) * W + (x >> 2);
            int iq = is_intra[mbq];
            int cq = (cbp_blk[mbq] >> (((y & 3) << 2) | (x & 3))) & 1;
            for (int dir = 0; dir < 2; dir++) {
                int xp = dir ? x : x - 1;
                int yp = dir ? y - 1 : y;
                if (xp < 0 || yp < 0) continue;
                long p = (long)yp * W4 + xp;
                int mbp = (yp >> 2) * W + (xp >> 2);
                int32_t *out = dir ? BSH + q : BSV + q;
                int ip = is_intra[mbp];
                if (iq | ip) {
                    int mb_edge = dir ? (y & 3) == 0 : (x & 3) == 0;
                    *out = mb_edge ? (dir ? strong_h : 4) : 3;
                    continue;
                }
                int cp = (cbp_blk[mbp] >> (((yp & 3) << 2) | (xp & 3))) & 1;
                if (cq | cp) { *out = 2; continue; }
                int64_t rq0 = rid0[q], rq1 = rid1[q];
                int64_t rp0 = rid0[p], rp1 = rid1[p];
                int same = (rq0 == rp0 && rq1 == rp1) ||
                           (rq0 == rp1 && rq1 == rp0);
                if (!same) { *out = 1; continue; }
                const int32_t *q0 = mv0 + 2 * q, *q1 = mv1 + 2 * q;
                const int32_t *p0 = mv0 + 2 * p, *p1 = mv1 + 2 * p;
#define MVDIFF(a, b) \
    (iabs((a)[0] - (b)[0]) >= 4 || iabs((a)[1] - (b)[1]) >= mvlim_y)
                int straight = MVDIFF(q0, p0) || MVDIFF(q1, p1);
                int crossed = MVDIFF(q0, p1) || MVDIFF(q1, p0);
#undef MVDIFF
                int bs;
                if (rq0 != rq1) bs = (rq0 == rp0) ? straight : crossed;
                else bs = straight && crossed;
                *out = bs;
            }
        }
    }
}
