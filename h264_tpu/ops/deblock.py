"""In-loop deblocking filter (spec §8.7) — host oracle implementation.

Sequential per-MB filtering in raster order, vertical edges then
horizontal, matching the reference exactly (ldecod/src/loopFilter.c
DeblockPicture:89 / DeblockMb / GetStrengthNormal:262 /
EdgeLoopLumaNormal:529 / EdgeLoopChromaNormal:815).  The batched TPU
version (full-frame two-pass, SURVEY.md §5 long-context note) is
validated against this path.

Threshold tables are the normative spec Tables 8-16/8-17 constants.
"""

from __future__ import annotations

import numpy as np

ALPHA_TABLE = np.array(
    [0] * 16
    + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36, 40,
       45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203, 226,
       255, 255],
    dtype=np.int32,
)
BETA_TABLE = np.array(
    [0] * 16
    + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11,
       12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18],
    dtype=np.int32,
)
CLIP_TAB = np.array(
    [[0, 0, 0, 0, 0]] * 17
    + [
        [0, 0, 0, 1, 1], [0, 0, 0, 1, 1], [0, 0, 0, 1, 1], [0, 0, 0, 1, 1],
        [0, 0, 1, 1, 1], [0, 0, 1, 1, 1], [0, 1, 1, 1, 1], [0, 1, 1, 1, 1],
        [0, 1, 1, 1, 1], [0, 1, 1, 1, 1], [0, 1, 1, 2, 2], [0, 1, 1, 2, 2],
        [0, 1, 1, 2, 2], [0, 1, 1, 2, 2], [0, 1, 2, 3, 3], [0, 1, 2, 3, 3],
        [0, 2, 2, 3, 3], [0, 2, 2, 4, 4], [0, 2, 3, 4, 4], [0, 2, 3, 4, 4],
        [0, 3, 3, 5, 5], [0, 3, 4, 6, 6], [0, 3, 4, 6, 6], [0, 4, 5, 7, 7],
        [0, 4, 5, 8, 8], [0, 4, 6, 9, 9], [0, 5, 7, 10, 10], [0, 6, 8, 11, 11],
        [0, 6, 8, 13, 13], [0, 7, 10, 14, 14], [0, 8, 11, 16, 16],
        [0, 9, 12, 18, 18], [0, 10, 13, 20, 20], [0, 11, 15, 23, 23],
        [0, 13, 17, 25, 25],
    ],
    dtype=np.int32,
)

_INTRA_TYPES = frozenset()  # filled by caller module to avoid circular import


def _is_intra_type(mbt: int) -> bool:
    from ..decoder import mbtables as M

    return mbt in (M.I4MB, M.I8MB, M.I16MB, M.IPCM, M.SI4MB)


def _strength_edge(st, addr_q, addr_p, dir_, edge, sp_si: bool):
    """Strength[16] for one edge (GetStrengthNormal semantics)."""
    mbt_q = int(st.mb_type[addr_q])
    mbt_p = int(st.mb_type[addr_p])
    if sp_si:
        return np.full(16, 4 if edge == 0 else 3, np.uint8)
    if _is_intra_type(mbt_q) or _is_intra_type(mbt_p):
        return np.full(16, 4 if edge == 0 else 3, np.uint8)
    S = np.empty(16, np.uint8)
    W = st.W
    x4q, y4q = st.mb_block_origin(addr_q)
    cbp_q = st.cbp_blk[addr_q]
    cbp_p = st.cbp_blk[addr_p]
    for idx in range(0, 16, 4):
        if dir_ == 0:  # vertical edge: q block at (edge>>2, idx>>2)
            bxq, byq = edge >> 2, idx >> 2
            bxp, byp = (edge >> 2) - 1, idx >> 2
        else:
            bxq, byq = idx >> 2, edge >> 2
            bxp, byp = idx >> 2, (edge >> 2) - 1
        # p-side picture block coords
        pxq, pyq = x4q + bxq, y4q + byq
        pxp, pyp = x4q + bxp, y4q + byp
        blkq_bit = 4 * byq + bxq
        blkp_bit = 4 * (byp & 3) + (bxp & 3)
        if ((cbp_q >> blkq_bit) & 1) or ((cbp_p >> blkp_bit) & 1):
            s = 2
        else:
            s = _mv_strength(st, pxq, pyq, pxp, pyp)
        S[idx : idx + 4] = s
    return S


_REF_NONE = -(10 ** 9)


def _mv_strength(st, pxq, pyq, pxp, pyp, mvlimit=4):
    rid = st.ref_pic_id
    mv = st.mv
    ref_p0 = _REF_NONE if st.ref_idx[0, pyq, pxq] < 0 else int(rid[0, pyq, pxq])
    ref_q0 = _REF_NONE if st.ref_idx[0, pyp, pxp] < 0 else int(rid[0, pyp, pxp])
    ref_p1 = _REF_NONE if st.ref_idx[1, pyq, pxq] < 0 else int(rid[1, pyq, pxq])
    ref_q1 = _REF_NONE if st.ref_idx[1, pyp, pxp] < 0 else int(rid[1, pyp, pxp])
    if not (
        (ref_p0 == ref_q0 and ref_p1 == ref_q1)
        or (ref_p0 == ref_q1 and ref_p1 == ref_q0)
    ):
        return 1
    mvl0q = mv[0, pyq, pxq]
    mvl1q = mv[1, pyq, pxq]
    mvl0p = mv[0, pyp, pxp]
    mvl1p = mv[1, pyp, pxp]

    def differs(a, b):
        return int(abs(int(a[0]) - int(b[0])) >= 4 or abs(int(a[1]) - int(b[1])) >= mvlimit)

    if ref_p0 != ref_p1:
        if ref_p0 == ref_q0:
            return differs(mvl0q, mvl0p) | differs(mvl1q, mvl1p)
        return differs(mvl0q, mvl1p) | differs(mvl1q, mvl0p)
    return (differs(mvl0q, mvl0p) | differs(mvl1q, mvl1p)) & (
        differs(mvl0q, mvl1p) | differs(mvl1q, mvl0p)
    )


def _filter_luma_edge(Y, S, qp_avg, alpha_off, beta_off, dir_, x0, y0, max_val):
    indexA = min(51, max(0, qp_avg + alpha_off))
    indexB = min(51, max(0, qp_avg + beta_off))
    alpha = int(ALPHA_TABLE[indexA])
    beta = int(BETA_TABLE[indexB])
    clip = CLIP_TAB[indexA]
    for pel in range(16):
        strng = int(S[pel])
        if strng == 0:
            continue
        if dir_ == 0:
            yy, xx = y0 + pel, x0
            q = Y[yy, xx : xx + 4]
            pvals = Y[yy, xx - 4 : xx]
            L3, L2, L1, L0 = (int(v) for v in pvals)
            R0, R1, R2, R3 = (int(v) for v in q)
        else:
            yy, xx = y0, x0 + pel
            col_p = Y[yy - 4 : yy, xx]
            col_q = Y[yy : yy + 4, xx]
            L3, L2, L1, L0 = (int(v) for v in col_p)
            R0, R1, R2, R3 = (int(v) for v in col_q)
        delta = R0 - L0
        if abs(delta) >= alpha:
            continue
        if abs(R0 - R1) >= beta or abs(L0 - L1) >= beta:
            continue
        if strng == 4:
            RL0 = L0 + R0
            small_gap = abs(delta) < ((alpha >> 2) + 2)
            aq = (abs(R0 - R2) < beta) & small_gap
            ap = (abs(L0 - L2) < beta) & small_gap
            if ap:
                nL2 = (((L3 + L2) << 1) + L2 + L1 + RL0 + 4) >> 3
                nL1 = (L2 + L1 + L0 + R0 + 2) >> 2
                nL0 = (R1 + ((L1 + RL0) << 1) + L2 + 4) >> 3
            else:
                nL2, nL1 = L2, L1
                nL0 = ((L1 << 1) + L0 + R1 + 2) >> 2
            if aq:
                nR0 = (L1 + ((R1 + RL0) << 1) + R2 + 4) >> 3
                nR1 = (R2 + R0 + R1 + L0 + 2) >> 2
                nR2 = (((R3 + R2) << 1) + R2 + R1 + RL0 + 4) >> 3
            else:
                nR0 = ((R1 << 1) + R0 + L1 + 2) >> 2
                nR1, nR2 = R1, R2
            out_p = (L3, nL2, nL1, nL0)
            out_q = (nR0, nR1, nR2, R3)
        else:
            C0 = int(clip[strng])
            RL0 = (L0 + R0 + 1) >> 1
            aq = abs(R0 - R2) < beta
            ap = abs(L0 - L2) < beta
            c0 = C0 + ap + aq
            dif = max(-c0, min(c0, ((delta << 2) + (L1 - R1) + 4) >> 3))
            nL1 = L1 + (max(-C0, min(C0, (L2 + RL0 - (L1 << 1)) >> 1)) if ap else 0)
            nR1 = R1 + (max(-C0, min(C0, (R2 + RL0 - (R1 << 1)) >> 1)) if aq else 0)
            nL0 = max(0, min(max_val, L0 + dif))
            nR0 = max(0, min(max_val, R0 - dif))
            out_p = (L3, L2, nL1, nL0)
            out_q = (nR0, nR1, R2, R3)
        if dir_ == 0:
            Y[yy, xx - 4 : xx] = out_p
            Y[yy, xx : xx + 4] = out_q
        else:
            Y[yy - 4 : yy, xx] = out_p
            Y[yy : yy + 4, xx] = out_q


def _filter_chroma_edge(C, S, qp_avg, alpha_off, beta_off, dir_, x0, y0,
                        pelnum, max_val):
    indexA = min(51, max(0, qp_avg + alpha_off))
    indexB = min(51, max(0, qp_avg + beta_off))
    alpha = int(ALPHA_TABLE[indexA])
    beta = int(BETA_TABLE[indexB])
    clip = CLIP_TAB[indexA]
    for pel in range(pelnum):
        sidx = (((pel >> 1) << 2) + (pel & 1)) if pelnum == 8 else pel
        strng = int(S[sidx])
        if strng == 0:
            continue
        if dir_ == 0:
            yy, xx = y0 + pel, x0
            L1, L0 = int(C[yy, xx - 2]), int(C[yy, xx - 1])
            R0, R1 = int(C[yy, xx]), int(C[yy, xx + 1])
        else:
            yy, xx = y0, x0 + pel
            L1, L0 = int(C[yy - 2, xx]), int(C[yy - 1, xx])
            R0, R1 = int(C[yy, xx]), int(C[yy + 1, xx])
        delta = R0 - L0
        if abs(delta) >= alpha:
            continue
        if abs(R0 - R1) >= beta or abs(L0 - L1) >= beta:
            continue
        if strng == 4:
            nL0 = ((L1 << 1) + L0 + R1 + 2) >> 2
            nR0 = ((R1 << 1) + R0 + L1 + 2) >> 2
        else:
            C0 = int(clip[strng])
            c0 = C0 + 1
            dif = max(-c0, min(c0, ((delta << 2) + (L1 - R1) + 4) >> 3))
            nL0 = max(0, min(max_val, L0 + dif))
            nR0 = max(0, min(max_val, R0 - dif))
        if dir_ == 0:
            C[yy, xx - 1] = nL0
            C[yy, xx] = nR0
        else:
            C[yy - 1, xx] = nL0
            C[yy, xx] = nR0


# chroma_edge[dir][edge] for 4:2:0 (-1 = no chroma edge)
_CHROMA_EDGE_420 = (((0, -1, 4, -1), (0, -1, 4, -1)))


def deblock_picture(st, sps, planes, sp_si=False):
    """Filter the full picture in MB raster order (frame, non-MBAFF)."""
    W, H = st.W, st.H
    Y, U, V = planes.Y, planes.U, planes.V
    max_y = (1 << sps.bit_depth_luma) - 1
    max_c = (1 << sps.bit_depth_chroma) - 1
    cw, chh = sps.mb_chroma_size
    for addr in range(st.n_mbs):
        mb_x, mb_y = addr % W, addr // W
        if st.lf_disable[addr] == 1:
            continue
        t8 = bool(st.transform8x8[addr])
        alpha_off = int(st.lf_alpha[addr])
        beta_off = int(st.lf_beta[addr])
        filter_left = mb_x != 0
        filter_top = mb_y != 0
        if st.lf_disable[addr] == 2:
            filter_left = filter_left and st.mb_avail(addr - 1, addr)
            filter_top = filter_top and st.mb_avail(addr - W, addr)
        for dir_ in (0, 1):
            edge_cond0 = filter_top if dir_ else filter_left
            for edge_i in range(4):
                edge = edge_i << 2
                if edge_i == 0 and not edge_cond0:
                    continue
                if t8 and edge_i in (1, 3):
                    luma_this_edge = False
                else:
                    luma_this_edge = True
                addr_p = addr - 1 if (dir_ == 0 and edge_i == 0) else (
                    addr - W if (dir_ == 1 and edge_i == 0) else addr
                )
                S = _strength_edge(st, addr, addr_p, dir_, edge, sp_si)
                if not S.any():
                    continue
                qp_q = int(st.qp[addr])
                qp_p = int(st.qp[addr_p])
                if luma_this_edge:
                    qp_avg = (qp_p + qp_q + 1) >> 1
                    if dir_ == 0:
                        _filter_luma_edge(
                            Y, S, qp_avg, alpha_off, beta_off, 0,
                            mb_x * 16 + edge, mb_y * 16, max_y,
                        )
                    else:
                        _filter_luma_edge(
                            Y, S, qp_avg, alpha_off, beta_off, 1,
                            mb_x * 16, mb_y * 16 + edge, max_y,
                        )
                if sps.chroma_format_idc == 1 and U is not None:
                    edge_cr = (0, -1, 4, -1)[edge_i]
                    if edge_cr >= 0:
                        for uv, C in ((0, U), (1, V)):
                            qp_avg_c = (
                                int(st.qpc[addr_p, uv]) + int(st.qpc[addr, uv]) + 1
                            ) >> 1
                            if dir_ == 0:
                                _filter_chroma_edge(
                                    C, S, qp_avg_c, alpha_off, beta_off, 0,
                                    mb_x * cw + edge_cr, mb_y * chh, 8, max_c,
                                )
                            else:
                                _filter_chroma_edge(
                                    C, S, qp_avg_c, alpha_off, beta_off, 1,
                                    mb_x * cw, mb_y * chh + edge_cr, 8, max_c,
                                )
