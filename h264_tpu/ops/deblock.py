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
    """Filter one luma edge (16 independent line filters, vectorized)."""
    indexA = min(51, max(0, qp_avg + alpha_off))
    indexB = min(51, max(0, qp_avg + beta_off))
    alpha = int(ALPHA_TABLE[indexA])
    beta = int(BETA_TABLE[indexB])
    if alpha == 0:
        return
    clip_row = CLIP_TAB[indexA]
    S = np.asarray(S, np.int32)
    if dir_ == 0:
        seg = Y[y0 : y0 + 16, x0 - 4 : x0 + 4]  # rows x pixels
        L3, L2, L1, L0 = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
        R0, R1, R2, R3 = seg[:, 4], seg[:, 5], seg[:, 6], seg[:, 7]
    else:
        seg = Y[y0 - 4 : y0 + 4, x0 : x0 + 16]
        L3, L2, L1, L0 = seg[0], seg[1], seg[2], seg[3]
        R0, R1, R2, R3 = seg[4], seg[5], seg[6], seg[7]
    L3 = L3.astype(np.int64); L2 = L2.astype(np.int64); L1 = L1.astype(np.int64)
    L0 = L0.astype(np.int64); R0 = R0.astype(np.int64); R1 = R1.astype(np.int64)
    R2 = R2.astype(np.int64); R3 = R3.astype(np.int64)
    delta = R0 - L0
    active = (
        (S != 0)
        & (np.abs(delta) < alpha)
        & (np.abs(R0 - R1) < beta)
        & (np.abs(L0 - L1) < beta)
    )
    strong = active & (S == 4)
    normal = active & (S < 4)

    # --- strong (bs=4) ---
    RL0s = L0 + R0
    small_gap = np.abs(delta) < ((alpha >> 2) + 2)
    aps = (np.abs(L0 - L2) < beta) & small_gap
    aqs = (np.abs(R0 - R2) < beta) & small_gap
    sL2 = np.where(aps, (((L3 + L2) << 1) + L2 + L1 + RL0s + 4) >> 3, L2)
    sL1 = np.where(aps, (L2 + L1 + L0 + R0 + 2) >> 2, L1)
    sL0 = np.where(aps, (R1 + ((L1 + RL0s) << 1) + L2 + 4) >> 3,
                   ((L1 << 1) + L0 + R1 + 2) >> 2)
    sR0 = np.where(aqs, (L1 + ((R1 + RL0s) << 1) + R2 + 4) >> 3,
                   ((R1 << 1) + R0 + L1 + 2) >> 2)
    sR1 = np.where(aqs, (R2 + R0 + R1 + L0 + 2) >> 2, R1)
    sR2 = np.where(aqs, (((R3 + R2) << 1) + R2 + R1 + RL0s + 4) >> 3, R2)

    # --- normal (bs 1..3) ---
    C0 = clip_row[np.clip(S, 0, 4)].astype(np.int64)
    RL0n = (L0 + R0 + 1) >> 1
    apn = np.abs(L0 - L2) < beta
    aqn = np.abs(R0 - R2) < beta
    c0 = C0 + apn + aqn
    dif = np.clip(((delta << 2) + (L1 - R1) + 4) >> 3, -c0, c0)
    nL1 = L1 + np.where(apn, np.clip((L2 + RL0n - (L1 << 1)) >> 1, -C0, C0), 0)
    nR1 = R1 + np.where(aqn, np.clip((R2 + RL0n - (R1 << 1)) >> 1, -C0, C0), 0)
    nL0 = np.clip(L0 + dif, 0, max_val)
    nR0 = np.clip(R0 - dif, 0, max_val)

    oL2 = np.where(strong, sL2, L2)
    oL1 = np.where(strong, sL1, np.where(normal, nL1, L1))
    oL0 = np.where(strong, sL0, np.where(normal, nL0, L0))
    oR0 = np.where(strong, sR0, np.where(normal, nR0, R0))
    oR1 = np.where(strong, sR1, np.where(normal, nR1, R1))
    oR2 = np.where(strong, sR2, R2)
    if dir_ == 0:
        seg[:, 1] = oL2; seg[:, 2] = oL1; seg[:, 3] = oL0
        seg[:, 4] = oR0; seg[:, 5] = oR1; seg[:, 6] = oR2
    else:
        seg[1] = oL2; seg[2] = oL1; seg[3] = oL0
        seg[4] = oR0; seg[5] = oR1; seg[6] = oR2


def _filter_chroma_edge(C, S, qp_avg, alpha_off, beta_off, dir_, x0, y0,
                        pelnum, max_val):
    indexA = min(51, max(0, qp_avg + alpha_off))
    indexB = min(51, max(0, qp_avg + beta_off))
    alpha = int(ALPHA_TABLE[indexA])
    beta = int(BETA_TABLE[indexB])
    if alpha == 0:
        return
    clip_row = CLIP_TAB[indexA]
    pels = np.arange(pelnum)
    sidx = (((pels >> 1) << 2) + (pels & 1)) if pelnum == 8 else pels
    Sv = np.asarray(S, np.int32)[sidx]
    if dir_ == 0:
        seg = C[y0 : y0 + pelnum, x0 - 2 : x0 + 2]
        L1, L0, R0, R1 = (seg[:, i].astype(np.int64) for i in range(4))
    else:
        seg = C[y0 - 2 : y0 + 2, x0 : x0 + pelnum]
        L1, L0, R0, R1 = (seg[i].astype(np.int64) for i in range(4))
    delta = R0 - L0
    active = (
        (Sv != 0)
        & (np.abs(delta) < alpha)
        & (np.abs(R0 - R1) < beta)
        & (np.abs(L0 - L1) < beta)
    )
    strong = active & (Sv == 4)
    normal = active & (Sv < 4)
    sL0 = ((L1 << 1) + L0 + R1 + 2) >> 2
    sR0 = ((R1 << 1) + R0 + L1 + 2) >> 2
    C0 = clip_row[np.clip(Sv, 0, 4)].astype(np.int64)
    c0 = C0 + 1
    dif = np.clip(((delta << 2) + (L1 - R1) + 4) >> 3, -c0, c0)
    nL0 = np.clip(L0 + dif, 0, max_val)
    nR0 = np.clip(R0 - dif, 0, max_val)
    oL0 = np.where(strong, sL0, np.where(normal, nL0, L0))
    oR0 = np.where(strong, sR0, np.where(normal, nR0, R0))
    if dir_ == 0:
        seg[:, 1] = oL0
        seg[:, 2] = oR0
    else:
        seg[1] = oL0
        seg[2] = oR0


# chroma_edge[dir][edge] for 4:2:0 (-1 = no chroma edge)
_CHROMA_EDGE_420 = (((0, -1, 4, -1), (0, -1, 4, -1)))


def deblock_picture(st, sps, planes, sp_si=False):
    """Filter the full picture in MB raster order (frame, non-MBAFF)."""
    W, H = st.W, st.H
    Y, U, V = planes.Y, planes.U, planes.V
    max_y = (1 << sps.bit_depth_luma) - 1
    max_c = (1 << sps.bit_depth_chroma) - 1
    cw, chh = sps.mb_chroma_size
    BSV, BSH = _precompute_strengths(
        st, sp_si, field=getattr(sps, "is_field_picture", False))
    planes_native_ok = all(
        a is None or (a.dtype == np.int32 and a.flags.c_contiguous)
        for a in (Y, U, V)
    )
    if sps.chroma_format_idc in (0, 1) and planes_native_ok:
        from .. import native

        ok = native.deblock_run(
            Y, U, V,
            np.ascontiguousarray(BSV), np.ascontiguousarray(BSH),
            np.ascontiguousarray(st.qp, np.int32).reshape(-1),
            np.ascontiguousarray(st.qpc, np.int32),
            np.ascontiguousarray(st.lf_disable, np.int32),
            np.ascontiguousarray(st.lf_alpha, np.int32),
            np.ascontiguousarray(st.lf_beta, np.int32),
            np.ascontiguousarray(st.transform8x8, np.int32),
            np.ascontiguousarray(st.slice_id, np.int32),
            sps.chroma_format_idc, max_y, max_c, W, H,
        )
        if ok:
            return
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
        x4o, y4o = 4 * mb_x, 4 * mb_y
        for dir_ in (0, 1):
            edge_cond0 = filter_top if dir_ else filter_left
            for edge_i in range(4):
                edge = edge_i << 2
                if edge_i == 0 and not edge_cond0:
                    continue
                if dir_ == 0:
                    S = np.repeat(BSV[y4o : y4o + 4, x4o + edge_i], 4)
                else:
                    S = np.repeat(BSH[y4o + edge_i, x4o : x4o + 4], 4)
                if not S.any():
                    continue
                addr_p = addr - 1 if (dir_ == 0 and edge_i == 0) else (
                    addr - W if (dir_ == 1 and edge_i == 0) else addr
                )
                qp_q = int(st.qp[addr])
                qp_p = int(st.qp[addr_p])
                if not (t8 and edge_i in (1, 3)):
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



def _precompute_strengths(st, sp_si=False, field=False):
    """Vectorized boundary strengths for all edges (frame, non-MBAFF).

    Returns (BSV, BSH): BSV[y4, x4] = strength of the vertical edge to the
    LEFT of 4x4 block (x4, y4); BSH likewise for the horizontal edge above.
    Values per 4x4 block group (each covers 4 pels)."""
    H4, W4 = 4 * st.H, 4 * st.W
    nmb = st.n_mbs
    from ..decoder import mbtables as M

    intra_types = (M.I4MB, M.I8MB, M.I16MB, M.IPCM, M.SI4MB)
    if not sp_si:
        from .. import native

        bs = native.compute_strengths(st, field, intra_types)
        if bs is not None:
            return bs
    is_intra_mb = np.isin(st.mb_type, intra_types).reshape(st.H, st.W)
    intra_blk = np.repeat(np.repeat(is_intra_mb, 4, 0), 4, 1)
    cbp_arr = np.array(st.cbp_blk, dtype=np.int64).reshape(st.H, st.W)
    bits = (cbp_arr[:, :, None] >> np.arange(16)) & 1
    has_coef = (
        bits.reshape(st.H, st.W, 4, 4).transpose(0, 2, 1, 3).reshape(H4, W4)
    ).astype(np.bool_)

    ref0 = st.ref_idx[0]
    ref1 = st.ref_idx[1]
    rid0 = np.where(ref0 >= 0, st.ref_pic_id[0], _REF_NONE)
    rid1 = np.where(ref1 >= 0, st.ref_pic_id[1], _REF_NONE)
    mv0 = st.mv[0]
    mv1 = st.mv[1]

    # field pictures: vertical-MV threshold halves (field lines are two
    # frame lines apart — ldecod/src/loopFilter.c mvlimit = 2)
    mvlim_y = 2 if field else 4

    def mv_bs(sl_q, sl_p):
        rq0, rq1 = rid0[sl_q], rid1[sl_q]
        rp0, rp1 = rid0[sl_p], rid1[sl_p]
        same = ((rq0 == rp0) & (rq1 == rp1)) | ((rq0 == rp1) & (rq1 == rp0))

        def diff(a, b):
            return (np.abs(a[..., 0] - b[..., 0]) >= 4) | (
                np.abs(a[..., 1] - b[..., 1]) >= mvlim_y
            )

        q0, q1 = mv0[sl_q], mv1[sl_q]
        p0, p1 = mv0[sl_p], mv1[sl_p]
        straight = diff(q0, p0) | diff(q1, p1)
        crossed = diff(q0, p1) | diff(q1, p0)
        mixed_refs = rq0 != rq1
        bs_mv = np.where(
            mixed_refs,
            np.where(rq0 == rp0, straight, crossed),
            straight & crossed,
        )
        return np.where(same, bs_mv.astype(np.int32), 1)

    # vertical edges: q block (y, x), p block (y, x-1)
    BSV = np.zeros((H4, W4), np.int32)
    q = (slice(None), slice(1, None))
    p = (slice(None), slice(0, W4 - 1))
    coef_v = has_coef[q] | has_coef[p]
    bs_v = np.where(coef_v, 2, mv_bs(q, p))
    intra_v = intra_blk[q] | intra_blk[p]
    xs = np.arange(1, W4)
    mb_edge_v = (xs % 4 == 0)[None, :]
    bs_v = np.where(intra_v, np.where(mb_edge_v, 4, 3), bs_v)
    BSV[:, 1:] = bs_v
    # horizontal edges: q block (y, x), p block (y-1, x)
    BSH = np.zeros((H4, W4), np.int32)
    q = (slice(1, None), slice(None))
    p = (slice(0, H4 - 1), slice(None))
    coef_h = has_coef[q] | has_coef[p]
    bs_h = np.where(coef_h, 2, mv_bs(q, p))
    intra_h = intra_blk[q] | intra_blk[p]
    ys = np.arange(1, H4)
    mb_edge_h = (ys % 4 == 0)[:, None]
    # field pictures: intra HORIZONTAL MB edges use bS 3, not 4 (spec
    # §8.7 bS derivation: bS 4 needs a vertical edge OR frame coding;
    # the vertical neighbors of a field are 2 frame lines apart)
    strong_h = 3 if field else 4
    bs_h = np.where(intra_h, np.where(mb_edge_h, strong_h, 3), bs_h)
    BSH[1:, :] = bs_h
    if sp_si:
        BSV[:, :] = 3
        BSV[:, ::4] = 4
        BSH[:, :] = 3  # SP/SI handled coarsely; refined when SP lands
    return BSV, BSH
