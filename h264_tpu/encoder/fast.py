"""Fast P-frame encode path: the whole pixel pipeline in one jitted
device program (SURVEY.md §7.1 "batching replaces raster order").

Per frame, on device:
  1. dense integer-pel SAD grids for every MB (FastFullSearch analog)
  2. quarter-pel refinement against precomputed half-pel planes
     (UnifiedOneForthPix strategy — bit-identical to decoder MC)
  3. motion compensation, residual transform/quant, reconstruction for
     luma and chroma

Host tail (thin): P_Skip detection, PMV/MVD derivation, state fill,
deblocking, CAVLC packing.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..decoder import mbtables as M
from ..ops import interp as MC
from ..ops import quant as Q
from ..ops import transforms as TR
from .rd import _lam_cost

PAD = MC.PAD
_REFINE = [(dx, dy) for dy in range(-3, 4) for dx in range(-3, 4)]


def _mv_bits_arr(d):
    k = 2 * jnp.abs(d) - (d > 0)
    bl = jnp.floor(jnp.log2(k.astype(jnp.float32) + 1.0)).astype(jnp.int32) + 1
    return 2 * bl - 1


@functools.partial(
    jax.jit, static_argnames=("H", "W", "R", "qp", "qp_c", "lambda_me")
)
def p_frame_pipeline(cur_y8, cur_u8, cur_v8, ref_pad, bpl, hpl, jpl,
                     ref_u_pad, ref_v_pad, H: int, W: int, R: int, qp: int,
                     qp_c: int, lambda_me: int):
    """Fully device-resident P-frame step: ME/MC/TQ/recon + in-loop deblock
    + next-frame reference preparation, one jit call.

    Inputs: uint8 current planes + previous device ref state.  Returns
    (host outputs, next device ref state); only the host outputs are ever
    transferred (int16/uint8), the ref state chains on device so encode
    dispatch never blocks on a host round-trip."""
    out = _p_frame_core(
        cur_y8.astype(jnp.int32), cur_u8.astype(jnp.int32),
        cur_v8.astype(jnp.int32), ref_pad, bpl, hpl, jpl, ref_u_pad,
        ref_v_pad, H, W, R, qp, qp_c, lambda_me,
    )
    (mvx_f, mvy_f, lev, rec_y, lev_u, dc_u, rec_u, lev_v, dc_v, rec_v,
     sad0) = out
    n_my, n_mx = H // 16, W // 16
    # strengths from device state (all-inter single-ref fast path)
    nz4 = lev.reshape(H // 4, W // 4, 16).any(axis=-1)
    BSV, BSH = strengths_device_p(
        nz4, mvx_f.reshape(n_my, n_mx), mvy_f.reshape(n_my, n_mx)
    )
    dy_, du_, dv_ = deblock_device_p(rec_y, rec_u, rec_v, BSV, BSH, qp, qp_c)
    # next reference state (stays on device)
    Ypad = jnp.pad(dy_, PAD, mode="edge")
    b, h, j = _half_planes_core(Ypad)
    Upad = jnp.pad(du_, PAD, mode="edge")
    Vpad = jnp.pad(dv_, PAD, mode="edge")
    # one flat int32 buffer per frame (int32: narrow dtypes take a 10x
    # slower d2h relayout path through the tunnel): a single device->host
    # transfer per fetch group, batched across frames by the caller.
    # Reconstruction planes stay on device (handles returned separately;
    # fetched lazily only when the user asks for recon output).
    host_out = jnp.concatenate([
        mvx_f.reshape(-1), mvy_f.reshape(-1), lev.reshape(-1),
        lev_u.reshape(-1), dc_u.reshape(-1),
        lev_v.reshape(-1), dc_v.reshape(-1),
    ])
    return host_out, (dy_, du_, dv_), (Ypad, b, h, j, Upad, Vpad)


@jax.jit
def stack_outputs(flats):
    """Stack per-frame flat outputs for one batched d2h fetch."""
    return jnp.stack(flats)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "R", "qp", "qp_c", "lambda_me")
)
def p_frame_device(cur_y, cur_u, cur_v, ref_pad, bpl, hpl, jpl, ref_u_pad,
                   ref_v_pad, H: int, W: int, R: int, qp: int, qp_c: int,
                   lambda_me: int):
    """Legacy single-call pipeline (pre-deblock recon outputs)."""
    return _p_frame_core(cur_y, cur_u, cur_v, ref_pad, bpl, hpl, jpl,
                         ref_u_pad, ref_v_pad, H, W, R, qp, qp_c, lambda_me)


def _p_frame_core(cur_y, cur_u, cur_v, ref_pad, bpl, hpl, jpl, ref_u_pad,
                  ref_v_pad, H: int, W: int, R: int, qp: int, qp_c: int,
                  lambda_me: int):
    """Full P-frame pixel pipeline. Returns per-MB MVs, levels, cbp parts,
    and reconstructed (pre-deblock) planes."""
    n_my, n_mx = H // 16, W // 16
    n_mb = n_my * n_mx

    # ---- 1. integer-pel SSD grids on the MXU ---------------------------
    # SSD(mb, dy, dx) = sum(ref_win^2) - 2*cross + sum(cur_mb^2), with the
    # cross term a 16x16 conv of the reference against every MB as a
    # filter bank (one bf16 matmul-shaped conv; pixel values 0..255 are
    # exact in bf16 and the 256-term f32 accumulation stays < 2^24, so
    # the result is EXACT integer SSD).  The window-energy term uses an
    # exact int32 separable sliding sum.
    D = 2 * R + 1
    refw = ref_pad[PAD - R : PAD + H + R, PAD - R : PAD + W + R]
    # cross-correlation: filters = the n_mb current MBs
    curb = (
        cur_y.reshape(n_my, 16, n_mx, 16).transpose(0, 2, 1, 3)
        .reshape(n_mb, 1, 16, 16).astype(jnp.bfloat16)
    )
    cross = jax.lax.conv_general_dilated(
        refw[None, None].astype(jnp.bfloat16), curb,
        window_strides=(1, 1), padding="VALID",
        preferred_element_type=jnp.float32,
    )[0]  # (n_mb, H+2R-15, W+2R-15)
    # ref window energy via separable 16-tap sliding sums (exact int32)
    r2 = refw * refw
    vc = jnp.cumsum(jnp.pad(r2, ((1, 0), (0, 0))), axis=0)
    vbox = vc[16:] - vc[:-16]  # (H+2R-15, W+2R)
    hc = jnp.cumsum(jnp.pad(vbox, ((0, 0), (1, 0))), axis=1)
    ref2 = hc[:, 16:] - hc[:, :-16]  # (H+2R-15, W+2R-15)
    cur2 = (curb.astype(jnp.float32) ** 2).sum(axis=(1, 2, 3))  # (n_mb,)

    def mb_windows(i):
        y0 = (i // n_mx) * 16
        x0 = (i % n_mx) * 16
        cw = jax.lax.dynamic_slice(cross[i], (y0, x0), (D, D))
        rw = jax.lax.dynamic_slice(ref2, (y0, x0), (D, D))
        return rw.astype(jnp.float32) - 2.0 * cw + cur2[i]

    ssd = jax.vmap(mb_windows)(jnp.arange(n_mb))  # (n_mb, D, D) exact
    grids = (
        ssd.astype(jnp.int32).reshape(n_my, n_mx, D, D).transpose(2, 3, 0, 1)
    )
    # MV rate prior (relative to zero MV; exact PMV rate applied on host
    # only for the skip/mvd bits — this biases the search like JM's
    # mvcost around the predictor).  lambda_me is the full lambda_mode
    # (SSD is in squared-error units, like the mode-decision J).
    dgrid = jnp.arange(-R, R + 1) * 4
    bits = _mv_bits_arr(dgrid)[None, :] + _mv_bits_arr(dgrid)[:, None]
    cost = grids + _lam_cost(lambda_me, bits)[..., None, None]
    flat = cost.reshape(-1, n_my, n_mx)
    best = jnp.argmin(flat, axis=0)
    int_mvy = (best // (2 * R + 1) - R).astype(jnp.int32)
    int_mvx = (best % (2 * R + 1) - R).astype(jnp.int32)

    # ---- 2. quarter-pel refinement ------------------------------------
    mb_ys = (jnp.arange(n_mb) // n_mx) * 16
    mb_xs = (jnp.arange(n_mb) % n_mx) * 16
    int_mvx_f = int_mvx.reshape(-1)
    int_mvy_f = int_mvy.reshape(-1)

    def qpel_window_static(iy, ix, dy, dx):
        """16x16 qpel window at padded int coords (iy, ix) with STATIC
        fraction (dy, dx) — plane choice resolved at trace time."""
        G = lambda oy, ox: jax.lax.dynamic_slice(ref_pad, (iy + oy, ix + ox), (16, 16))
        B = lambda oy, ox: jax.lax.dynamic_slice(bpl, (iy - 2 + oy, ix - 2 + ox), (16, 16))
        Hh = lambda oy, ox: jax.lax.dynamic_slice(hpl, (iy - 2 + oy, ix - 2 + ox), (16, 16))
        J = lambda oy, ox: jax.lax.dynamic_slice(jpl, (iy - 2 + oy, ix - 2 + ox), (16, 16))
        avg = lambda p, q: (p + q + 1) >> 1
        if (dx, dy) == (0, 0):
            return G(0, 0)
        if dy == 0:
            return {1: lambda: avg(G(0, 0), B(0, 0)),
                    2: lambda: B(0, 0),
                    3: lambda: avg(B(0, 0), G(0, 1))}[dx]()
        if dx == 0:
            return {1: lambda: avg(G(0, 0), Hh(0, 0)),
                    2: lambda: Hh(0, 0),
                    3: lambda: avg(Hh(0, 0), G(1, 0))}[dy]()
        if (dx, dy) == (2, 2):
            return J(0, 0)
        if dx == 2:
            return avg(B(0, 0), J(0, 0)) if dy == 1 else avg(J(0, 0), B(1, 0))
        if dy == 2:
            return avg(Hh(0, 0), J(0, 0)) if dx == 1 else avg(J(0, 0), Hh(0, 1))
        bb = B(0, 0) if dy == 1 else B(1, 0)
        hh = Hh(0, 0) if dx == 1 else Hh(0, 1)
        return avg(bb, hh)

    def refine_mb(i):
        y0, x0 = mb_ys[i], mb_xs[i]
        orig = jax.lax.dynamic_slice(cur_y, (y0, x0), (16, 16))
        base_x = int_mvx_f[i]
        base_y = int_mvy_f[i]
        iy0 = y0 + base_y + PAD
        ix0 = x0 + base_x + PAD
        preds = []
        costs = []
        for (ox, oy) in _REFINE:
            # offset in quarter-pel units relative to the integer position
            dx, dy = ox & 3, oy & 3
            sx, sy = ox >> 2, oy >> 2  # integer shift (-1 or 0)
            pred = qpel_window_static(iy0 + sy, ix0 + sx, dy, dx)
            mvx = base_x * 4 + ox
            mvy = base_y * 4 + oy
            d = orig - pred
            ssd = (d * d).sum()
            rate = _mv_bits_arr(mvx[None])[0] + _mv_bits_arr(mvy[None])[0]
            preds.append(pred)
            costs.append(ssd + _lam_cost(lambda_me, rate))
        costs = jnp.stack(costs)
        preds = jnp.stack(preds)
        k = jnp.argmin(costs)
        offs = jnp.asarray(_REFINE, jnp.int32)
        mvx = base_x * 4 + offs[k, 0]
        mvy = base_y * 4 + offs[k, 1]
        return mvx, mvy, preds[k]

    mvx_f, mvy_f, pred_mb = jax.vmap(refine_mb)(jnp.arange(n_mb))

    # assemble full-frame luma prediction
    pred_y = (
        pred_mb.reshape(n_my, n_mx, 16, 16).transpose(0, 2, 1, 3).reshape(H, W)
    )

    # ---- 3a. luma residual / transform / quant / recon -----------------
    res = cur_y - pred_y
    blocks = res.reshape(H // 4, 4, W // 4, 4).transpose(0, 2, 1, 3)
    coefs = TR.forward4x4(blocks)
    offset = jnp.int32(Q.default_offset4(qp, False))
    lev = Q.quant4x4(coefs, qp, offset)
    deq = Q.dequant4x4(lev, qp)
    rres = TR.inverse4x4(deq.astype(jnp.int64)).astype(jnp.int32)
    pred_b = pred_y.reshape(H // 4, 4, W // 4, 4).transpose(0, 2, 1, 3)
    rec_b = ((rres + (pred_b << 6) + 32) >> 6).clip(0, 255)
    rec_y = rec_b.transpose(0, 2, 1, 3).reshape(H, W)
    # (a coefficient-free block reconstructs to exactly pred: dequant of
    # zeros is zero and (p<<6 + 32)>>6 == p, matching the decoder's
    # no-residual path)

    # ---- 3b. chroma ----------------------------------------------------
    def chroma_pipeline(cur_c, ref_c_pad, qp_c):
        Hc, Wc = H // 2, W // 2

        def mb_pred(i):
            y0 = (mb_ys[i] >> 1)
            x0 = (mb_xs[i] >> 1)
            mvx = mvx_f[i]
            mvy = mvy_f[i]
            xi = x0 + (mvx >> 3) + PAD
            yi = y0 + (mvy >> 3) + PAD
            fx = mvx & 7
            fy = mvy & 7
            A = jax.lax.dynamic_slice(ref_c_pad, (yi, xi), (9, 9))
            blk = (
                (8 - fx) * (8 - fy) * A[:8, :8]
                + fx * (8 - fy) * A[:8, 1:9]
                + (8 - fx) * fy * A[1:9, :8]
                + fx * fy * A[1:9, 1:9]
                + 32
            ) >> 6
            return blk

        pred_c_mb = jax.vmap(mb_pred)(jnp.arange(n_mb))
        pred_c = (
            pred_c_mb.reshape(n_my, n_mx, 8, 8).transpose(0, 2, 1, 3).reshape(Hc, Wc)
        )
        resc = cur_c - pred_c
        blk = resc.reshape(Hc // 4, 4, Wc // 4, 4).transpose(0, 2, 1, 3)
        co = TR.forward4x4(blk)
        dc = co[:, :, 0, 0]
        # 2x2 hadamard per MB: dc is (Hc//4, Wc//4) = 2x2 per MB
        dcm = dc.reshape(n_my, 2, n_mx, 2).transpose(0, 2, 1, 3)  # (my,mx,2,2)
        dch = TR.hadamard2x2(dcm)
        dc_lev = Q.quant_chroma_dc(dch, qp_c, False)
        off_c = jnp.int32(Q.default_offset4(qp_c, False))
        lev_c = Q.quant4x4(co, qp_c, off_c)
        lev_c = lev_c.at[:, :, 0, 0].set(0)
        # recon: dequant AC + DC
        deq_c = Q.dequant4x4(lev_c, qp_c)
        dch2 = TR.hadamard2x2(dc_lev)
        dc_deq = Q.dequant_chroma_dc(dch2, qp_c)  # (my,mx,2,2)
        dc_deq_flat = dc_deq.transpose(0, 2, 1, 3).reshape(Hc // 4, Wc // 4)
        deq_c = deq_c.at[:, :, 0, 0].set(dc_deq_flat)
        rr = TR.inverse4x4(deq_c.astype(jnp.int64)).astype(jnp.int32)
        pb = pred_c.reshape(Hc // 4, 4, Wc // 4, 4).transpose(0, 2, 1, 3)
        rb = ((rr + (pb << 6) + 32) >> 6).clip(0, 255)
        rec_c = rb.transpose(0, 2, 1, 3).reshape(Hc, Wc)
        return lev_c, dc_lev, rec_c

    lev_u, dc_u, rec_u = chroma_pipeline(cur_u, ref_u_pad, qp_c)
    lev_v, dc_v, rec_v = chroma_pipeline(cur_v, ref_v_pad, qp_c)

    return (
        mvx_f, mvy_f, lev, rec_y, lev_u, dc_u, rec_u, lev_v, dc_v, rec_v,
        grids[R, R],
    )


def ref_resources(planes, max_val=255):
    """Device-side reference preparation: padded planes + half-pel planes."""
    Ypad = jnp.pad(jnp.asarray(planes.Y, jnp.int32), PAD, mode="edge")
    b, h, j = half_planes(Ypad)
    Upad = jnp.pad(jnp.asarray(planes.U, jnp.int32), PAD, mode="edge")
    Vpad = jnp.pad(jnp.asarray(planes.V, jnp.int32), PAD, mode="edge")
    return Ypad, b, h, j, Upad, Vpad


# ---------------------------------------------------------------------------
# Device deblocking for the fast P path.
#
# Restricted, provably-equivalent case: frame coding, one slice, every MB
# inter (P16x16/P_Skip), uniform QP, 4x4 transform, 4:2:0.  Strengths are
# then bs<=2 ("normal" filter only) and alpha/beta/clip rows are static.
# The loop runs as a lax.scan over MBs in raster order — the exact JM
# sequential semantics (ldecod/src/loopFilter.c DeblockMb), no reordering
# argument needed.  Bit-exactness vs the host oracle is fuzz-tested.
# ---------------------------------------------------------------------------

from ..ops.deblock import ALPHA_TABLE, BETA_TABLE, CLIP_TAB


def strengths_device_p(nz4, mvx, mvy):
    """Boundary strengths for the all-inter single-ref case.

    nz4: (4*n_my, 4*n_mx) bool, per-4x4 "has coefficients";
    mvx/mvy: (n_my, n_mx) int32 per-MB motion (quarter-pel).
    Returns (BSV, BSH) int32 (4H, 4W) matching ops.deblock layout."""
    H4, W4 = nz4.shape
    vx = jnp.repeat(jnp.repeat(mvx, 4, 0), 4, 1)
    vy = jnp.repeat(jnp.repeat(mvy, 4, 0), 4, 1)

    def bs(q, p):
        coef = nz4[q] | nz4[p]
        mv_d = (jnp.abs(vx[q] - vx[p]) >= 4) | (jnp.abs(vy[q] - vy[p]) >= 4)
        return jnp.where(coef, 2, mv_d.astype(jnp.int32))

    BSV = jnp.zeros((H4, W4), jnp.int32)
    BSV = BSV.at[:, 1:].set(
        bs((slice(None), slice(1, None)), (slice(None), slice(0, W4 - 1)))
    )
    BSH = jnp.zeros((H4, W4), jnp.int32)
    BSH = BSH.at[1:, :].set(
        bs((slice(1, None), slice(None)), (slice(0, H4 - 1), slice(None)))
    )
    return BSV, BSH


def _edge_norm_luma(L2, L1, L0, R0, R1, R2, S, alpha, beta, clip_row, max_val):
    """Normal-filter one edge (bs<=2), vectorized over lines.  Returns the
    new (L1, L0, R0, R1)."""
    delta = R0 - L0
    active = (
        (S != 0)
        & (jnp.abs(delta) < alpha)
        & (jnp.abs(R0 - R1) < beta)
        & (jnp.abs(L0 - L1) < beta)
    )
    C0 = clip_row[jnp.clip(S, 0, 2)]
    RL0 = (L0 + R0 + 1) >> 1
    ap = jnp.abs(L0 - L2) < beta
    aq = jnp.abs(R0 - R2) < beta
    c0 = C0 + ap + aq
    dif = jnp.clip(((delta << 2) + (L1 - R1) + 4) >> 3, -c0, c0)
    nL1 = L1 + jnp.where(ap, jnp.clip((L2 + RL0 - (L1 << 1)) >> 1, -C0, C0), 0)
    nR1 = R1 + jnp.where(aq, jnp.clip((R2 + RL0 - (R1 << 1)) >> 1, -C0, C0), 0)
    nL0 = jnp.clip(L0 + dif, 0, max_val)
    nR0 = jnp.clip(R0 - dif, 0, max_val)
    return (
        jnp.where(active, nL1, L1),
        jnp.where(active, nL0, L0),
        jnp.where(active, nR0, R0),
        jnp.where(active, nR1, R1),
    )


def _edge_norm_chroma(L1, L0, R0, R1, S, alpha, beta, clip_row, max_val):
    delta = R0 - L0
    active = (
        (S != 0)
        & (jnp.abs(delta) < alpha)
        & (jnp.abs(R0 - R1) < beta)
        & (jnp.abs(L0 - L1) < beta)
    )
    c0 = clip_row[jnp.clip(S, 0, 2)] + 1
    dif = jnp.clip(((delta << 2) + (L1 - R1) + 4) >> 3, -c0, c0)
    nL0 = jnp.clip(L0 + dif, 0, max_val)
    nR0 = jnp.clip(R0 - dif, 0, max_val)
    return jnp.where(active, nL0, L0), jnp.where(active, nR0, R0)


def deblock_device_p(rec_y, rec_u, rec_v, BSV, BSH, qp: int, qp_c: int,
                     max_val: int = 255):
    """Sequential (JM-order) deblock on device for the fast P path."""
    H, W = rec_y.shape
    n_my, n_mx = H // 16, W // 16
    n_mb = n_my * n_mx
    iA = min(51, max(0, qp))
    alpha, beta = int(ALPHA_TABLE[iA]), int(BETA_TABLE[iA])
    clip_row = jnp.asarray(CLIP_TAB[iA][:3], jnp.int32)
    iAc = min(51, max(0, qp_c))
    alpha_c, beta_c = int(ALPHA_TABLE[iAc]), int(BETA_TABLE[iAc])
    clip_row_c = jnp.asarray(CLIP_TAB[iAc][:3], jnp.int32)

    # pad 4 on top/left so every MB region is a static-size gather; the
    # pad rows are never written with active filters (BS row/col 0 is 0).
    Yp = jnp.pad(rec_y, ((4, 0), (4, 0)))
    Up = jnp.pad(rec_u, ((2, 0), (2, 0)))
    Vp = jnp.pad(rec_v, ((2, 0), (2, 0)))

    def mb_step(carry, addr):
        Yp, Up, Vp = carry
        r = addr // n_mx
        c = addr % n_mx
        y0, x0 = 16 * r, 16 * c
        A = jax.lax.dynamic_slice(Yp, (y0, x0), (20, 20))
        x4o, y4o = 4 * c, 4 * r
        # strengths for this MB's edges: (dir, edge_i, group)
        sv = jax.lax.dynamic_slice(BSV, (y4o, x4o), (4, 4))  # [grp, edge_i]
        sh = jax.lax.dynamic_slice(BSH, (y4o, x4o), (4, 4))  # [edge_i, grp]
        # vertical edges, left to right
        for e in range(4):
            col = 4 + 4 * e
            S16 = jnp.repeat(sv[:, e], 4)
            cols = [A[4:20, col + k] for k in (-3, -2, -1, 0, 1, 2)]
            nL1, nL0, nR0, nR1 = _edge_norm_luma(
                cols[0], cols[1], cols[2], cols[3], cols[4], cols[5],
                S16, alpha, beta, clip_row, max_val,
            )
            A = A.at[4:20, col - 2].set(nL1)
            A = A.at[4:20, col - 1].set(nL0)
            A = A.at[4:20, col].set(nR0)
            A = A.at[4:20, col + 1].set(nR1)
        # horizontal edges, top to bottom
        for e in range(4):
            row = 4 + 4 * e
            S16 = jnp.repeat(sh[e, :], 4)
            rows = [A[row + k, 4:20] for k in (-3, -2, -1, 0, 1, 2)]
            nL1, nL0, nR0, nR1 = _edge_norm_luma(
                rows[0], rows[1], rows[2], rows[3], rows[4], rows[5],
                S16, alpha, beta, clip_row, max_val,
            )
            A = A.at[row - 2, 4:20].set(nL1)
            A = A.at[row - 1, 4:20].set(nL0)
            A = A.at[row, 4:20].set(nR0)
            A = A.at[row + 1, 4:20].set(nR1)
        Yp = jax.lax.dynamic_update_slice(Yp, A, (y0, x0))

        # chroma (4:2:0): edges at chroma cols/rows 0 and 4; line i of the
        # 8 uses strength group i>>1 (oracle sidx reduction)
        yc, xc = 8 * r, 8 * c
        for P_, handle in ((Up, 0), (Vp, 1)):
            C = jax.lax.dynamic_slice(P_, (yc, xc), (10, 10))
            for e, scol in ((0, 0), (1, 2)):
                col = 2 + 4 * e
                S8 = jnp.repeat(sv[:, 2 * e], 2)
                cl = [C[2:10, col + k] for k in (-2, -1, 0, 1)]
                nL0, nR0 = _edge_norm_chroma(
                    cl[0], cl[1], cl[2], cl[3], S8, alpha_c, beta_c,
                    clip_row_c, max_val,
                )
                C = C.at[2:10, col - 1].set(nL0)
                C = C.at[2:10, col].set(nR0)
            for e in range(2):
                row = 2 + 4 * e
                S8 = jnp.repeat(sh[2 * e, :], 2)
                rw = [C[row + k, 2:10] for k in (-2, -1, 0, 1)]
                nL0, nR0 = _edge_norm_chroma(
                    rw[0], rw[1], rw[2], rw[3], S8, alpha_c, beta_c,
                    clip_row_c, max_val,
                )
                C = C.at[row - 1, 2:10].set(nL0)
                C = C.at[row, 2:10].set(nR0)
            if handle == 0:
                Up = jax.lax.dynamic_update_slice(Up, C, (yc, xc))
            else:
                Vp = jax.lax.dynamic_update_slice(Vp, C, (yc, xc))
        return (Yp, Up, Vp), None

    (Yp, Up, Vp), _ = jax.lax.scan(
        mb_step, (Yp, Up, Vp), jnp.arange(n_mb)
    )
    return Yp[4:, 4:], Up[2:, 2:], Vp[2:, 2:]


@jax.jit
def half_planes(Ypad):
    return _half_planes_core(Ypad)


def _half_planes_core(Ypad):
    P = Ypad.astype(jnp.int64)

    def c6_h(A):
        return (
            A[:, 0:-5] - 5 * A[:, 1:-4] + 20 * A[:, 2:-3]
            + 20 * A[:, 3:-2] - 5 * A[:, 4:-1] + A[:, 5:]
        )

    def c6_v(A):
        return (
            A[0:-5] - 5 * A[1:-4] + 20 * A[2:-3]
            + 20 * A[3:-2] - 5 * A[4:-1] + A[5:]
        )

    b1 = c6_h(P)
    h1 = c6_v(P)
    j1 = c6_v(b1)
    b = ((b1[2:-3, :] + 16) >> 5).clip(0, 255).astype(jnp.int32)
    h = ((h1[:, 2:-3] + 16) >> 5).clip(0, 255).astype(jnp.int32)
    j = ((j1 + 512) >> 10).clip(0, 255).astype(jnp.int32)
    return b, h, j
