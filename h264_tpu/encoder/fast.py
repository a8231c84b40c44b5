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

PAD = MC.PAD
_REFINE = [(dx, dy) for dy in range(-3, 4) for dx in range(-3, 4)]


def _mv_bits_arr(d):
    k = 2 * jnp.abs(d) - (d > 0)
    bl = jnp.floor(jnp.log2(k.astype(jnp.float32) + 1.0)).astype(jnp.int32) + 1
    return 2 * bl - 1


@functools.partial(
    jax.jit, static_argnames=("H", "W", "R", "qp", "qp_c", "lambda_me")
)
def p_frame_device(cur_y, cur_u, cur_v, ref_pad, bpl, hpl, jpl, ref_u_pad,
                   ref_v_pad, H: int, W: int, R: int, qp: int, qp_c: int,
                   lambda_me: int):
    """Full P-frame pixel pipeline. Returns per-MB MVs, levels, cbp parts,
    and reconstructed (pre-deblock) planes."""
    n_my, n_mx = H // 16, W // 16
    n_mb = n_my * n_mx

    # ---- 1. integer SAD grids -----------------------------------------
    def one_shift(d):
        dy, dx = d // (2 * R + 1), d % (2 * R + 1)
        win = jax.lax.dynamic_slice(ref_pad, (PAD - R + dy, PAD - R + dx), (H, W))
        ad = jnp.abs(cur_y - win)
        return ad.reshape(n_my, 16, n_mx, 16).sum(axis=(1, 3))

    grids = jax.lax.map(one_shift, jnp.arange((2 * R + 1) ** 2))
    grids = grids.reshape(2 * R + 1, 2 * R + 1, n_my, n_mx)
    # MV rate prior (relative to zero MV; exact PMV rate applied on host
    # only for the skip/mvd bits — this biases the search like JM's
    # mvcost around the predictor)
    dgrid = jnp.arange(-R, R + 1) * 4
    bits = _mv_bits_arr(dgrid)[None, :] + _mv_bits_arr(dgrid)[:, None]
    cost = grids + ((lambda_me * bits) >> 16)[..., None, None]
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
            sad = jnp.abs(orig - pred).sum()
            rate = _mv_bits_arr(mvx[None])[0] + _mv_bits_arr(mvy[None])[0]
            preds.append(pred)
            costs.append(sad + ((lambda_me * rate) >> 16))
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


@jax.jit
def half_planes(Ypad):
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
