"""Device RD mode-decision P-frame pipeline.

The TPU-native replacement for the reference's mode-decision engine
(lencod/src/md_high.c:38 encode_one_macroblock_high, mode_decision.c:531,
rdopt.c:1981 RDCost_for_macroblocks): instead of per-MB sequential trial
encoding with entropy-state rollback, every candidate mode of every MB is
evaluated in one batched device program with *true* distortion (residual
transform/quant/reconstruction, exactly the decoder arithmetic) and a
table-estimated rate, J = D_ssd + lambda * R_est (SURVEY.md §7.1: rate
estimation replaces rdopt_coding_state.c).

Per frame, on device:
  1. per-8x8 integer SSD windows against every reference (the FastFull
     strategy of me_fullfast.c:210 SetupLargerBlocks: small-block grids
     composed into 16x16/16x8/8x16 partition grids)
  2. approximate PMV field (median of neighbor best-16x16 MVs) for MV-rate
  3. per-partition (ref, mv) argmin; quarter-pel refinement per partition
     unit against the precomputed half-pel planes (img_luma.c:45 strategy)
  4. candidate evaluation: P16x16 / P16x8 / P8x16 / P8x8 / SKIP / I16,
     each with full transform/quant/recon distortion
  5. winner commit; intra MBs reconstructed in a raster lax.scan with
     decoder-exact neighbor semantics; full-strength deblocking
     (bs 0..4 incl. the strong filter) on device

Host tail: exact PMV/MVD + skip detection (decoder/mv.py), entropy coding.
"""

from __future__ import annotations

import functools
import os

import numpy as np

# experiment kill-switches (trace-time): disable candidate families
_NO_SUB8 = bool(os.environ.get("H264_NO_SUB8"))
_NO_BHALF = bool(os.environ.get("H264_NO_BHALF"))
_NO_INTERINTRA = bool(os.environ.get("H264_NO_INTERINTRA"))
# intra-in-P/B rate-estimate scale (percent); 100 = neutral
_INTRA_RSCALE = int(os.environ.get("H264_INTRA_RSCALE", "100"))
# inter coefficient-bits estimate scale (percent): CABAC codes residual
# cheaper than the CAVLC-shaped _coef_bits model
_COEF_RSCALE = int(os.environ.get("H264_COEF_RSCALE", "100"))

import jax
import jax.numpy as jnp

from ..ops import interp as MC
from ..ops import quant as Q
from ..ops import transforms as TR
from ..ops.deblock import ALPHA_TABLE, BETA_TABLE, CLIP_TAB

PAD = MC.PAD

# candidate mode indices (winner codes in the host interchange buffer)
C_P16x16, C_P16x8, C_P8x16, C_P8x8, C_SKIP, C_P16PMV = 0, 1, 2, 3, 4, 5
C_I16 = 6
C_I4 = 7  # intra 4x4 (decided in the commit scan, I16 vs I4)
# B-pipeline winner codes (separate table; B candidate set)
B_DIRECT, B_L0, B_L1, B_BI, B_I16, B_L0_16x8, B_L0_8x16 = 0, 1, 2, 3, 4, 5, 6
B_I4 = 8
B_P8X8 = 9  # per-unit sub-modes (pdir8 gives 0 L0 / 1 L1 / 2 BI / 3 direct)

# quarter-pel sample = avg of two plane-bank samples (G=0, b=1, h=2, j=3);
# table[frac] = (plane0, oy0, ox0, plane1, oy1, ox1), frac = (mvy&3)*4+(mvx&3).
# Derived from the normative two-stage interpolation (spec §8.4.2.2.1; the
# precomputed-plane scheme of lencod/src/img_luma.c).
_QTAB = np.zeros((16, 6), np.int32)
for _dy in range(4):
    for _dx in range(4):
        f = _dy * 4 + _dx
        if (_dx, _dy) == (0, 0):
            e = (0, 0, 0, 0, 0, 0)
        elif _dy == 0:
            e = {1: (0, 0, 0, 1, 0, 0), 2: (1, 0, 0, 1, 0, 0),
                 3: (1, 0, 0, 0, 0, 1)}[_dx]
        elif _dx == 0:
            e = {1: (0, 0, 0, 2, 0, 0), 2: (2, 0, 0, 2, 0, 0),
                 3: (2, 0, 0, 0, 1, 0)}[_dy]
        elif (_dx, _dy) == (2, 2):
            e = (3, 0, 0, 3, 0, 0)
        elif _dx == 2:
            e = (1, 0, 0, 3, 0, 0) if _dy == 1 else (3, 0, 0, 1, 1, 0)
        elif _dy == 2:
            e = (2, 0, 0, 3, 0, 0) if _dx == 1 else (3, 0, 0, 2, 0, 1)
        else:
            e = (1, (0 if _dy == 1 else 1), 0, 2, 0, (0 if _dx == 1 else 1))
        _QTAB[f] = e
_QTAB_J = jnp.asarray(_QTAB)

_REFINE = np.asarray(
    [(dx, dy) for dy in range(-3, 4) for dx in range(-3, 4)], np.int32
)


# ---------------------------------------------------------------------------
# reference resources
# ---------------------------------------------------------------------------

@jax.jit
def ref_entry_from_planes(Y, U, V):
    """Build one reference entry from (unpadded) recon planes: the aligned
    4-plane luma bank + padded chroma stack."""
    Ypad = jnp.pad(Y.astype(jnp.int32), PAD, mode="edge")
    bank = _bank_from_pad(Ypad)
    cpad = jnp.stack([
        jnp.pad(U.astype(jnp.int32), PAD, mode="edge"),
        jnp.pad(V.astype(jnp.int32), PAD, mode="edge"),
    ])
    return bank, cpad


def _bank_from_pad(Ypad):
    """(4, Hp, Wp) bank [G, b, h, j], all indexed in G coordinates: the
    half-pel planes are shifted so bank[k, y, x] is the half-pel sample
    whose nearest full pel is (y, x).  int32 throughout: the 6-tap
    intermediates stay below 2^20."""
    P = Ypad.astype(jnp.int32)

    def c6_h(A):
        return (A[:, 0:-5] - 5 * A[:, 1:-4] + 20 * A[:, 2:-3]
                + 20 * A[:, 3:-2] - 5 * A[:, 4:-1] + A[:, 5:])

    def c6_v(A):
        return (A[0:-5] - 5 * A[1:-4] + 20 * A[2:-3]
                + 20 * A[3:-2] - 5 * A[4:-1] + A[5:])

    b1 = c6_h(P)
    h1 = c6_v(P)
    j1 = c6_v(b1)
    b = ((b1[2:-3, :] + 16) >> 5).clip(0, 255)
    h = ((h1[:, 2:-3] + 16) >> 5).clip(0, 255)
    j = ((j1 + 512) >> 10).clip(0, 255)
    # b/h/j[y, x] correspond to full-pel (y+2, x+2): shift by +2 (pad 2/3)
    b2 = jnp.pad(b, ((2, 3), (2, 3)))
    h2 = jnp.pad(h, ((2, 3), (2, 3)))
    j2 = jnp.pad(j, ((2, 3), (2, 3)))
    return jnp.stack([Ypad.astype(jnp.int32), b2, h2, j2])


# ---------------------------------------------------------------------------
# generic sampling
# ---------------------------------------------------------------------------

def _mc_luma_unit(banks, r, mvx, mvy, y0, x0, h: int, w: int):
    """Quarter-pel MC of one (h, w) unit at picture pos (y0, x0) from
    reference r of the stacked banks (NR, 4, Hp, Wp)."""
    iy = y0 + (mvy >> 2) + PAD
    ix = x0 + (mvx >> 2) + PAD
    f = (mvy & 3) * 4 + (mvx & 3)
    t = _QTAB_J[f]
    a = jax.lax.dynamic_slice(
        banks, (r, t[0], iy + t[1], ix + t[2]), (1, 1, h, w))[0, 0]
    b = jax.lax.dynamic_slice(
        banks, (r, t[3], iy + t[4], ix + t[5]), (1, 1, h, w))[0, 0]
    return (a + b + 1) >> 1


def _mc_chroma_unit(cpads, r, mvx, mvy, yc, xc, h: int, w: int,
                    pad: int = PAD):
    """1/8-pel bilinear chroma MC of one (h, w) chroma unit for both
    planes; cpads: (NR, 2, Hcp, Wcp)."""
    yi = yc + (mvy >> 3) + pad
    xi = xc + (mvx >> 3) + pad
    fx = mvx & 7
    fy = mvy & 7
    A = jax.lax.dynamic_slice(cpads, (r, 0, yi, xi), (1, 2, h + 1, w + 1))[0]
    return ((8 - fx) * (8 - fy) * A[:, :h, :w]
            + fx * (8 - fy) * A[:, :h, 1:]
            + (8 - fx) * fy * A[:, 1:, :w]
            + fx * fy * A[:, 1:, 1:] + 32) >> 6


def _bitlen(a):
    """floor(log2(a))+1 for a >= 1 (int32, values < 2^20: f32-exact)."""
    return jnp.floor(jnp.log2(a.astype(jnp.float32))).astype(jnp.int32) + 1


def _mv_bits(d):
    """se(v) code length of d."""
    k = 2 * jnp.abs(d) - (d > 0)
    return 2 * _bitlen(k + 1) - 1


def _coef_bits(lev):
    """Approximate CAVLC bits for one (..., 4, 4) block of levels."""
    a = jnp.abs(lev)
    nz = (a > 0)
    lb = jnp.where(nz, 2 * _bitlen(jnp.maximum(a, 1)) + 1, 0).sum((-1, -2))
    n = nz.sum((-1, -2))
    return jnp.where(n > 0, lb + n + 2, 0)


def _med3(a, b, c):
    return a + b + c - jnp.minimum(a, jnp.minimum(b, c)) - jnp.maximum(
        a, jnp.maximum(b, c))


def _lam_cost(lam, bits):
    """lambda * bits with lambda in <<16 fixed point, overflow-safe.

    lam can reach ~2^33 in raw <<16 form at high QP (lambda_mode =
    0.85 * 2^((QP-12)/3), lencod/src/slice.c:1261), so the naive
    (lam * bits) >> 16 wraps int32 — split into integer and fractional
    parts instead: both partial products stay far below 2^31."""
    return (lam >> 16) * bits + (((lam & 0xFFFF) * bits) >> 16)


def _satd(d):
    """Hadamard SATD of a (..., h, w) residual: sum per 4x4 block of
    |hadamard4x4| >> 1 (lencod/src/me_distortion.c:182 HadamardSAD4x4) —
    the sub-pel distortion metric that discounts noise the quantizer
    will drop anyway."""
    b = d.reshape(*d.shape[:-2], d.shape[-2] // 4, 4,
                  d.shape[-1] // 4, 4).swapaxes(-3, -2)
    h = TR.hadamard4x4(b)
    return (jnp.abs(h).sum((-1, -2)) + 1 >> 1).sum((-1, -2))


# soft-quantization (RDOQ-lite) constants: the inverse 4x4 basis row
# norms^2 scaled by 4 (rows (1,1,1,1)/(1,.5,-.5,-1)/... -> 16, 10) and
# the diag scale tying forward4x4 to the inverse-basis correlation
# (2*Ci = diag(2,1,2,1) . Cf)
_RDOQ_N2 = np.outer([16, 10, 16, 10], [16, 10, 16, 10]).astype(np.float32)
_RDOQ_SS = np.outer([2, 1, 2, 1], [2, 1, 2, 1]).astype(np.float32)


def _rdoq4(blk, lev, qp, lam):
    """Per-coefficient soft quantization of (..., 4, 4) level blocks:
    decrement |level| by one when the exact pixel-metric distortion
    increase is beaten by the rate saving, Delta-J = Delta-D + lambda *
    Delta-R < 0.  The TPU-native reshaping of trellis quantization
    (JM's later RDO_Q): decisions are per-coefficient independent, so
    the whole frame's blocks decide in one fused elementwise pass.

    Delta-D comes from the identity <e, IT(dD)> = <diag.Cf(e).diag, dD>:
    one extra forward4x4 of the 64x-scaled reconstruction error prices
    every coefficient's candidate at once.  blk: pixel residuals."""
    deq = Q.dequant4x4(lev, qp)
    levm = jnp.where(lev > 0, lev - 1, jnp.where(lev < 0, lev + 1, 0))
    deqm = Q.dequant4x4(levm, qp)
    delta = (deqm - deq).astype(jnp.float32)
    err64 = (blk << 6) - TR.inverse4x4(deq.astype(jnp.int32))
    F64 = TR.forward4x4(err64).astype(jnp.float32)
    n2 = jnp.asarray(_RDOQ_N2)
    ss = jnp.asarray(_RDOQ_SS)
    dD = delta * delta * n2 - 8.0 * delta * F64 * ss  # Delta-D * 65536
    a = jnp.abs(lev)
    bits = jnp.where(a > 0, 2 * _bitlen(jnp.maximum(a, 1)) + 2, 0)
    am = jnp.abs(levm)
    bits_m = jnp.where(am > 0, 2 * _bitlen(jnp.maximum(am, 1)) + 2, 0)
    dJ = dD + jnp.asarray(lam, jnp.float32) * (bits_m - bits)
    return jnp.where((a > 0) & (dJ < 0), levm, lev)


# JM single-coefficient cost by run length (lencod/inc/block.h:45
# COEFF_COST4x4[0]); |level| > 1 counts as MAX (9).  Encoder-only
# thresholding: isolated small coefficients in inter blocks cost more
# bits than their distortion gain is worth.
_COEFF_COST_RUN = jnp.asarray(
    [3, 2, 2, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], jnp.int32)
_ZZ4_RASTER = jnp.asarray(
    [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15], jnp.int32)


def _block4_coeff_cost(lev, first: int = 0):
    """JM coeff_cost of (..., 4, 4) level blocks (lencod/src/block.c:899
    `*coeff_cost += (level > 1) ? MAX_VALUE : c_cost[run]`).

    `first`: index of the first scan position coded (1 for AC blocks).
    Returns (...,) int32 cost."""
    flat = lev.reshape(*lev.shape[:-2], 16)
    L = jnp.take(flat, _ZZ4_RASTER, axis=-1)[..., first:]
    nz = L != 0
    n = 16 - first
    idx = jnp.arange(n)
    marked = jnp.where(nz, idx, -1)
    prev_incl = jax.lax.cummax(marked, axis=L.ndim - 1)
    prev_excl = jnp.concatenate(
        [jnp.full((*L.shape[:-1], 1), -1, marked.dtype),
         prev_incl[..., :-1]], axis=-1)
    run = idx - prev_excl - 1
    cost = jnp.where(jnp.abs(L) > 1, 9, _COEFF_COST_RUN[run])
    return jnp.where(nz, cost, 0).sum(-1)


def _threshold_inter_luma(lev, rec, pred, orig):
    """JM inter-luma coefficient thresholding (macroblock.c:1236/:1386):
    per 8x8, drop all four 4x4 blocks when their summed coeff_cost is
    <= _LUMA_COEFF_COST_ (4); then drop the whole MB's luma when the
    surviving total is <= _LUMA_MB_COEFF_COST_ (5).

    lev: (..., 4, 4, 4, 4) [brow, bcol, y, x]; rec/pred/orig: (..., 16, 16).
    Returns (lev, rec, D, coefbits) after thresholding."""
    cost4 = _block4_coeff_cost(lev)                     # (..., 4, 4)
    c8 = (cost4.reshape(*cost4.shape[:-2], 2, 2, 2, 2)
          .sum((-3, -1)))                               # (..., 2, 2) per 8x8
    drop8 = c8 <= 4
    kept8 = jnp.where(drop8, 0, c8)
    drop_mb = kept8.sum((-1, -2)) <= 5                  # (...,)
    drop4 = (jnp.repeat(jnp.repeat(drop8, 2, -1), 2, -2)
             | drop_mb[..., None, None])                # (..., 4, 4) blocks
    lev = jnp.where(drop4[..., None, None], 0, lev)
    # dropped blocks reconstruct as pure prediction
    pb = pred.reshape(*pred.shape[:-2], 4, 4, 4, 4).swapaxes(-3, -2)
    rb = rec.reshape(*rec.shape[:-2], 4, 4, 4, 4).swapaxes(-3, -2)
    rb = jnp.where(drop4[..., None, None], pb.clip(0, 255), rb)
    rec = rb.swapaxes(-3, -2).reshape(*pred.shape)
    d = orig - rec
    D_ = (d * d).sum((-1, -2))
    cb = _coef_bits(lev).sum((-1, -2))
    return lev, rec, D_, cb


def _wp_affine(x, w, o):
    """Explicit weighted-prediction luma sample transform, logWD = 5
    (spec §8.4.2.3.3; the decoder dual is decoder/recon.py _wp_uni)."""
    return (((x * w + 16) >> 5) + o).clip(0, 255)


# ---------------------------------------------------------------------------
# the P pipeline
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("H", "W", "R", "stage", "use_wp",
                                    "use_refresh", "use_drift", "use_cme",
                                    "use_t8"))
def rd_p_pipeline(cur_y8, cur_u8, cur_v8, banks, cpads,
                  H: int, W: int, R: int, qp: int, qp_c: int,
                  lam: int, lam_me: int, stage: int = 9, nref=None,
                  wp_w=None, wp_o=None, use_wp: bool = False,
                  force_intra=None, use_refresh: bool = False,
                  drift_pen=None, use_drift: bool = False,
                  use_cme: bool = False, use_t8: bool = False):
    """Whole-frame RD P encode. banks: (NR, 4, Hp, Wp); cpads:
    (NR, 2, Hcp, Wcp).  lam/lam_me: lambda_mode / lambda_me << 16.

    qp/qp_c/lam/lam_me are TRACED (tables become gathers) so one
    executable serves every QP — the 4-QP BD bench and per-frame rate
    control reuse a single compilation.  nref (traced int32, default
    all) masks trailing padded entries of `banks` out of the ref
    search, so a DPB warming up from 1 to NR refs also reuses it.

    Returns (host_out flat int32, recon (Y, U, V), next ref entry)."""
    cur_y = cur_y8.astype(jnp.int32)
    cur_u = cur_u8.astype(jnp.int32)
    cur_v = cur_v8.astype(jnp.int32)
    NR = banks.shape[0]
    n_my, n_mx = H // 16, W // 16
    n_mb = n_my * n_mx
    D = 2 * R + 1
    # ---- 0. coarse-to-fine motion search (use_cme) ---------------------
    # The dense SSD grids cover mv = center ± R per (ref, MB).  Without
    # centering (the reference's me_fullfast.c searches ±R around the MB
    # origin), multi-reference motion — up to nref x the per-frame pan —
    # is unreachable.  A 4x-decimated wide SAD search (±48 full-pel)
    # picks the center; widening the banks by edge replication is EXACT
    # (the outer PAD ring of every sub-pel plane is already constant), so
    # sub-pel interpolation is not redone.
    if use_cme:
        E = 64
        PADW = PAD + E
        banks_f = jnp.pad(banks, ((0, 0), (0, 0), (E, E), (E, E)),
                          mode="edge")
        cpads_f = jnp.pad(cpads, ((0, 0), (0, 0), (E, E), (E, E)),
                          mode="edge")
    else:
        PADW = PAD
        banks_f = banks
        cpads_f = cpads
    if use_wp:
        # full-pel search runs against the WEIGHTED reference plane so
        # the SSD grids measure the true (post-WP) residual energy
        # (lencod/src/weighted_prediction.c:30 DC-ratio estimation;
        # weights are per-reference, luma only — JM P defaults)
        search0 = _wp_affine(banks_f[:, 0], wp_w[:, None, None],
                             wp_o[:, None, None])
    else:
        search0 = banks_f[:, 0]

    # per-(ref, MB) search centers, full-pel (zero without use_cme)
    if use_cme:
        RC = 12  # coarse range in 4-pel units -> ±48 full-pel
        DCo = 2 * RC + 1
        PADL = PADW // 4
        Hl = (H + 2 * PADW) // 4
        Wl = (W + 2 * PADW) // 4
        ref_l = search0.reshape(NR, Hl, 4, Wl, 4).sum((2, 4))
        cur_l = cur_y.reshape(H // 4, 4, W // 4, 4).sum((1, 3))
        curmb_l = (cur_l.reshape(n_my, 4, n_mx, 4).transpose(0, 2, 1, 3)
                   .reshape(n_mb, 4, 4))
        mbl_ys = (jnp.arange(n_mb) // n_mx) * 4
        mbl_xs = (jnp.arange(n_mb) % n_mx) * 4
        coff = jnp.arange(-RC, RC + 1) * 16  # qpel value of each offset
        cbits = _mv_bits(coff)[None, :] + _mv_bits(coff)[:, None]

        def coarse_block(r, i):
            win = jax.lax.dynamic_slice(
                ref_l[r], (mbl_ys[i] - RC + PADL, mbl_xs[i] - RC + PADL),
                (DCo + 3, DCo + 3))
            cb = curmb_l[i]
            acc = jnp.zeros((DCo, DCo), jnp.int32)
            for a in range(4):
                for b in range(4):
                    acc = acc + jnp.abs(jax.lax.dynamic_slice(
                        win, (a, b), (DCo, DCo)) - cb[a, b])
            k = jnp.argmin((acc + _lam_cost(lam_me, cbits)).reshape(-1))
            return ((k % DCo) - RC) * 4, ((k // DCo) - RC) * 4

        ccx, ccy = jax.vmap(lambda r: jax.vmap(
            lambda i: coarse_block(r, i))(jnp.arange(n_mb)))(
            jnp.arange(NR))
        cen_x = ccx.reshape(NR, n_my, n_mx).astype(jnp.int32)
        cen_y = ccy.reshape(NR, n_my, n_mx).astype(jnp.int32)
    else:
        cen_x = jnp.zeros((NR, n_my, n_mx), jnp.int32)
        cen_y = jnp.zeros((NR, n_my, n_mx), jnp.int32)

    # ---- 1. per-8x8 SSD windows per reference --------------------------
    nby, nbx = H // 8, W // 8
    n_b8 = nby * nbx
    cur8 = (cur_y.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
            .reshape(n_b8, 8, 8))
    cur2 = (cur8 * cur8).sum((-1, -2))  # (n_b8,)
    b8_ys = (jnp.arange(n_b8) // nbx) * 8
    b8_xs = (jnp.arange(n_b8) % nbx) * 8
    Wn = 2 * R + 8
    # each 8x8 block searches around ITS MB's center for that ref
    cen8_x = (cen_x.reshape(NR, n_my, 1, n_mx, 1)
              .repeat(2, 2).repeat(2, 4).reshape(NR, n_b8))
    cen8_y = (cen_y.reshape(NR, n_my, 1, n_mx, 1)
              .repeat(2, 2).repeat(2, 4).reshape(NR, n_b8))

    def block_ssd(ref_pad, bi, cy0, cx0):
        y0, x0 = b8_ys[bi] + cy0, b8_xs[bi] + cx0
        win = jax.lax.dynamic_slice(
            ref_pad, (y0 - R + PADW, x0 - R + PADW), (Wn, Wn))
        # cross-correlation: 64 shifted multiply-adds (local, exact int32)
        cross = jnp.zeros((D, D), jnp.int32)
        cb = cur8[bi]
        for i in range(8):
            for j in range(8):
                cross = cross + cb[i, j] * jax.lax.dynamic_slice(
                    win, (i, j), (D, D))
        w2 = win * win
        vc = jnp.cumsum(jnp.pad(w2, ((1, 0), (0, 0))), axis=0)
        vbox = vc[8:] - vc[:-8]
        hc = jnp.cumsum(jnp.pad(vbox, ((0, 0), (1, 0))), axis=1)
        r2 = hc[:, 8:] - hc[:, :-8]
        return r2 - 2 * cross + cur2[bi]

    ssd8 = jax.vmap(
        lambda r: jax.vmap(lambda b: block_ssd(
            search0[r], b, cen8_y[r, b], cen8_x[r, b]))(jnp.arange(n_b8))
    )(jnp.arange(NR))  # (NR, n_b8, D, D); cell (i,j) is mv = cen + (j,i)-R
    ssd8 = ssd8.reshape(NR, n_my, 2, n_mx, 2, D, D)
    if stage == 1:
        return ssd8.sum(), None, None

    # ---- 2. compose partition grids ------------------------------------
    ssd16 = ssd8.sum((2, 4))                      # (NR, n_my, n_mx, D, D)
    s16x8 = ssd8.sum(4).transpose(0, 1, 3, 2, 4, 5)   # (NR,my,mx,2(top/bot),D,D)
    s8x16 = ssd8.sum(2)                                # (NR,my,mx,2(l/r),D,D)

    # ---- 3. approximate PMV field --------------------------------------
    dgrid = jnp.arange(-R, R + 1) * 4
    zb = (_mv_bits(cen_x[0][..., None] * 4 + dgrid)[:, :, None, :]
          + _mv_bits(cen_y[0][..., None] * 4 + dgrid)[:, :, :, None])
    c0 = ssd16[0] + _lam_cost(lam_me, zb)
    bi0 = jnp.argmin(c0.reshape(n_my, n_mx, -1), axis=-1)
    pm_x = (bi0 % D - R + cen_x[0]) * 4
    pm_y = (bi0 // D - R + cen_y[0]) * 4

    def med_neighbors(f):
        a = jnp.pad(f, ((0, 0), (1, 0)))[:, :-1]          # left
        b = jnp.pad(f, ((1, 0), (0, 0)))[:-1, :]          # up
        c = jnp.pad(f, ((1, 0), (0, 1)))[:-1, 1:]         # up-right
        return _med3(a, b, c)

    pmvx = med_neighbors(pm_x)
    pmvy = med_neighbors(pm_y)

    def mvbits_grid(px, py):
        """MV-rate around the PMV field: (NR, n_my, n_mx, D, D) — grid
        cell (i, j) of ref r holds mv = cen[r] + (j, i) - R."""
        gx = cen_x[..., None] * 4 + dgrid[None, None, None, :]
        gy = cen_y[..., None] * 4 + dgrid[None, None, None, :]
        bits_x = _mv_bits(gx - px[None, ..., None])
        bits_y = _mv_bits(gy - py[None, ..., None])
        return bits_x[:, :, :, None, :] + bits_y[:, :, :, :, None]

    mvbits = mvbits_grid(pmvx, pmvy)
    # reference-index rate (te(v) length against NR refs)
    rbits = np.array([1 if r == 0 else 2 * int(r + 1).bit_length() - 1
                      for r in range(NR)], np.int32)
    if nref is None:
        nref = jnp.int32(NR)
    # a single active ref transmits no ref_idx at all
    rbits = jnp.where(nref <= 1, 0, jnp.asarray(rbits))
    # padded (invalid) refs must never win a search
    ref_pen = jnp.where(jnp.arange(NR) >= nref, jnp.int32(1 << 29), 0)

    def part_argmin(grids, mvb):
        """grids: (NR, n_my, n_mx, D, D) -> (ref, imvx, imvy) per MB."""
        cost = grids + _lam_cost(lam_me, mvb)
        cost = cost + (_lam_cost(lam_me, rbits) + ref_pen)[
            :, None, None, None, None]
        flat = cost.reshape(NR, n_my, n_mx, -1)
        per_ref = jnp.min(flat, axis=-1)
        per_ref_i = jnp.argmin(flat, axis=-1)
        ref = jnp.argmin(per_ref, axis=0)
        idx = jnp.take_along_axis(per_ref_i, ref[None], axis=0)[0]
        cxs = jnp.take_along_axis(cen_x, ref[None], axis=0)[0]
        cys = jnp.take_along_axis(cen_y, ref[None], axis=0)[0]
        return (ref.astype(jnp.int32),
                (idx % D - R + cxs).astype(jnp.int32),
                (idx // D - R + cys).astype(jnp.int32))

    r16, x16, y16 = part_argmin(ssd16, mvbits)
    # second-pass PMV: the refined-quality predictor field comes from the
    # chosen 16x16 integer MVs (closer to the decoder's median chain than
    # the zero-biased first pass), and prices the partition searches
    pmvx = med_neighbors(x16 * 4)
    pmvy = med_neighbors(y16 * 4)
    mvbits = mvbits_grid(pmvx, pmvy)
    r168 = []
    for half in range(2):
        r168.append(part_argmin(s16x8[:, :, :, half], mvbits))
    r816 = []
    for half in range(2):
        r816.append(part_argmin(s8x16[:, :, :, half], mvbits))
    r88 = []
    for b8 in range(4):
        by, bx = b8 >> 1, b8 & 1
        r88.append(part_argmin(ssd8[:, :, by, :, bx], mvbits))
    if stage == 2:
        return sum(u.sum() for t in ([r16, x16, y16],) for u in t), None, None

    # ---- 4. quarter-pel refinement per partition unit ------------------
    mb_ys = (jnp.arange(n_mb) // n_mx) * 16
    mb_xs = (jnp.arange(n_mb) % n_mx) * 16
    pmvx_f = pmvx.reshape(-1)
    pmvy_f = pmvy.reshape(-1)
    offs = jnp.asarray(_REFINE)

    # SATD rate weight: lambda_me = sqrt(lambda_mode) (slice.c:1261)
    lam_satd = jnp.sqrt(
        jnp.asarray(lam_me, jnp.float32) * 65536.0).astype(jnp.int32)

    def refine_unit(ref, imvx, imvy, y0, x0, px, py, h: int, w: int):
        """49-point quarter-pel refine around (imvx, imvy) with ONE window
        gather: every offset's fraction (and therefore plane pair) is
        static, so all samples are static slices of the (4, h+3, w+3)
        window."""
        orig = jax.lax.dynamic_slice(cur_y, (y0, x0), (h, w))
        iy = y0 + imvy + PADW - 1
        ix = x0 + imvx + PADW - 1
        wins = jax.lax.dynamic_slice(
            banks_f, (ref, 0, iy, ix), (1, 4, h + 3, w + 3))[0]
        base_x = imvx * 4
        base_y = imvy * 4
        preds = []
        costs = []
        for (ox, oy) in _REFINE:
            dx, dy = int(ox) & 3, int(oy) & 3
            sx, sy = (int(ox) >> 2) + 1, (int(oy) >> 2) + 1
            t = _QTAB[dy * 4 + dx]
            a = wins[t[0], sy + t[1]: sy + t[1] + h, sx + t[2]: sx + t[2] + w]
            b = wins[t[3], sy + t[4]: sy + t[4] + h, sx + t[5]: sx + t[5] + w]
            pred = (a + b + 1) >> 1
            if use_wp:
                pred = _wp_affine(pred, wp_w[ref], wp_o[ref])
            d = orig - pred
            rate = _mv_bits(base_x + ox - px) + _mv_bits(base_y + oy - py)
            preds.append(pred)
            costs.append(_satd(d) + _lam_cost(lam_satd, rate))
        costs = jnp.stack(costs)
        preds = jnp.stack(preds)
        k = jnp.argmin(costs)
        return base_x + offs[k, 0], base_y + offs[k, 1], preds[k], costs[k]

    def refine_parts(res, oy, ox, h, w):
        ref, ix, iy = res
        f = jax.vmap(lambda i: refine_unit(
            ref.reshape(-1)[i], ix.reshape(-1)[i], iy.reshape(-1)[i],
            mb_ys[i] + oy, mb_xs[i] + ox, pmvx_f[i], pmvy_f[i], h, w))
        mvx, mvy, pred, cost = f(jnp.arange(n_mb))
        return ref.reshape(-1), mvx, mvy, pred, cost

    q16 = refine_parts((r16, x16, y16), 0, 0, 16, 16)
    q168 = [refine_parts(r168[hf], 8 * hf, 0, 8, 16) for hf in range(2)]
    q816 = [refine_parts(r816[hf], 0, 8 * hf, 16, 8) for hf in range(2)]
    q88 = [refine_parts(r88[b8], 8 * (b8 >> 1), 8 * (b8 & 1), 8, 8)
           for b8 in range(4)]
    if stage == 3:
        return (sum(u.sum() for t in [q16] + q168 + q816 + q88 for u in t),
                None, None)

    # ---- sub-8x8 partition decision per 8x8 unit ------------------------
    # (mode_decision.c:531 submacroblock_mode_decision, rdopt.c:1052):
    # each 8x8 unit additionally considers 8x4 / 4x8 / 4x4 sub-blocks.
    # The unit's reference is fixed to its 8x8 winner (sub-parts of one
    # unit share ref_idx, spec §7.4.5.2); sub-block integer search runs
    # on 4x4-level SSD grids for that reference only (the me_fullfast.c
    # small-block grids, materialized per chosen ref), then quarter-pel
    # refines via the same 49-point window.  Sub-mode choice is SATD +
    # lambda * (mv rate + sub_mb_type rate), the JM SATD-mode analog.
    b8oy = (0, 0, 8, 8)
    b8ox = (0, 8, 0, 8)
    nsb = n_mb * 4  # units in MB-major order: u = 4*mb + b8
    u_mb = jnp.arange(nsb) // 4
    u_b8 = jnp.arange(nsb) % 4
    u_y0 = mb_ys[u_mb] + jnp.asarray(b8oy)[u_b8]
    u_x0 = mb_xs[u_mb] + jnp.asarray(b8ox)[u_b8]
    # unit winner (ref, qpel mv, refine cost) from the 8x8 stage
    u_ref = jnp.stack([q88[b][0] for b in range(4)], 1).reshape(-1)
    u_qx = jnp.stack([q88[b][1] for b in range(4)], 1).reshape(-1)
    u_qy = jnp.stack([q88[b][2] for b in range(4)], 1).reshape(-1)
    u_c88 = jnp.stack([q88[b][4] for b in range(4)], 1).reshape(-1)
    u_pred8 = jnp.stack([q88[b][3] for b in range(4)], 1)  # (n_mb,4,8,8)
    # picture-raster 8x8 block index of each unit (for the search center)
    u_px = pmvx_f[u_mb]
    u_py = pmvy_f[u_mb]
    # sub-block integer search centers on the unit's 8x8 winner (full
    # pel): motion divergence inside an 8x8 unit is local, so a tight
    # +-RS window around the winner covers it at ~1/7 the grid compute
    # of the full +-R sweep (the sub-block analog of the coarse-to-fine
    # me_fullfast strategy)
    RS = min(R, 10)
    DS = 2 * RS + 1
    # clamp centers so every sub-block window (and its quarter-pel
    # refinement) stays inside the padded planes; a clamped center only
    # re-centers the +-RS window — every cell still maps to its true mv
    CMAX = PADW - RS - 5
    u_cy = jnp.clip(u_qy >> 2, -CMAX, CMAX)
    u_cx = jnp.clip(u_qx >> 2, -CMAX, CMAX)
    Wn4 = 2 * RS + 4

    def block_ssd4(r, y0, x0, cy0, cx0):
        """(DS, DS) SSD grid of the 4x4 block at (y0, x0) vs ref r
        around center (cy0, cx0)."""
        win = jax.lax.dynamic_slice(
            search0, (r, y0 + cy0 - RS + PADW, x0 + cx0 - RS + PADW),
            (1, Wn4, Wn4))[0]
        cb = jax.lax.dynamic_slice(cur_y, (y0, x0), (4, 4))
        cross = jnp.zeros((DS, DS), jnp.int32)
        for i in range(4):
            for j in range(4):
                cross = cross + cb[i, j] * jax.lax.dynamic_slice(
                    win, (i, j), (DS, DS))
        w2 = win * win
        vc = jnp.cumsum(jnp.pad(w2, ((1, 0), (0, 0))), axis=0)
        vbox = vc[4:] - vc[:-4]
        hc = jnp.cumsum(jnp.pad(vbox, ((0, 0), (1, 0))), axis=1)
        r2 = hc[:, 4:] - hc[:, :-4]
        return r2 - 2 * cross + (cb * cb).sum()

    def unit_grids(u):
        g = [block_ssd4(u_ref[u], u_y0[u] + (q >> 1) * 4,
                        u_x0[u] + (q & 1) * 4, u_cy[u], u_cx[u])
             for q in range(4)]
        return jnp.stack(g)  # (4, DS, DS) quadrant grids

    s44 = jax.vmap(unit_grids)(jnp.arange(nsb))  # (nsb, 4, DS, DS)
    # mv-rate grid per unit (cells are cen + (j, i) - RS, priced vs PMV)
    dgrid_s = jnp.arange(-RS, RS + 1) * 4
    u_bx = _mv_bits(u_cx[:, None] * 4 + dgrid_s[None, :] - u_px[:, None])
    u_by = _mv_bits(u_cy[:, None] * 4 + dgrid_s[None, :] - u_py[:, None])
    u_mvb = u_by[:, :, None] + u_bx[:, None, :]  # (nsb, DS, DS)

    def sub_argmin(grid):
        """grid: (nsb, DS, DS) -> integer (mvx, mvy) per unit."""
        k = jnp.argmin((grid + _lam_cost(lam_me, u_mvb)).reshape(nsb, -1),
                       axis=-1)
        return (k % DS - RS + u_cx).astype(jnp.int32), \
            (k // DS - RS + u_cy).astype(jnp.int32)

    def refine_sub(ix, iy, oy: int, ox: int, h: int, w: int):
        f = jax.vmap(lambda u: refine_unit(
            u_ref[u], ix[u], iy[u], u_y0[u] + oy, u_x0[u] + ox,
            u_px[u], u_py[u], h, w))
        return f(jnp.arange(nsb))  # (mvx, mvy, pred, cost)

    # 8x4: halves are quadrant pairs (0,1) / (2,3)
    s84 = [s44[:, 0] + s44[:, 1], s44[:, 2] + s44[:, 3]]
    q84 = [refine_sub(*sub_argmin(s84[hf]), 4 * hf, 0, 4, 8)
           for hf in range(2)]
    # 4x8: halves are quadrant pairs (0,2) / (1,3)
    s48 = [s44[:, 0] + s44[:, 2], s44[:, 1] + s44[:, 3]]
    q48 = [refine_sub(*sub_argmin(s48[hf]), 0, 4 * hf, 8, 4)
           for hf in range(2)]
    # 4x4 quadrants
    q44 = [refine_sub(*sub_argmin(s44[:, q]), (q >> 1) * 4, (q & 1) * 4,
                      4, 4) for q in range(4)]

    # split-mode selection among {8x4, 4x8, 4x4} by SATD-level cost (the
    # motion-cost tier); the plain-8x8-vs-split decision happens later
    # at FULL RD (true residual bits + lambda_mode), mirroring JM's
    # trial-coded submacroblock_mode_decision — a SATD-only split
    # decision over-fragments grainy content (~sqrt(lambda) underprices
    # the extra mvds).
    lam_satd = jnp.sqrt(
        jnp.asarray(lam_me, jnp.float32) * 65536.0).astype(jnp.int32)
    split_cost = jnp.stack([
        q84[0][3] + q84[1][3] + _lam_cost(lam_satd, jnp.int32(3)),
        q48[0][3] + q48[1][3] + _lam_cost(lam_satd, jnp.int32(3)),
        q44[0][3] + q44[1][3] + q44[2][3] + q44[3][3]
        + _lam_cost(lam_satd, jnp.int32(5)),
    ])
    u_split = jnp.argmin(split_cost, axis=0).astype(jnp.int32) + 1  # 1..3
    # per-quadrant (2x2 subpos raster) mv of the winning split mode
    qsel = lambda q: [  # split mode -> (mvx, mvy) of subpos q
        (q84[q >> 1][0], q84[q >> 1][1]),
        (q48[q & 1][0], q48[q & 1][1]),
        (q44[q][0], q44[q][1]),
    ]

    def pick3(vals):
        return jnp.take_along_axis(jnp.stack(vals), u_split[None] - 1, 0)[0]

    spl_mvx = jnp.stack(
        [pick3([v[0] for v in qsel(q)]) for q in range(4)], 1)  # (nsb, 4)
    spl_mvy = jnp.stack(
        [pick3([v[1] for v in qsel(q)]) for q in range(4)], 1)
    # assembled unit prediction of the winning split mode
    p84 = jnp.concatenate([q84[0][2], q84[1][2]], axis=1)
    p48 = jnp.concatenate([q48[0][2], q48[1][2]], axis=2)
    p44 = jnp.concatenate([
        jnp.concatenate([q44[0][2], q44[1][2]], axis=2),
        jnp.concatenate([q44[2][2], q44[3][2]], axis=2)], axis=1)
    spl_pred = jnp.take_along_axis(
        jnp.stack([p84, p48, p44]),
        (u_split[None, :, None, None] - 1), 0)[0]  # (nsb, 8, 8)
    stb = jnp.asarray([0, 3, 3, 5], jnp.int32)[u_split]

    def chain_bits(mvxs, mvys):
        """mvxs: list of (nsb,) in sub-block scan order; chained rate."""
        tot = _mv_bits(mvxs[0] - u_px) + _mv_bits(mvys[0] - u_py)
        for a in range(1, len(mvxs)):
            tot = tot + _mv_bits(mvxs[a] - mvxs[a - 1]) \
                + _mv_bits(mvys[a] - mvys[a - 1])
        return tot

    split_mot = jnp.stack([
        chain_bits([q84[0][0], q84[1][0]], [q84[0][1], q84[1][1]]),
        chain_bits([q48[0][0], q48[1][0]], [q48[0][1], q48[1][1]]),
        chain_bits([q44[q][0] for q in range(4)],
                   [q44[q][1] for q in range(4)]),
    ])
    motb_split = (jnp.take_along_axis(split_mot, u_split[None] - 1, 0)[0]
                  + stb).reshape(n_mb, 4)
    motb_plain = (chain_bits([u_qx], [u_qy])
                  + jnp.int32(1)).reshape(n_mb, 4)  # sub_mb_type ue(0)
    # MB-level composites of the split field
    spl_pred_mb = (spl_pred.reshape(n_mb, 2, 2, 8, 8)
                   .transpose(0, 1, 3, 2, 4).reshape(n_mb, 16, 16))
    spl_mvx_mb = spl_mvx.reshape(n_mb, 4, 4)  # [mb][b8][subpos]
    spl_mvy_mb = spl_mvy.reshape(n_mb, 4, 4)
    spl_mode_mb = u_split.reshape(n_mb, 4)
    plain_pred_mb = (u_pred8.reshape(n_mb, 2, 2, 8, 8)
                     .transpose(0, 1, 3, 2, 4).reshape(n_mb, 16, 16))
    if stage == 35:
        return (spl_pred_mb.sum() + spl_mvx_mb.sum() + motb_split.sum(),
                None, None)

    # ---- skip MV field (spec §8.4.1.1 on the refined 16x16 field) ------
    mvx16 = q16[1].reshape(n_my, n_mx)
    mvy16 = q16[2].reshape(n_my, n_mx)
    ref16g = q16[0].reshape(n_my, n_mx)

    def shifted(f, dy, dx, fill):
        g = jnp.pad(f, ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))),
                    constant_values=fill)
        return g[max(-dy, 0):g.shape[0] - max(dy, 0),
                 max(-dx, 0):g.shape[1] - max(dx, 0)]

    def nb(dy, dx):
        ax = shifted(mvx16, -dy, -dx, 0)
        ay = shifted(mvy16, -dy, -dx, 0)
        ar = shifted(ref16g, -dy, -dx, -1)
        return ax, ay, ar

    # availability masks
    col = jnp.arange(n_mx)[None, :].repeat(n_my, 0)
    row = jnp.arange(n_my)[:, None].repeat(n_mx, 1)
    avA = col > 0
    avB = row > 0
    avC = (row > 0) & (col < n_mx - 1)
    avD = (row > 0) & (col > 0)
    ax_, ay_, ar_ = nb(0, -1)
    bx_, by_, br_ = nb(-1, 0)
    cx_, cy_, cr_ = nb(-1, 1)
    dx_, dy_, dr_ = nb(-1, -1)
    # C falls back to D when unavailable
    cx_ = jnp.where(avC, cx_, dx_)
    cy_ = jnp.where(avC, cy_, dy_)
    cr_ = jnp.where(avC, cr_, jnp.where(avD, dr_, -1))
    avC = avC | avD
    # median PMV against ref 0 (matching-ref shortcut)
    mA = avA & (ar_ == 0)
    mB = avB & (br_ == 0)
    mC = avC & (cr_ == 0)
    nm = mA.astype(jnp.int32) + mB + mC
    medx = _med3(jnp.where(avA, ax_, 0), jnp.where(avB, bx_, 0),
                 jnp.where(avC, cx_, 0))
    medy = _med3(jnp.where(avA, ay_, 0), jnp.where(avB, by_, 0),
                 jnp.where(avC, cy_, 0))
    onlyx = jnp.where(mA, ax_, jnp.where(mB, bx_, cx_))
    onlyy = jnp.where(mA, ay_, jnp.where(mB, by_, cy_))
    onlyA = (~avB) & (~avC) & avA
    pskx = jnp.where(nm == 1, onlyx, jnp.where(onlyA, ax_, medx))
    psky = jnp.where(nm == 1, onlyy, jnp.where(onlyA, ay_, medy))
    zero_cond = ((~avA) | (~avB)
                 | (mA & (ax_ == 0) & (ay_ == 0))
                 | (mB & (bx_ == 0) & (by_ == 0)))
    pskx = jnp.where(zero_cond, 0, pskx).reshape(-1)
    psky = jnp.where(zero_cond, 0, psky).reshape(-1)

    # ---- 5. candidate evaluation ----------------------------------------
    # per-8x8 motion per candidate: mv8 (NC, n_mb, 4, 2), ref8 (NC, n_mb, 4)
    def stack4(units):
        """units: list of 4 (ref, mvx, mvy) in b8 order."""
        ref = jnp.stack([u[0] for u in units], 1)
        mvx = jnp.stack([u[1] for u in units], 1)
        mvy = jnp.stack([u[2] for u in units], 1)
        return ref, mvx, mvy

    cands = [
        stack4([q16] * 4),
        stack4([q168[0], q168[0], q168[1], q168[1]]),
        stack4([q816[0], q816[1], q816[0], q816[1]]),
        stack4(q88),
        (jnp.zeros((n_mb, 4), jnp.int32),
         jnp.repeat(pskx[:, None], 4, 1), jnp.repeat(psky[:, None], 4, 1)),
    ]
    NC_INTER = len(cands)
    ref8 = jnp.stack([c[0] for c in cands])
    mv8x = jnp.stack([c[1] for c in cands])
    mv8y = jnp.stack([c[2] for c in cands])

    b8oy = (0, 0, 8, 8)
    b8ox = (0, 8, 0, 8)

    # candidate luma predictions assembled from the refine-stage preds
    # (no further gathers); the skip candidate needs one dynamic-fraction
    # MC per MB (window gather + 16 static fraction variants + select).
    def skip_pred(i):
        mvx, mvy = pskx[i], psky[i]
        iy = mb_ys[i] + (mvy >> 2) + PADW
        ix = mb_xs[i] + (mvx >> 2) + PADW
        wins = jax.lax.dynamic_slice(banks_f, (jnp.int32(0), 0, iy, ix),
                                     (1, 4, 18, 18))[0]
        f = (mvy & 3) * 4 + (mvx & 3)
        variants = []
        for frac in range(16):
            t = _QTAB[frac]
            a = wins[t[0], t[1]: t[1] + 16, t[2]: t[2] + 16]
            b = wins[t[3], t[4]: t[4] + 16, t[5]: t[5] + 16]
            variants.append((a + b + 1) >> 1)
        v = jnp.stack(variants)[f]
        return _wp_affine(v, wp_w[0], wp_o[0]) if use_wp else v

    pred_sk = jax.vmap(skip_pred)(jnp.arange(n_mb))
    preds = jnp.stack([
        q16[3],
        jnp.concatenate([q168[0][3], q168[1][3]], axis=1),
        jnp.concatenate([q816[0][3], q816[1][3]], axis=2),
        plain_pred_mb,  # P8x8, all units 8x8
        pred_sk,
        spl_pred_mb,    # P8x8, all units split (composed per unit below)
    ])  # (NC+1, n_mb, 16, 16)

    orig_mb = (cur_y.reshape(n_my, 16, n_mx, 16).transpose(0, 2, 1, 3)
               .reshape(n_mb, 16, 16))

    off_inter = jnp.int32(Q.default_offset4(qp, False))

    def tq_recon(pred, orig):
        """4x4 T/Q/IQ/IT recon vs pred with JM inter coefficient
        thresholding; returns (levels(4,4,4,4), recon, D, coefbits).
        Leading batch dims allowed."""
        res = orig - pred
        blk = res.reshape(*res.shape[:-2], 4, 4, 4, 4).swapaxes(-3, -2)
        co = TR.forward4x4(blk)
        lev = Q.quant4x4(co, qp, off_inter)
        lev = _rdoq4(blk, lev, qp, lam)
        deq = Q.dequant4x4(lev, qp)
        rr = TR.inverse4x4(deq.astype(jnp.int32)).astype(jnp.int32)
        pb = pred.reshape(*pred.shape[:-2], 4, 4, 4, 4).swapaxes(-3, -2)
        rec_b = ((rr + (pb << 6) + 32) >> 6).clip(0, 255)
        rec = rec_b.swapaxes(-3, -2).reshape(*pred.shape)
        return _threshold_inter_luma(lev, rec, pred, orig)

    lev_i, rec_i, D_i, cb_i = tq_recon(preds, orig_mb[None])

    # ---- per-unit plain-8x8 vs split decision at FULL RD ---------------
    # (mode_decision.c:531: each 8x8 unit's sub-partitioning is decided
    # on true residual-coded D + lambda_mode * (coef + motion bits))
    def unit_D(rec):
        d = orig_mb - rec
        q = d.reshape(n_mb, 2, 8, 2, 8)
        return (q * q).sum((2, 4)).reshape(n_mb, 4)  # [b8 = 2*by+bx]

    def unit_bits(lev):
        b4 = _coef_bits(lev)  # (n_mb, 4, 4) per 4x4 block
        return b4.reshape(n_mb, 2, 2, 2, 2).sum((2, 4)).reshape(n_mb, 4)

    Du_p, Bu_p = unit_D(rec_i[3]), unit_bits(lev_i[3])
    Du_s, Bu_s = unit_D(rec_i[5]), unit_bits(lev_i[5])
    use_split = (Du_s + _lam_cost(lam, Bu_s + motb_split)
                 < Du_p + _lam_cost(lam, Bu_p + motb_plain))  # (n_mb, 4)
    if _NO_SUB8:
        use_split = jnp.zeros_like(use_split)
    m_blk = jnp.repeat(jnp.repeat(
        use_split.reshape(n_mb, 2, 2), 2, 1), 2, 2)  # (n_mb, 4, 4)
    m_pix = jnp.repeat(jnp.repeat(
        use_split.reshape(n_mb, 2, 2), 8, 1), 8, 2)  # (n_mb, 16, 16)
    lev_i = lev_i.at[3].set(jnp.where(
        m_blk[..., None, None], lev_i[5], lev_i[3]))
    rec_i = rec_i.at[3].set(jnp.where(m_pix, rec_i[5], rec_i[3]))
    D_i = D_i.at[3].set(jnp.where(use_split, Du_s, Du_p).sum(-1))
    cb_i = cb_i.at[3].set(jnp.where(use_split, Bu_s, Bu_p).sum(-1))
    sub_mot_mb = jnp.where(use_split, motb_split, motb_plain).sum(-1)
    sub_mode_mb = jnp.where(use_split, spl_mode_mb, 0)
    sub_mvx_mb = jnp.where(use_split[:, :, None], spl_mvx_mb,
                           u_qx.reshape(n_mb, 4)[:, :, None])
    sub_mvy_mb = jnp.where(use_split[:, :, None], spl_mvy_mb,
                           u_qy.reshape(n_mb, 4)[:, :, None])
    lev_i, rec_i, D_i, cb_i = (lev_i[:5], rec_i[:5], D_i[:5], cb_i[:5])
    preds = preds.at[3].set(jnp.where(m_pix, preds[5], preds[3]))[:5]

    # skip candidate: zero residual
    skip_rec = preds[4].clip(0, 255)
    dsk = orig_mb - skip_rec
    D_skip = (dsk * dsk).sum((-1, -2))

    # header+motion rate per candidate
    mvb = (_mv_bits(mv8x - pmvx_f[None, :, None])
           + _mv_bits(mv8y - pmvy_f[None, :, None]))  # (NC, n_mb, 4)
    refb = rbits[ref8]
    hdr = jnp.asarray([1, 3, 3, 7, 0], jnp.int32)
    # per-cand motion bits: the FIRST unit prices its mvd against the
    # MB-level PMV; later units against their in-MB predictor chain
    # (spec §8.4.1.3: 16x8 bottom predicts from the top partition, 8x16
    # right from C/left, P8x8 units from earlier units) — pricing every
    # unit against the same MB PMV overcharges coherent sub-fields and
    # pushed the selection toward scattered large partitions.
    sel = jnp.asarray([
        [1, 0, 0, 0], [1, 0, 1, 0], [1, 1, 0, 0], [1, 1, 1, 1],
        [0, 0, 0, 0]], jnp.int32)

    def chain(c, a, b):
        return (_mv_bits(mv8x[c, :, a] - mv8x[c, :, b])
                + _mv_bits(mv8y[c, :, a] - mv8y[c, :, b]))

    mot = jnp.stack([
        mvb[0, :, 0],
        mvb[1, :, 0] + chain(1, 2, 0),
        mvb[2, :, 0] + chain(2, 1, 0),
        sub_mot_mb,  # per-unit sub_mb_type + chained sub-block mvds
        jnp.zeros((n_mb,), jnp.int32),
    ])
    R_inter = hdr[:, None] + mot + (refb * sel[:, None, :]).sum(-1)
    R_inter = R_inter + (cb_i * _COEF_RSCALE) // 100
    J_inter = D_i + _lam_cost(lam, R_inter)
    J_skip = D_skip  # rate ~ 0
    J_inter = J_inter.at[4].set(J_skip)
    # P16x16-at-PMV candidate: the skip PREDICTION with residual coding
    # (mvd ~ 0, motion nearly free) — shares the skip slot's tq_recon
    # outputs.  The coherent-field dual of the reference's trial-encoded
    # skip/16x16 boundary (rdopt.c RDCost_for_macroblocks): grid searches
    # over-scatter on noisy content; this candidate re-anchors the field
    # on the median-PMV chain whenever residual coding beats scatter.
    R_pmv = (1 + rbits[0] + _mv_bits(pskx - pmvx_f)
             + _mv_bits(psky - pmvy_f) + cb_i[4])
    J_pmv = D_i[4] + _lam_cost(lam, R_pmv)
    if use_drift:
        # loss-aware RDO: expected drift distortion of inter prediction
        # under simulated losses (md_highloss.c via encoder/lossaware.py)
        J_inter = J_inter + drift_pen[None, :]
        J_pmv = J_pmv + drift_pen

    # ---- I16 candidate (orig-neighbor approximation for the decision) --
    up_rows = jnp.pad(cur_y, ((1, 0), (0, 0)))[:-1]  # row above each pixel
    up_mb = (up_rows[::16][:n_my]
             .reshape(n_my, 1, W)[:, 0].reshape(n_my, n_mx, 16))
    left_cols = jnp.pad(cur_y, ((0, 0), (1, 0)))[:, :-1]
    left_mb = (left_cols[:, ::16][:, :n_mx].reshape(n_my, 16, n_mx)
               .transpose(0, 2, 1))
    ul = jnp.pad(cur_y, ((1, 0), (1, 0)))[:-1, :-1][::16, ::16]
    au = (row > 0).reshape(-1)
    al = (col > 0).reshape(-1)
    upv = up_mb.reshape(n_mb, 16)
    lfv = left_mb.reshape(n_mb, 16)
    ulv = ul.reshape(n_mb)
    i16p, i16m, i16rb = _i16_pred_all(upv, lfv, ulv, au, al, orig_mb)
    lev16, dc16, rec16, D_16, cb16 = _i16_tq(i16p, orig_mb, qp)
    J_i16 = D_16 + _lam_cost(lam, ((cb16 + 8) * _INTRA_RSCALE) // 100)
    if _NO_INTERINTRA:
        J_i16 = J_i16 + jnp.int32(1 << 29)

    J_all = jnp.concatenate(
        [J_inter, J_pmv[None], J_i16[None]], 0)  # (7, n_mb)
    if use_refresh:
        # forced intra refresh (lencod/src/intrarefresh.c:97 RandomIntra):
        # scheduled MBs must code intra regardless of cost
        J_all = jnp.where(
            force_intra[None, :] & (jnp.arange(7)[:, None] < C_I16),
            jnp.int32(1 << 29), J_all)
    win = jnp.argmin(J_all, axis=0).astype(jnp.int32)
    if stage == 4:
        return win.sum() + rec16.sum(), None, None

    # ---- winner gather ---------------------------------------------------
    take = lambda arr, w: jnp.take_along_axis(
        arr, w.reshape((1, n_mb) + (1,) * (arr.ndim - 2)), axis=0)[0]
    is_intra = win == C_I16
    win_i = jnp.minimum(win, NC_INTER - 1)
    w_lev = take(lev_i, win_i)
    w_lev = jnp.where(win[:, None, None, None, None] == C_SKIP, 0, w_lev)
    w_rec = take(rec_i, win_i)
    w_rec = jnp.where(win[:, None, None] == C_SKIP, skip_rec, w_rec)
    w_pred = take(preds, win_i)
    w_ref8 = take(ref8, win_i)
    w_mv8x = take(mv8x, win_i)
    w_mv8y = take(mv8y, win_i)
    # per-4x4 winner motion (n_mb, 4 units, 4 subpos): the sub-partition
    # field for P8x8 winners, the unit motion broadcast otherwise
    is_p88 = win == C_P8x8
    w_sub = jnp.where(is_p88[:, None], sub_mode_mb, 0)
    w_mv4x = jnp.where(is_p88[:, None, None], sub_mvx_mb,
                       w_mv8x[:, :, None])
    w_mv4y = jnp.where(is_p88[:, None, None], sub_mvy_mb,
                       w_mv8y[:, :, None])

    # ---- chroma for inter winners ---------------------------------------
    Hc, Wc = H // 2, W // 2

    def chroma_pred_mb(i):
        # one 2x2 chroma block per 4x4 luma sub-block (identical samples
        # to per-partition MC when sub-blocks share a MV)
        blocks = []
        for b8 in range(4):
            for q in range(4):
                ly = b8oy[b8] + (q >> 1) * 4
                lx = b8ox[b8] + (q & 1) * 4
                blocks.append(_mc_chroma_unit(
                    cpads_f, w_ref8[i, b8], w_mv4x[i, b8, q],
                    w_mv4y[i, b8, q],
                    (mb_ys[i] + ly) >> 1, (mb_xs[i] + lx) >> 1,
                    2, 2, pad=PADW))
        g = jnp.stack(blocks).reshape(2, 2, 2, 2, 2, 2, 2)
        # [b8y, b8x, qy, qx, ch, h, w] -> (ch, 8, 8)
        return g.transpose(4, 0, 2, 5, 1, 3, 6).reshape(2, 8, 8)

    pred_c_mb = jax.vmap(chroma_pred_mb)(jnp.arange(n_mb))  # (n_mb, 2, 8, 8)
    orig_c = jnp.stack([cur_u, cur_v]).reshape(
        2, n_my, 8, n_mx, 8).transpose(1, 3, 0, 2, 4).reshape(n_mb, 2, 8, 8)
    levc, dcc, recc, _ = _chroma_tq(pred_c_mb, orig_c, qp_c, intra=False,
                                lam=lam)
    # skip winners carry no chroma residual either
    skipm = (win == C_SKIP)
    levc = jnp.where(skipm[:, None, None, None, None, None], 0, levc)
    dcc = jnp.where(skipm[:, None, None, None], 0, dcc)
    recc = jnp.where(skipm[:, None, None, None],
                     pred_c_mb.clip(0, 255), recc)
    if stage == 5:
        return recc.sum() + w_rec.sum(), None, None

    # ---- FRExt: transform_size_8x8 decision for eligible winners --------
    # (lencod/src/transform8x8.c:1452 Mode_Decision_for_8x8Transform:
    # residual re-coded with the 8x8 core transform, chosen per MB at
    # full RD; only partitions >= 8x8 may use it, spec §7.4.5)
    w_t8 = jnp.zeros((n_mb,), jnp.int32)
    w_lev8 = jnp.zeros((n_mb, 2, 2, 8, 8), jnp.int32)
    if use_t8:
        res_t8 = (orig_mb - w_pred).reshape(n_mb, 2, 8, 2, 8).swapaxes(2, 3)
        co8 = TR.forward8x8(res_t8)
        per8, rem8 = qp // 6, qp % 6
        mf8 = jnp.asarray(Q.QUANT8)[rem8]
        # InvLevelScale8 = normAdjust8 * flat weight 16 (spec §8.5.9)
        v8 = jnp.asarray(Q.DEQUANT8)[rem8] * 16
        off8 = Q.default_offset8(qp, False)
        a8c = jnp.abs(co8)
        lev8 = jnp.where(co8 < 0,
                         -((a8c * mf8 + off8) >> (Q.Q_BITS_8 + per8)),
                         (a8c * mf8 + off8) >> (Q.Q_BITS_8 + per8))
        from ..ops.exact import rshift_rnd_sf as _rsf
        deq8 = _rsf((lev8 * v8) << per8, 6)
        rr8 = TR.inverse8x8(deq8.astype(jnp.int32))
        pb8 = w_pred.reshape(n_mb, 2, 8, 2, 8).swapaxes(2, 3)
        rec8b = ((rr8 + (pb8 << 6) + 32) >> 6).clip(0, 255)
        rec8 = rec8b.swapaxes(2, 3).reshape(n_mb, 16, 16)
        d8 = orig_mb - rec8
        D_8 = (d8 * d8).sum((-1, -2))
        a8l = jnp.abs(lev8)
        nz8 = a8l > 0
        cb8 = (jnp.where(nz8, 2 * _bitlen(jnp.maximum(a8l, 1)) + 2, 0)
               .sum((-1, -2)) + jnp.where(nz8.any((-1, -2)), 4, 0)
               ).sum((-1, -2))
        d4w = orig_mb - w_rec
        D_4 = (d4w * d4w).sum((-1, -2))
        cb4 = _coef_bits(w_lev).sum((-1, -2))
        # eligibility: inter winner, every unit at least 8x8
        ok_t8 = (~is_intra) & (win != C_SKIP) & (
            (win != C_P8x8) | (w_sub == 0).all(-1))
        use8 = ok_t8 & (D_8 + _lam_cost(lam, cb8 + 1)
                        < D_4 + _lam_cost(lam, cb4 + 1))
        w_t8 = use8.astype(jnp.int32)
        w_lev8 = jnp.where(use8[:, None, None, None, None], lev8, 0)
        w_lev = jnp.where(use8[:, None, None, None, None], 0, w_lev)
        w_rec = jnp.where(use8[:, None, None], rec8, w_rec)

    # ---- intra commit scan (raster; decoder-exact neighbors) ------------
    (rec_y, rec_u, rec_v, w_lev, lum_dc, i16mode, cip,
     levc, dcc, i4flag, ipm) = _intra_commit_scan(
        cur_y, cur_u, cur_v, w_rec, recc, is_intra, w_lev,
        levc, dcc, H, W, qp, qp_c, lam=lam)
    win = jnp.where(i4flag == 1, jnp.int32(C_I4), win)

    if stage == 6:
        return rec_y.sum() + rec_u.sum() + rec_v.sum(), None, None
    # ---- deblocking ------------------------------------------------------
    nz4 = (w_lev != 0).any((-1, -2))  # (n_mb, 4, 4) [br][bc]
    nz4 = nz4 | (is_intra[:, None, None] & (lum_dc != 0).any(
        (-1, -2))[:, None, None])
    if use_t8:
        # T8 MBs: a nonzero 8x8 block marks all four of its 4x4 cells
        nz8c = (w_lev8 != 0).any((-1, -2))  # (n_mb, 2, 2)
        nz4 = nz4 | jnp.repeat(jnp.repeat(nz8c, 2, -1), 2, -2)
    nz4_pic = (nz4.reshape(n_my, n_mx, 4, 4).transpose(0, 2, 1, 3)
               .reshape(4 * n_my, 4 * n_mx))
    def mv4_pic(a):  # (n_mb, 4, 4) unit/subpos -> (4*n_my, 4*n_mx)
        return (a.reshape(n_my, n_mx, 2, 2, 2, 2)
                .transpose(0, 2, 4, 1, 3, 5).reshape(4 * n_my, 4 * n_mx))

    mvx4 = mv4_pic(w_mv4x)
    mvy4 = mv4_pic(w_mv4y)
    ref4 = jnp.repeat(jnp.repeat(
        w_ref8.reshape(n_my, n_mx, 2, 2).transpose(0, 2, 1, 3)
        .reshape(2 * n_my, 2 * n_mx), 2, 0), 2, 1)
    intra4 = jnp.repeat(jnp.repeat(
        is_intra.reshape(n_my, n_mx), 4, 0), 4, 1)
    BSV, BSH = strengths_full(nz4_pic, mvx4, mvy4, ref4, intra4)
    if use_t8:
        # 8x8-transform MBs filter only their 8-pel-grid edges
        # (ldecod/src/loopFilter.c: !(t8 && (edge & 1)))
        t8_pic = jnp.repeat(jnp.repeat(
            (w_t8 > 0).reshape(n_my, n_mx), 4, 0), 4, 1)
        xs4 = jnp.arange(4 * n_mx) % 4
        ys4 = jnp.arange(4 * n_my) % 4
        odd_v = ((xs4 == 1) | (xs4 == 3))[None, :]
        odd_h = ((ys4 == 1) | (ys4 == 3))[:, None]
        BSV = jnp.where(t8_pic & odd_v, 0, BSV)
        BSH = jnp.where(t8_pic & odd_h, 0, BSH)
    dy_, du_, dv_ = deblock_device_full(
        rec_y, rec_u, rec_v, BSV, BSH, qp, qp_c)
    if stage == 7:
        return dy_.sum() + du_.sum() + dv_.sum(), None, None

    # ---- next reference entry -------------------------------------------
    Ypad = jnp.pad(dy_, PAD, mode="edge")
    new_bank = _bank_from_pad(Ypad)
    new_cpad = jnp.stack([
        jnp.pad(du_, PAD, mode="edge"), jnp.pad(dv_, PAD, mode="edge")])

    host_out = jnp.concatenate([
        win.reshape(-1), w_ref8.reshape(-1), w_sub.reshape(-1),
        w_t8.reshape(-1),
        w_mv4x.reshape(-1), w_mv4y.reshape(-1),
        i16mode.reshape(-1), cip.reshape(-1),
        w_lev.reshape(-1), w_lev8.reshape(-1), lum_dc.reshape(-1),
        levc.reshape(-1), dcc.reshape(-1),
        ipm.reshape(-1),
    ])
    # colocated-motion snapshot for temporal direct in future B pictures
    # (final per-4x4 list-0 motion of this picture; stays on device)
    col = (intra4, ref4, mvx4, mvy4)
    return host_out, (dy_, du_, dv_), (new_bank, new_cpad, col)


# ---------------------------------------------------------------------------
# I16 helpers (batched + per-MB)
# ---------------------------------------------------------------------------

def _i16_pred_all(up, left, ul, au, al, orig):
    """All-mode I16 prediction + SAD mode pick.  up/left: (n, 16), ul: (n,),
    au/al: (n,) bool, orig: (n, 16, 16).  Returns (pred, mode, ratebits)."""
    n = up.shape[0]
    BIG = jnp.int32(1 << 29)
    vert = jnp.broadcast_to(up[:, None, :], (n, 16, 16))
    hor = jnp.broadcast_to(left[:, :, None], (n, 16, 16))
    s_up = up.sum(-1)
    s_l = left.sum(-1)
    dc = jnp.where(
        au & al, (s_up + s_l + 16) >> 5,
        jnp.where(au, (s_up + 8) >> 4,
                  jnp.where(al, (s_l + 8) >> 4, 128)))
    dcp = jnp.broadcast_to(dc[:, None, None], (n, 16, 16))
    # plane mode (spec §8.3.3.4)
    i = jnp.arange(8)
    upb = jnp.where((6 - i)[None, :] >= 0,
                    jnp.take_along_axis(
                        up, jnp.maximum(6 - i, 0)[None, :].repeat(n, 0), 1),
                    ul[:, None])
    Hg = ((i + 1)[None, :] * (up[:, 8:] - upb)).sum(-1)
    lfb = jnp.where((6 - i)[None, :] >= 0,
                    jnp.take_along_axis(
                        left, jnp.maximum(6 - i, 0)[None, :].repeat(n, 0), 1),
                    ul[:, None])
    Vg = ((i + 1)[None, :] * (left[:, 8:] - lfb)).sum(-1)
    a = 16 * (left[:, 15] + up[:, 15])
    b = (5 * Hg + 32) >> 6
    c = (5 * Vg + 32) >> 6
    xs = jnp.arange(16) - 7
    pl = (a[:, None, None] + b[:, None, None] * xs[None, None, :]
          + c[:, None, None] * xs[None, :, None] + 16) >> 5
    plane = pl.clip(0, 255)
    preds = jnp.stack([vert, hor, dcp, plane], 1)  # (n, 4, 16, 16)
    # JM mode pick is Hadamard SATD with the block DCs re-transformed
    # separately (lencod/src/intra16x16.c find_sad_16x16, UseHadamard=1):
    # the I16 DC plane gets its own transform, so per-4x4 DC terms must
    # not be priced as AC energy
    d = orig[:, None] - preds  # (n, 4, 16, 16)
    b = d.reshape(n, 4, 4, 4, 4, 4).swapaxes(-3, -2)
    h = TR.hadamard4x4(b)
    ac = jnp.abs(h).sum((-1, -2)) - jnp.abs(h[..., 0, 0])
    hdc = TR.hadamard4x4(h[..., 0, 0])
    sad = (ac.sum((-1, -2)) + jnp.abs(hdc).sum((-1, -2))) >> 1
    valid = jnp.stack([au, al, jnp.ones_like(au), au & al], 1)
    sad = jnp.where(valid, sad, BIG)
    mode = jnp.argmin(sad, 1).astype(jnp.int32)
    pred = jnp.take_along_axis(
        preds, mode[:, None, None, None], axis=1)[:, 0]
    return pred, mode, None


def _i16_tq(pred, orig, qp: int):
    """I16 transform path: DC hadamard + AC quant (JM dct_16x16,
    lencod/src/block.c:564).  pred/orig: (..., 16, 16)."""
    res = orig - pred
    blk = res.reshape(*res.shape[:-2], 4, 4, 4, 4).swapaxes(-3, -2)
    co = TR.forward4x4(blk)
    dc = co[..., 0, 0]
    dch = TR.hadamard4x4(dc) >> 1
    dc_lev = Q.quant_luma_dc(dch, qp, intra=True)
    off = jnp.int32(Q.default_offset4(qp, True))
    lev = Q.quant4x4(co, qp, off)
    lev = lev.at[..., 0, 0].set(0)
    # recon
    dc_deq = Q.dequant_luma_dc(
        TR.hadamard4x4(dc_lev.astype(jnp.int32)), qp)
    deq = Q.dequant4x4(lev, qp).astype(jnp.int32)
    deq = deq.at[..., 0, 0].set(dc_deq)
    rr = TR.inverse4x4(deq).astype(jnp.int32)
    pb = pred.reshape(*pred.shape[:-2], 4, 4, 4, 4).swapaxes(-3, -2)
    rec_b = ((rr + (pb << 6) + 32) >> 6).clip(0, 255)
    rec = rec_b.swapaxes(-3, -2).reshape(*pred.shape)
    d = orig - rec
    D_ = (d * d).sum((-1, -2))
    cb = _coef_bits(lev).sum((-1, -2)) + _coef_bits(
        dc_lev[..., None, :, :])[..., 0]
    return lev, dc_lev, rec, D_, cb


def _chroma_tq(pred, orig, qp_c: int, intra: bool, lam=None):
    """Chroma residual path per MB: pred/orig (n, 2, 8, 8).
    Returns levels (n, 2, 2, 2, 4, 4), dc (n, 2, 2, 2), recon (n, 2, 8, 8)."""
    res = orig - pred
    blk = res.reshape(*res.shape[:-2], 2, 4, 2, 4).swapaxes(-3, -2)
    co = TR.forward4x4(blk)
    dc = co[..., 0, 0]
    dch = TR.hadamard2x2(dc)
    dc_lev = Q.quant_chroma_dc(dch, qp_c, intra)
    off = jnp.int32(Q.default_offset4(qp_c, intra))
    lev = Q.quant4x4(co, qp_c, off)
    lev = lev.at[..., 0, 0].set(0)
    if lam is not None:
        # AC soft quantization (DC slot is 0, so _rdoq4 leaves it; the
        # missing separately-scaled DC only misstates the error's DC
        # component, which is orthogonal to every AC basis row)
        lev = _rdoq4(blk, lev, qp_c, lam)
        lev = lev.at[..., 0, 0].set(0)
    if not intra:
        # JM chroma AC thresholding (block.c:1384): per component, drop
        # all AC coefficients when their coeff_cost < _CHROMA_COEFF_COST_
        ac_cost = _block4_coeff_cost(lev, first=1).sum((-1, -2))  # (n, 2)
        drop = (ac_cost < 4)[..., None, None, None, None]
        lev = jnp.where(drop, 0, lev)
    deq = Q.dequant4x4(lev, qp_c).astype(jnp.int32)
    dc_deq = Q.dequant_chroma_dc(TR.hadamard2x2(dc_lev.astype(jnp.int32)),
                                 qp_c)
    deq = deq.at[..., 0, 0].set(dc_deq)
    rr = TR.inverse4x4(deq).astype(jnp.int32)
    pb = pred.reshape(*pred.shape[:-2], 2, 4, 2, 4).swapaxes(-3, -2)
    rec_b = ((rr + (pb << 6) + 32) >> 6).clip(0, 255)
    rec = rec_b.swapaxes(-3, -2).reshape(*pred.shape)
    return lev, dc_lev, rec, None


# 4x4 block decode order (z-order) -> (bx, by), and internal up-right
# availability: for by > 0 the up-right block must precede in decode
# order (spec §6.4.8 via mb_access semantics)
_BLK4_XY = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
            (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3)]
_XY_TO_BLK = {xy: k for k, xy in enumerate(_BLK4_XY)}
_I4_AUR_INT = [
    (by > 0 and bx < 3 and _XY_TO_BLK[(bx + 1, by - 1)] < blk)
    for blk, (bx, by) in enumerate(_BLK4_XY)
]


def _i4_pred9(up, ur, left, X, au, al, aul, aur):
    """All nine 4x4 intra predictions (spec §8.3.1.2; the batched dual of
    ops/intra.py pred4x4).  up/ur/left: (4,) int32; X scalar; a*: bool
    scalars.  Returns (preds (9, 4, 4), valid (9,))."""
    dcv = jnp.int32(128)
    upv = jnp.where(au, up, dcv)
    A, B, C, D = upv[0], upv[1], upv[2], upv[3]
    urv = jnp.where(aur, ur, D)
    E, F, G_, H_ = urv[0], urv[1], urv[2], urv[3]
    lfv = jnp.where(al, left, dcv)
    I, J, K, L = lfv[0], lfv[1], lfv[2], lfv[3]
    Xv = jnp.where(aul, X, dcv)

    def m(rows):
        return jnp.stack([jnp.stack(r) for r in rows])

    vert = jnp.broadcast_to(upv[None, :], (4, 4))
    hor = jnp.broadcast_to(lfv[:, None], (4, 4))
    dc = jnp.where(
        au & al, (A + B + C + D + I + J + K + L + 4) >> 3,
        jnp.where(al, (I + J + K + L + 2) >> 2,
                  jnp.where(au, (A + B + C + D + 2) >> 2, dcv)))
    dcp = jnp.broadcast_to(dc, (4, 4))
    d0 = (A + C + 2 * B + 2) >> 2
    d1 = (B + D + 2 * C + 2) >> 2
    d2 = (C + E + 2 * D + 2) >> 2
    d3 = (D + F + 2 * E + 2) >> 2
    d4 = (E + G_ + 2 * F + 2) >> 2
    d5 = (F + H_ + 2 * G_ + 2) >> 2
    d6 = (G_ + 3 * H_ + 2) >> 2
    ddl = m([[d0, d1, d2, d3], [d1, d2, d3, d4],
             [d2, d3, d4, d5], [d3, d4, d5, d6]])
    r0 = (L + 2 * K + J + 2) >> 2
    r1 = (K + 2 * J + I + 2) >> 2
    r2 = (J + 2 * I + Xv + 2) >> 2
    r3 = (I + 2 * Xv + A + 2) >> 2
    r4 = (Xv + 2 * A + B + 2) >> 2
    r5 = (A + 2 * B + C + 2) >> 2
    r6 = (B + 2 * C + D + 2) >> 2
    ddr = m([[r3, r4, r5, r6], [r2, r3, r4, r5],
             [r1, r2, r3, r4], [r0, r1, r2, r3]])
    v0 = (Xv + A + 1) >> 1
    v1 = (A + B + 1) >> 1
    v2 = (B + C + 1) >> 1
    v3 = (C + D + 1) >> 1
    v4 = (I + 2 * Xv + A + 2) >> 2
    v5 = (Xv + 2 * A + B + 2) >> 2
    v6 = (A + 2 * B + C + 2) >> 2
    v7 = (B + 2 * C + D + 2) >> 2
    v8 = (Xv + 2 * I + J + 2) >> 2
    v9 = (I + 2 * J + K + 2) >> 2
    vr = m([[v0, v1, v2, v3], [v4, v5, v6, v7],
            [v8, v0, v1, v2], [v9, v4, v5, v6]])
    l0 = (A + B + 1) >> 1
    l1 = (B + C + 1) >> 1
    l2 = (C + D + 1) >> 1
    l3 = (D + E + 1) >> 1
    l4 = (E + F + 1) >> 1
    l5 = (A + 2 * B + C + 2) >> 2
    l6 = (B + 2 * C + D + 2) >> 2
    l7 = (C + 2 * D + E + 2) >> 2
    l8 = (D + 2 * E + F + 2) >> 2
    l9 = (E + 2 * F + G_ + 2) >> 2
    vl = m([[l0, l1, l2, l3], [l5, l6, l7, l8],
            [l1, l2, l3, l4], [l6, l7, l8, l9]])
    u0 = (I + J + 1) >> 1
    u1 = (I + 2 * J + K + 2) >> 2
    u2 = (J + K + 1) >> 1
    u3 = (J + 2 * K + L + 2) >> 2
    u4 = (K + L + 1) >> 1
    u5 = (K + 3 * L + 2) >> 2
    hu = m([[u0, u1, u2, u3], [u2, u3, u4, u5],
            [u4, u5, L, L], [L, L, L, L]])
    h0 = (Xv + I + 1) >> 1
    h1 = (I + 2 * Xv + A + 2) >> 2
    h2 = (Xv + 2 * A + B + 2) >> 2
    h3 = (A + 2 * B + C + 2) >> 2
    h4 = (I + J + 1) >> 1
    h5 = (Xv + 2 * I + J + 2) >> 2
    h6 = (J + K + 1) >> 1
    h7 = (I + 2 * J + K + 2) >> 2
    h8 = (K + L + 1) >> 1
    h9 = (J + 2 * K + L + 2) >> 2
    hd = m([[h0, h1, h2, h3], [h4, h5, h0, h1],
            [h6, h7, h4, h5], [h8, h9, h6, h7]])
    preds = jnp.stack([vert, hor, dcp, ddl, ddr, vr, hd, vl, hu])
    T = jnp.asarray(True)
    valid = jnp.stack([au, al, T, au, au & al & aul, au & al & aul,
                       au & al & aul, au, al])
    return preds, valid


# I4 rate-model calibration vs real CABAC costs (see encoder notes):
# non-MPM mode signalling in adapted CABAC contexts costs more than the
# nominal 1+3 bins; coefficient bits cost less than the CAVLC-shaped
# _coef_bits estimate.  Units: _I4_COEF_NUM/4 scales coef bits.
_I4_NONMPM = 4
_I4_NONMPM_RARE = 9
_I4_COEF_NUM = 3


def _intra_commit_scan(cur_y, cur_u, cur_v, w_rec, recc, is_intra, w_lev,
                       levc, dcc, H: int, W: int, qp: int, qp_c: int,
                       lam=0):
    """Raster commit: assemble the recon planes; intra MBs are re-decided
    (I16 vs I4x4, per-block 9-mode decision against final neighbor recon
    — decoder semantics, the batched analog of rdopt.c:597
    Mode_Decision_for_4x4IntraBlocks) and reconstructed in place."""
    n_my, n_mx = H // 16, W // 16
    n_mb = n_my * n_mx
    Hc, Wc = H // 2, W // 2
    lum_dc = jnp.zeros((n_mb, 4, 4), jnp.int32)
    i16mode = jnp.zeros((n_mb,), jnp.int32)
    cip = jnp.zeros((n_mb,), jnp.int32)
    i4flag = jnp.zeros((n_mb,), jnp.int32)
    # 1-pel top/left border + 4-pel right margin for up-right reads
    Yp = jnp.pad(cur_y * 0, ((1, 0), (1, 4)))
    Up = jnp.zeros((Hc + 1, Wc + 1), jnp.int32)
    Vp = jnp.zeros((Hc + 1, Wc + 1), jnp.int32)
    # per-4x4 intra-mode plane (decoder ipredmode semantics: -1 outside,
    # DC for non-I4 MBs), 1-pel top/left border
    ipm = jnp.full((4 * n_my + 1, 4 * n_mx + 1), -1, jnp.int32)

    orig_mb = (cur_y.reshape(n_my, 16, n_mx, 16).transpose(0, 2, 1, 3)
               .reshape(n_mb, 16, 16))
    orig_c = jnp.stack([cur_u, cur_v]).reshape(
        2, n_my, 8, n_mx, 8).transpose(1, 3, 0, 2, 4).reshape(n_mb, 2, 8, 8)
    off_intra = jnp.int32(Q.default_offset4(qp, True))

    def mb_compute(i, Yp, Up, Vp, ipm):
        """Decide + reconstruct ONE MB against final neighbor recon;
        pure reads of the carry planes (no in-place update — the
        wavefront step scatters the returned tiles)."""
        r = i // n_mx
        c = i % n_mx
        y0, x0 = 16 * r, 16 * c
        yc, xc = 8 * r, 8 * c
        au = r > 0
        al = c > 0
        avc = c < n_mx - 1

        def i4_decide(_):
            """Sequential 16-block I4 decision + recon.  Returns
            (rec (16,16), lev (4,4,4,4), D, coefbits+modebits,
            modes (4,4))."""
            # workspace: rows y0..y0+16, cols x0..x0+20 of the padded
            # plane (1-px top/left border included)
            work = jax.lax.dynamic_slice(Yp, (y0, x0), (17, 21))
            mwork = jax.lax.dynamic_slice(ipm, (4 * r, 4 * c), (5, 5))
            lev_mb = jnp.zeros((4, 4, 4, 4), jnp.int32)
            D_tot = jnp.int32(0)
            bits = jnp.int32(0)
            for blk in range(16):
                bx, by = _BLK4_XY[blk]
                px, py = 1 + 4 * bx, 1 + 4 * by
                up = work[py - 1, px : px + 4]
                urr = work[py - 1, px + 4 : px + 8]
                lf = work[py : py + 4, px - 1]
                X = work[py - 1, px - 1]
                au_b = au if by == 0 else jnp.asarray(True)
                al_b = al if bx == 0 else jnp.asarray(True)
                if by == 0:
                    aur_b = (au & avc) if bx == 3 else au
                else:
                    aur_b = jnp.asarray(_I4_AUR_INT[blk])
                if bx > 0 and by > 0:
                    aul_b = jnp.asarray(True)
                elif bx == 0 and by == 0:
                    aul_b = au & al
                elif bx == 0:
                    aul_b = al
                else:
                    aul_b = au
                preds, valid = _i4_pred9(up, urr, lf, X, au_b, al_b,
                                         aul_b, aur_b)
                # most probable mode (decoder rule)
                lm = mwork[1 + by, bx]
                um = mwork[by, 1 + bx]
                mpm = jnp.where((lm < 0) | (um < 0), 2, jnp.minimum(lm, um))
                ob = orig_mb[i, 4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4]
                # full RD over all nine modes (rdopt.c:597
                # Mode_Decision_for_4x4IntraBlocks / RDCost_for_4x4Intra
                # Blocks): T/Q/IQ/IT every candidate, charge true recon
                # SSD + lambda * (mode + coefficient bits)
                res9 = ob[None] - preds
                co9 = TR.forward4x4(res9)
                lev9 = Q.quant4x4(co9, qp, off_intra)
                deq9 = Q.dequant4x4(lev9, qp).astype(jnp.int32)
                rr9 = TR.inverse4x4(deq9)
                rec9 = ((rr9 + (preds << 6) + 32) >> 6).clip(0, 255)
                dd9 = ob[None] - rec9
                ssd9 = (dd9 * dd9).sum((-1, -2))
                m9 = jnp.arange(9)
                mb_bits = jnp.where(
                    m9 == mpm, 1,
                    jnp.where(m9 < 3, _I4_NONMPM, _I4_NONMPM_RARE))
                rate9 = (_coef_bits(lev9) * _I4_COEF_NUM) // 4 + mb_bits
                costs = jnp.where(valid, ssd9 + _lam_cost(lam, rate9),
                                  jnp.int32(1 << 29))
                mode = jnp.argmin(costs).astype(jnp.int32)
                lev = lev9[mode]
                rec = rec9[mode]
                D_tot = D_tot + ssd9[mode]
                bits = bits + rate9[mode]
                lev_mb = lev_mb.at[by, bx].set(lev)
                work = jax.lax.dynamic_update_slice(work, rec, (py, px))
                mwork = mwork.at[1 + by, 1 + bx].set(mode)
            return work[1:, 1:17], lev_mb, D_tot, bits, mwork[1:, 1:]

        def intra_case(_):
            up = jax.lax.dynamic_slice(Yp, (y0, x0 + 1), (1, 16))[0]
            left = jax.lax.dynamic_slice(Yp, (y0 + 1, x0), (16, 1))[:, 0]
            ul = Yp[y0, x0]
            pred, mode, _ = _i16_pred_all(
                up[None], left[None], ul[None], au[None], al[None],
                orig_mb[i][None])
            lev, dclev, rec, D16, cb16 = _i16_tq(pred[0], orig_mb[i], qp)
            J16 = D16 + _lam_cost(lam, (cb16 * _I4_COEF_NUM) // 4 + 8)
            rec4, lev4, D4, cb4, modes4 = i4_decide(None)
            J4 = D4 + _lam_cost(lam, cb4 + 9)
            use4 = J4 < J16
            rec = jnp.where(use4, rec4, rec)
            lev = jnp.where(use4, lev4, lev)
            dclev = jnp.where(use4, 0, dclev)
            modes4 = jnp.where(use4, modes4, 2)
            # chroma: 4 modes vs recon neighbors
            upc = jnp.stack([
                jax.lax.dynamic_slice(Up, (yc, xc + 1), (1, 8))[0],
                jax.lax.dynamic_slice(Vp, (yc, xc + 1), (1, 8))[0]])
            lfc = jnp.stack([
                jax.lax.dynamic_slice(Up, (yc + 1, xc), (8, 1))[:, 0],
                jax.lax.dynamic_slice(Vp, (yc + 1, xc), (8, 1))[:, 0]])
            ulc = jnp.stack([Up[yc, xc], Vp[yc, xc]])
            cpreds = _chroma_pred4(upc, lfc, ulc, au, al)  # (4, 2, 8, 8)
            # full RD over the four chroma modes (rdopt.c RDCost_for_
            # macroblocks runs the chroma residual per candidate mode):
            # recon SSD + lambda * (coef + mode bits); mode bits follow
            # the intra_chroma_pred_mode binarization (1/2/3/3 bins)
            oc4 = jnp.broadcast_to(orig_c[i][None], (4, 2, 8, 8))
            clev4, cdc4, crec4, _ = _chroma_tq(cpreds, oc4, qp_c,
                                               intra=True)
            dc_ = oc4 - crec4
            cD = (dc_ * dc_).sum((-1, -2, -3))
            adc = jnp.abs(cdc4)
            dcb = jnp.where(adc > 0,
                            2 * _bitlen(jnp.maximum(adc, 1)) + 1,
                            0).sum((-1, -2, -3))
            ccb = (_coef_bits(clev4).sum((-1, -2, -3)) + dcb)
            cmb = jnp.asarray([1, 2, 3, 3], jnp.int32)
            cvalid = jnp.stack([
                jnp.asarray(True), al, au, au & al])
            cJ = jnp.where(
                cvalid,
                cD + _lam_cost(lam, (ccb * _I4_COEF_NUM) // 4 + cmb),
                jnp.int32(1 << 29))
            cmode = jnp.argmin(cJ).astype(jnp.int32)
            return (rec, crec4[cmode], lev, dclev, mode[0], cmode,
                    clev4[cmode], cdc4[cmode], use4.astype(jnp.int32),
                    modes4)

        def inter_case(_):
            return (w_rec[i], recc[i],
                    w_lev[i], jnp.zeros((4, 4), jnp.int32),
                    jnp.int32(0), jnp.int32(0), levc[i], dcc[i],
                    jnp.int32(0), jnp.full((4, 4), 2, jnp.int32))

        return jax.lax.cond(is_intra[i], intra_case, inter_case, None)

    # ---- wavefront schedule --------------------------------------------
    # MB (r, c) depends on (r, c-1), (r-1, c), (r-1, c+1): time t = 2r+c
    # satisfies all three (t-1, t-2, t-1), so each anti-diagonal commits
    # in parallel — depth 2*n_my + n_mx - 1 steps instead of n_mb (the
    # encoder dual of ldecod's MB dependence cone; SURVEY §2.3 wavefront)
    T = 2 * n_my + n_mx - 1
    LMAX = min(n_my, n_mx // 2 + 1)
    diag_np = np.full((T, LMAX), n_mb, np.int64)  # n_mb = dropped lane
    for t in range(T):
        k = 0
        for r_ in range(n_my):
            c_ = t - 2 * r_
            if 0 <= c_ < n_mx:
                diag_np[t, k] = r_ * n_mx + c_
                k += 1
    diag_j = jnp.asarray(diag_np)

    def step(carry, t):
        (Yp, Up, Vp, ipm, w_lev, levc, dcc, lum_dc, i16mode, cip,
         i4flag) = carry
        ids = diag_j[t]                      # (LMAX,)
        idc = jnp.minimum(ids, n_mb - 1)     # clamped for padded lanes
        (rec, crec, lev, dclev, mode, cmode, clev, cdc, use4,
         modes4) = jax.vmap(
            lambda i: mb_compute(i, Yp, Up, Vp, ipm))(idc)
        valid = ids < n_mb
        r = idc // n_mx
        c = idc % n_mx
        far = jnp.int32(1 << 20)             # OOB row -> scatter-dropped
        oy = jnp.where(valid, 16 * r + 1, far)
        a16 = jnp.arange(16)
        iy = oy[:, None, None] + a16[None, :, None]
        ix = (16 * c + 1)[:, None, None] + a16[None, None, :]
        Yp = Yp.at[iy, ix].set(rec, mode="drop")
        a8 = jnp.arange(8)
        oyc = jnp.where(valid, 8 * r + 1, far)
        iyc = oyc[:, None, None] + a8[None, :, None]
        ixc = (8 * c + 1)[:, None, None] + a8[None, None, :]
        Up = Up.at[iyc, ixc].set(crec[:, 0], mode="drop")
        Vp = Vp.at[iyc, ixc].set(crec[:, 1], mode="drop")
        a4 = jnp.arange(4)
        oym = jnp.where(valid, 4 * r + 1, far)
        iym = oym[:, None, None] + a4[None, :, None]
        ixm = (4 * c + 1)[:, None, None] + a4[None, None, :]
        ipm = ipm.at[iym, ixm].set(modes4, mode="drop")
        w_lev = w_lev.at[ids].set(lev, mode="drop")
        levc = levc.at[ids].set(clev, mode="drop")
        dcc = dcc.at[ids].set(cdc, mode="drop")
        lum_dc = lum_dc.at[ids].set(dclev, mode="drop")
        i16mode = i16mode.at[ids].set(mode, mode="drop")
        cip = cip.at[ids].set(cmode, mode="drop")
        i4flag = i4flag.at[ids].set(use4, mode="drop")
        return (Yp, Up, Vp, ipm, w_lev, levc, dcc, lum_dc, i16mode, cip,
                i4flag), None

    init = (Yp, Up, Vp, ipm, w_lev, levc, dcc, lum_dc, i16mode, cip, i4flag)
    (Yp, Up, Vp, ipm, w_lev, levc, dcc, lum_dc, i16mode, cip,
     i4flag), _ = jax.lax.scan(step, init, jnp.arange(T))
    return (Yp[1:, 1 : 4 * n_mx * 4 + 1], Up[1:, 1:], Vp[1:, 1:], w_lev,
            lum_dc, i16mode, cip, levc, dcc, i4flag, ipm[1:, 1:])


@functools.partial(jax.jit, static_argnames=("H", "W"))
def rd_i_pipeline(cur_y, cur_u, cur_v, qp, qp_c, lam, H: int, W: int):
    """Whole-picture intra (I/IDR) coding on device: the
    `_intra_commit_scan` raster commit with every MB intra — full-RD
    I16-vs-I4 with 9-mode 4x4 decisions (lencod/src/rdopt.c:597
    Mode_Decision_for_4x4IntraBlocks) — so I pictures ride the same
    executable family as the P/B pipelines instead of the host oracle
    loop.  qp/qp_c/lam are traced: one executable serves every QP.

    Returns (recon_y, recon_u, recon_v, lev, lum_dc, i16mode, cip,
    levc, dcc, i4flag, ipm)."""
    n_mb = (H // 16) * (W // 16)
    z = jnp.zeros
    return _intra_commit_scan(
        cur_y.astype(jnp.int32), cur_u.astype(jnp.int32),
        cur_v.astype(jnp.int32),
        z((n_mb, 16, 16), jnp.int32), z((n_mb, 2, 8, 8), jnp.int32),
        jnp.ones((n_mb,), bool),
        z((n_mb, 4, 4, 4, 4), jnp.int32),
        z((n_mb, 2, 2, 2, 4, 4), jnp.int32),
        z((n_mb, 2, 2, 2), jnp.int32),
        H=H, W=W, qp=qp, qp_c=qp_c, lam=lam)


def _chroma_pred4(up, left, ul, au, al):
    """4 chroma pred modes for an 8x8 4:2:0 MB; up/left: (2, 8), ul: (2,).
    Returns (4, 2, 8, 8) [DC, HOR, VERT, PLANE] (JM mode numbering)."""
    u0, u1 = up[:, :4].sum(-1), up[:, 4:].sum(-1)
    l0, l1 = left[:, :4].sum(-1), left[:, 4:].sum(-1)
    both = au & al
    # corner classes: TL/BR avg both; TR prefers up; BL prefers left
    tl = jnp.where(both, (u0 + l0 + 4) >> 3,
                   jnp.where(au, (u0 + 2) >> 2,
                             jnp.where(al, (l0 + 2) >> 2, 128)))
    tr = jnp.where(au, (u1 + 2) >> 2,
                   jnp.where(al, (l0 + 2) >> 2, 128))
    bl = jnp.where(al, (l1 + 2) >> 2,
                   jnp.where(au, (u0 + 2) >> 2, 128))
    br = jnp.where(both, (u1 + l1 + 4) >> 3,
                   jnp.where(au, (u1 + 2) >> 2,
                             jnp.where(al, (l1 + 2) >> 2, 128)))
    dcq = jnp.stack([jnp.stack([tl, tr], -1), jnp.stack([bl, br], -1)], -2)
    dc = jnp.repeat(jnp.repeat(dcq, 4, -1), 4, -2)  # (2, 8, 8)
    hor = jnp.broadcast_to(left[:, :, None], (2, 8, 8))
    vert = jnp.broadcast_to(up[:, None, :], (2, 8, 8))
    i = jnp.arange(4)
    ub = jnp.where((2 - i)[None] >= 0,
                   jnp.take_along_axis(
                       up, jnp.maximum(2 - i, 0)[None].repeat(2, 0), 1),
                   ul[:, None])
    Hg = ((i + 1)[None] * (up[:, 4:] - ub)).sum(-1)
    lb = jnp.where((2 - i)[None] >= 0,
                   jnp.take_along_axis(
                       left, jnp.maximum(2 - i, 0)[None].repeat(2, 0), 1),
                   ul[:, None])
    Vg = ((i + 1)[None] * (left[:, 4:] - lb)).sum(-1)
    a = 16 * (left[:, 7] + up[:, 7])
    b = (34 * Hg + 32) >> 6
    cc = (34 * Vg + 32) >> 6
    xs = jnp.arange(8) - 3
    pl = ((a[:, None, None] + b[:, None, None] * xs[None, None, :]
           + cc[:, None, None] * xs[None, :, None] + 16) >> 5).clip(0, 255)
    return jnp.stack([dc, hor, vert, pl])


# ---------------------------------------------------------------------------
# full-strength deblocking (bs 0..4) on device
# ---------------------------------------------------------------------------

def strengths_full(nz4, mvx4, mvy4, ref4, intra4):
    """Boundary strengths for P frames with partitions + intra MBs.

    nz4/mvx4/mvy4/ref4/intra4: (4*n_my, 4*n_mx) per-4x4 arrays.
    BS rules (ldecod/src/loopFilter.c GetStrengthNormal): intra => 4 at MB
    edges, 3 inside; else coeffs => 2; else mv/ref difference => 1."""
    H4, W4 = nz4.shape

    def bs(q, p, mb_edge):
        ei = intra4[q] | intra4[p]
        coef = nz4[q] | nz4[p]
        mv_d = ((jnp.abs(mvx4[q] - mvx4[p]) >= 4)
                | (jnp.abs(mvy4[q] - mvy4[p]) >= 4)
                | (ref4[q] != ref4[p]))
        inter = jnp.where(coef, 2, mv_d.astype(jnp.int32))
        return jnp.where(ei, jnp.where(mb_edge, 4, 3), inter)

    colv = (jnp.arange(1, W4) % 4 == 0)[None, :]
    BSV = jnp.zeros((H4, W4), jnp.int32)
    BSV = BSV.at[:, 1:].set(bs(
        (slice(None), slice(1, None)), (slice(None), slice(0, W4 - 1)), colv))
    rowh = (jnp.arange(1, H4) % 4 == 0)[:, None]
    BSH = jnp.zeros((H4, W4), jnp.int32)
    BSH = BSH.at[1:, :].set(bs(
        (slice(1, None), slice(None)), (slice(0, H4 - 1), slice(None)), rowh))
    return BSV, BSH


def _edge_luma_full(L3, L2, L1, L0, R0, R1, R2, R3, S, alpha, beta, clip_row,
                    max_val):
    """One luma edge, normal (bs 1-3) + strong (bs 4) filters
    (spec §8.7.2.3/§8.7.2.4; ldecod/src/loopFilter.c EdgeLoopLumaNormal).
    Returns new (L2, L1, L0, R0, R1, R2)."""
    delta = R0 - L0
    filt = ((S != 0) & (jnp.abs(delta) < alpha)
            & (jnp.abs(R0 - R1) < beta) & (jnp.abs(L0 - L1) < beta))
    ap = jnp.abs(L0 - L2) < beta
    aq = jnp.abs(R0 - R2) < beta
    # normal path
    C0 = clip_row[jnp.clip(S, 0, 3)]
    c0 = C0 + ap + aq
    dif = jnp.clip(((delta << 2) + (L1 - R1) + 4) >> 3, -c0, c0)
    RL0 = (L0 + R0 + 1) >> 1
    nL1 = L1 + jnp.where(ap, jnp.clip((L2 + RL0 - (L1 << 1)) >> 1, -C0, C0), 0)
    nR1 = R1 + jnp.where(aq, jnp.clip((R2 + RL0 - (R1 << 1)) >> 1, -C0, C0), 0)
    nL0 = jnp.clip(L0 + dif, 0, max_val)
    nR0 = jnp.clip(R0 - dif, 0, max_val)
    # strong path (bs == 4)
    small = jnp.abs(delta) < ((alpha >> 2) + 2)
    sp = ap & small
    sq = aq & small
    sL0 = jnp.where(sp, (L2 + 2 * L1 + 2 * L0 + 2 * R0 + R1 + 4) >> 3,
                    (2 * L1 + L0 + R1 + 2) >> 2)
    sL1 = jnp.where(sp, (L2 + L1 + L0 + R0 + 2) >> 2, L1)
    sL2 = jnp.where(sp, (2 * L3 + 3 * L2 + L1 + L0 + R0 + 4) >> 3, L2)
    sR0 = jnp.where(sq, (R2 + 2 * R1 + 2 * R0 + 2 * L0 + L1 + 4) >> 3,
                    (2 * R1 + R0 + L1 + 2) >> 2)
    sR1 = jnp.where(sq, (R2 + R1 + R0 + L0 + 2) >> 2, R1)
    sR2 = jnp.where(sq, (2 * R3 + 3 * R2 + R1 + R0 + L0 + 4) >> 3, R2)
    strong = S == 4
    oL2 = jnp.where(strong, sL2, L2)
    oL1 = jnp.where(strong, sL1, nL1)
    oL0 = jnp.where(strong, sL0, nL0)
    oR0 = jnp.where(strong, sR0, nR0)
    oR1 = jnp.where(strong, sR1, nR1)
    oR2 = jnp.where(strong, sR2, R2)
    return (jnp.where(filt, oL2, L2), jnp.where(filt, oL1, L1),
            jnp.where(filt, oL0, L0), jnp.where(filt, oR0, R0),
            jnp.where(filt, oR1, R1), jnp.where(filt, oR2, R2))


def _edge_chroma_full(L1, L0, R0, R1, S, alpha, beta, clip_row, max_val):
    delta = R0 - L0
    filt = ((S != 0) & (jnp.abs(delta) < alpha)
            & (jnp.abs(R0 - R1) < beta) & (jnp.abs(L0 - L1) < beta))
    c0 = clip_row[jnp.clip(S, 0, 3)] + 1
    dif = jnp.clip(((delta << 2) + (L1 - R1) + 4) >> 3, -c0, c0)
    nL0 = jnp.clip(L0 + dif, 0, max_val)
    nR0 = jnp.clip(R0 - dif, 0, max_val)
    sL0 = (2 * L1 + L0 + R1 + 2) >> 2
    sR0 = (2 * R1 + R0 + L1 + 2) >> 2
    strong = S == 4
    oL0 = jnp.where(strong, sL0, nL0)
    oR0 = jnp.where(strong, sR0, nR0)
    return jnp.where(filt, oL0, L0), jnp.where(filt, oR0, R0)


def deblock_device_full(rec_y, rec_u, rec_v, BSV, BSH, qp: int, qp_c: int,
                        max_val: int = 255):
    """Sequential (JM-order) full-strength deblock on device."""
    H, W = rec_y.shape
    n_my, n_mx = H // 16, W // 16
    n_mb = n_my * n_mx
    # qp may be traced: threshold tables become device gathers
    iA = jnp.clip(jnp.asarray(qp), 0, 51)
    at = jnp.asarray(ALPHA_TABLE, jnp.int32)
    bt = jnp.asarray(BETA_TABLE, jnp.int32)
    ct = jnp.asarray(np.asarray(CLIP_TAB)[:, :4], jnp.int32)
    alpha, beta, clip_row = at[iA], bt[iA], ct[iA]
    iAc = jnp.clip(jnp.asarray(qp_c), 0, 51)
    alpha_c, beta_c, clip_row_c = at[iAc], bt[iAc], ct[iAc]

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
        sv = jax.lax.dynamic_slice(BSV, (y4o, x4o), (4, 4))
        sh = jax.lax.dynamic_slice(BSH, (y4o, x4o), (4, 4))
        for e in range(4):
            colx = 4 + 4 * e
            S16 = jnp.repeat(sv[:, e], 4)
            cols = [A[4:20, colx + k] for k in (-4, -3, -2, -1, 0, 1, 2, 3)]
            nL2, nL1, nL0, nR0, nR1, nR2 = _edge_luma_full(
                *cols, S16, alpha, beta, clip_row, max_val)
            A = A.at[4:20, colx - 3].set(nL2)
            A = A.at[4:20, colx - 2].set(nL1)
            A = A.at[4:20, colx - 1].set(nL0)
            A = A.at[4:20, colx].set(nR0)
            A = A.at[4:20, colx + 1].set(nR1)
            A = A.at[4:20, colx + 2].set(nR2)
        for e in range(4):
            rowy = 4 + 4 * e
            S16 = jnp.repeat(sh[e, :], 4)
            rows = [A[rowy + k, 4:20] for k in (-4, -3, -2, -1, 0, 1, 2, 3)]
            nL2, nL1, nL0, nR0, nR1, nR2 = _edge_luma_full(
                *rows, S16, alpha, beta, clip_row, max_val)
            A = A.at[rowy - 3, 4:20].set(nL2)
            A = A.at[rowy - 2, 4:20].set(nL1)
            A = A.at[rowy - 1, 4:20].set(nL0)
            A = A.at[rowy, 4:20].set(nR0)
            A = A.at[rowy + 1, 4:20].set(nR1)
            A = A.at[rowy + 2, 4:20].set(nR2)
        Yp = jax.lax.dynamic_update_slice(Yp, A, (y0, x0))

        yc, xc = 8 * r, 8 * c
        for P_, handle in ((Up, 0), (Vp, 1)):
            C = jax.lax.dynamic_slice(P_, (yc, xc), (10, 10))
            for e in range(2):
                colx = 2 + 4 * e
                S8 = jnp.repeat(sv[:, 2 * e], 2)
                cl = [C[2:10, colx + k] for k in (-2, -1, 0, 1)]
                nL0, nR0 = _edge_chroma_full(
                    cl[0], cl[1], cl[2], cl[3], S8, alpha_c, beta_c,
                    clip_row_c, max_val)
                C = C.at[2:10, colx - 1].set(nL0)
                C = C.at[2:10, colx].set(nR0)
            for e in range(2):
                rowy = 2 + 4 * e
                S8 = jnp.repeat(sh[2 * e, :], 2)
                rw = [C[rowy + k, 2:10] for k in (-2, -1, 0, 1)]
                nL0, nR0 = _edge_chroma_full(
                    rw[0], rw[1], rw[2], rw[3], S8, alpha_c, beta_c,
                    clip_row_c, max_val)
                C = C.at[rowy - 1, 2:10].set(nL0)
                C = C.at[rowy, 2:10].set(nR0)
            if handle == 0:
                Up = jax.lax.dynamic_update_slice(Up, C, (yc, xc))
            else:
                Vp = jax.lax.dynamic_update_slice(Vp, C, (yc, xc))
        return (Yp, Up, Vp), None

    (Yp, Up, Vp), _ = jax.lax.scan(mb_step, (Yp, Up, Vp), jnp.arange(n_mb))
    return Yp[4:, 4:], Up[2:, 2:], Vp[2:, 2:]


@jax.jit
def stack_outputs(flats):
    return jnp.stack(flats)


@functools.partial(jax.jit, static_argnames=("n",))
def _stack_padded(flats, n: int):
    return jnp.stack([jnp.pad(f, (0, n - f.shape[0])) for f in flats])


def fetch_group(flats):
    """One stacked d2h transfer for a group of flat device outputs of
    mixed sizes (P vs B rows): the tunnel's per-fetch latency is paid
    once per group.  Returns a (len(flats), max_len) numpy array."""
    n = max(int(f.shape[0]) for f in flats)
    return np.asarray(_stack_padded(tuple(flats), n))


# ---------------------------------------------------------------------------
# B pipeline (temporal direct; lencod/src/mv-search.c:1462 Get_Direct_
# Motion_Vectors temporal branch re-shaped as a batched derivation)
# ---------------------------------------------------------------------------

B_DIRECT_ZERO = 7  # direct prediction with forced-zero residual (B skip)


def _dynfrac_mc(banks, r, mvx, mvy, y0, x0, h: int, w: int):
    """Quarter-pel MC with data-dependent fraction: one window gather +
    16 static fraction variants + select."""
    iy = y0 + (mvy >> 2) + PAD
    ix = x0 + (mvx >> 2) + PAD
    wins = jax.lax.dynamic_slice(banks, (r, 0, iy, ix),
                                 (1, 4, h + 2, w + 2))[0]
    f = (mvy & 3) * 4 + (mvx & 3)
    variants = []
    for frac in range(16):
        t = _QTAB[frac]
        a = wins[t[0], t[1]: t[1] + h, t[2]: t[2] + w]
        b = wins[t[3], t[4]: t[4] + h, t[5]: t[5] + w]
        variants.append((a + b + 1) >> 1)
    return jnp.stack(variants)[f]


def strengths_full_b(nz4, intra4, v0, r0, m0x, m0y, v1, r1, m1x, m1y):
    """Boundary strengths for B frames: two-list reference-picture pairing
    rule (ops/deblock.py _mv_strength; ldecod/src/loopFilter.c)."""
    H4, W4 = nz4.shape
    NONE = jnp.int32(-(10 ** 9))
    rid0 = jnp.where(v0, r0, NONE)
    rid1 = jnp.where(v1, r1, NONE)

    def bs(q, p, mb_edge):
        ei = intra4[q] | intra4[p]
        coef = nz4[q] | nz4[p]
        rq0, rq1 = rid0[q], rid1[q]
        rp0, rp1 = rid0[p], rid1[p]
        straight = (rq0 == rp0) & (rq1 == rp1)
        crossed = (rq0 == rp1) & (rq1 == rp0)

        def diff(ax, ay, bx, by):
            return (jnp.abs(ax[q] - bx[p]) >= 4) | (jnp.abs(ay[q] - by[p]) >= 4)

        d00 = diff(m0x, m0y, m0x, m0y)
        d11 = diff(m1x, m1y, m1x, m1y)
        d01 = diff(m0x, m0y, m1x, m1y)
        d10 = diff(m1x, m1y, m0x, m0y)
        # q-side two distinct refs: check the matching pairing only
        mv_two = jnp.where(rq0 == rp0, d00 | d11, d01 | d10)
        mv_same = (d00 | d11) & (d01 | d10)
        mv_d = jnp.where(rq0 != rq1, mv_two, mv_same)
        inter = jnp.where(coef, 2,
                          jnp.where(straight | crossed,
                                    mv_d.astype(jnp.int32), 1))
        return jnp.where(ei, jnp.where(mb_edge, 4, 3), inter)

    colv = (jnp.arange(1, W4) % 4 == 0)[None, :]
    BSV = jnp.zeros((H4, W4), jnp.int32)
    BSV = BSV.at[:, 1:].set(bs(
        (slice(None), slice(1, None)), (slice(None), slice(0, W4 - 1)), colv))
    rowh = (jnp.arange(1, H4) % 4 == 0)[:, None]
    BSH = jnp.zeros((H4, W4), jnp.int32)
    BSH = BSH.at[1:, :].set(bs(
        (slice(1, None), slice(None)), (slice(0, H4 - 1), slice(None)), rowh))
    return BSV, BSH


@functools.partial(jax.jit, static_argnames=("H", "W", "R", "make_ref"))
def rd_b_pipeline(cur_y8, cur_u8, cur_v8, banks0, cpads0, banks1, cpads1,
                  col_intra4, col_ref4, col_mvx4, col_mvy4,
                  pocs0, dsf_tab, eq_tab, poc1,
                  H: int, W: int, R: int, qp: int, qp_c: int,
                  lam: int, lam_me: int, nref0=None,
                  make_ref: bool = False):
    """Whole-frame RD B encode (non-reference, temporal direct).

    banks0/cpads0: stacked list-0 (past anchor) refs; banks1/cpads1: the
    list-1 anchor (leading dim 1).  col_*: per-4x4 final list-0 motion of
    the list-1 anchor (its rd_p_pipeline `col` output).  pocs0 (NR0,):
    POCs of list0; dsf_tab (NR0,): DistScaleFactor per list0 ref;
    eq_tab (NR0,) bool: poc0 == poc1 (unscaled direct).  All device
    arrays, so GOP-varying POCs never recompile."""
    cur_y = cur_y8.astype(jnp.int32)
    cur_u = cur_u8.astype(jnp.int32)
    cur_v = cur_v8.astype(jnp.int32)
    NR0 = banks0.shape[0]
    n_my, n_mx = H // 16, W // 16
    n_mb = n_my * n_mx
    D = 2 * R + 1
    nby, nbx = H // 8, W // 8
    n_b8 = nby * nbx
    cur8 = (cur_y.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
            .reshape(n_b8, 8, 8))
    cur2 = (cur8 * cur8).sum((-1, -2))
    b8_ys = (jnp.arange(n_b8) // nbx) * 8
    b8_xs = (jnp.arange(n_b8) % nbx) * 8
    Wn = 2 * R + 8

    def block_ssd(ref_pad, bi):
        y0, x0 = b8_ys[bi], b8_xs[bi]
        win = jax.lax.dynamic_slice(
            ref_pad, (y0 - R + PAD, x0 - R + PAD), (Wn, Wn))
        cross = jnp.zeros((D, D), jnp.int32)
        cb = cur8[bi]
        for i in range(8):
            for j in range(8):
                cross = cross + cb[i, j] * jax.lax.dynamic_slice(
                    win, (i, j), (D, D))
        w2 = win * win
        vc = jnp.cumsum(jnp.pad(w2, ((1, 0), (0, 0))), axis=0)
        vbox = vc[8:] - vc[:-8]
        hc = jnp.cumsum(jnp.pad(vbox, ((0, 0), (1, 0))), axis=1)
        r2 = hc[:, 8:] - hc[:, :-8]
        return r2 - 2 * cross + cur2[bi]

    def ssd8_of(banks):
        nr = banks.shape[0]
        s8 = jax.vmap(
            lambda r: jax.vmap(lambda b: block_ssd(banks[r, 0], b))(
                jnp.arange(n_b8))
        )(jnp.arange(nr))
        return s8.reshape(nr, n_my, 2, n_mx, 2, D, D)

    s8_0 = ssd8_of(banks0)
    s8_1 = ssd8_of(banks1)
    g0 = s8_0.sum((2, 4))
    g1 = s8_1.sum((2, 4))
    # half-partition grids (16x8 / 8x16), both lists
    h168_0 = s8_0.sum(4).transpose(0, 1, 3, 2, 4, 5)  # (nr,my,mx,half,D,D)
    h168_1 = s8_1.sum(4).transpose(0, 1, 3, 2, 4, 5)
    h816_0 = s8_0.sum(2)
    h816_1 = s8_1.sum(2)

    # PMV field from list0 best (zero-biased)
    dgrid = jnp.arange(-R, R + 1) * 4
    zb = _mv_bits(dgrid)[None, :] + _mv_bits(dgrid)[:, None]
    c0 = g0[0] + _lam_cost(lam_me, zb)
    bi0 = jnp.argmin(c0.reshape(n_my, n_mx, -1), axis=-1)
    pm_x = (bi0 % D - R) * 4
    pm_y = (bi0 // D - R) * 4

    def med_neighbors(f):
        a = jnp.pad(f, ((0, 0), (1, 0)))[:, :-1]
        b = jnp.pad(f, ((1, 0), (0, 0)))[:-1, :]
        c = jnp.pad(f, ((1, 0), (0, 1)))[:-1, 1:]
        return _med3(a, b, c)

    pmvx = med_neighbors(pm_x)
    pmvy = med_neighbors(pm_y)
    bits_x = _mv_bits(dgrid[None, None, :] - pmvx[..., None])
    bits_y = _mv_bits(dgrid[None, None, :] - pmvy[..., None])
    mvbits = bits_x[:, :, None, :] + bits_y[:, :, :, None]

    if nref0 is None:
        nref0 = jnp.int32(NR0)

    def argmin16(grids, nref=None):
        nr = grids.shape[0]
        rb = jnp.asarray(np.array(
            [1 if r == 0 else 2 * int(r + 1).bit_length() - 1
             for r in range(nr)], np.int32))
        if nref is None:  # fixed single-entry list (list 1)
            rb = rb * 0 if nr == 1 else rb
            pen = jnp.zeros((nr,), jnp.int32)
        else:
            rb = jnp.where(nref <= 1, 0, rb)
            pen = jnp.where(jnp.arange(nr) >= nref, jnp.int32(1 << 29), 0)
        cost = grids + _lam_cost(lam_me, mvbits)[None]
        cost = cost + (_lam_cost(lam_me, rb) + pen)[
            :, None, None, None, None]
        flat = cost.reshape(nr, n_my, n_mx, -1)
        per_ref = jnp.min(flat, axis=-1)
        per_ref_i = jnp.argmin(flat, axis=-1)
        ref = jnp.argmin(per_ref, axis=0)
        idx = jnp.take_along_axis(per_ref_i, ref[None], axis=0)[0]
        return (ref.astype(jnp.int32),
                (idx % D - R).astype(jnp.int32),
                (idx // D - R).astype(jnp.int32))

    a0 = argmin16(g0, nref0)
    a1 = argmin16(g1)
    # second-pass PMV from the chosen list-0 integer field (prices the
    # sub-pel refinement and the final MV rate closer to the decoder's
    # median chain)
    pmvx = med_neighbors(a0[1] * 4)
    pmvy = med_neighbors(a0[2] * 4)

    mb_ys = (jnp.arange(n_mb) // n_mx) * 16
    mb_xs = (jnp.arange(n_mb) % n_mx) * 16
    pmvx_f = pmvx.reshape(-1)
    pmvy_f = pmvy.reshape(-1)
    offs = jnp.asarray(_REFINE)

    lam_satd = jnp.sqrt(
        jnp.asarray(lam_me, jnp.float32) * 65536.0).astype(jnp.int32)

    def refine_u(banks, ref, imvx, imvy, i, oy: int, ox: int,
                 h: int, w: int):
        """49-point quarter-pel refine of the (h, w) unit at MB i +
        (oy, ox); returns (mvx, mvy, pred, cost)."""
        y0, x0 = mb_ys[i] + oy, mb_xs[i] + ox
        orig = jax.lax.dynamic_slice(cur_y, (y0, x0), (h, w))
        iy = y0 + imvy + PAD - 1
        ix = x0 + imvx + PAD - 1
        wins = jax.lax.dynamic_slice(
            banks, (ref, 0, iy, ix), (1, 4, h + 3, w + 3))[0]
        preds, costs = [], []
        for (oxq, oyq) in _REFINE:
            dx, dy = int(oxq) & 3, int(oyq) & 3
            sx, sy = (int(oxq) >> 2) + 1, (int(oyq) >> 2) + 1
            t = _QTAB[dy * 4 + dx]
            a = wins[t[0], sy + t[1]: sy + t[1] + h,
                     sx + t[2]: sx + t[2] + w]
            b = wins[t[3], sy + t[4]: sy + t[4] + h,
                     sx + t[5]: sx + t[5] + w]
            pred = (a + b + 1) >> 1
            d = orig - pred
            rate = _mv_bits(imvx * 4 + oxq - pmvx_f[i]) + _mv_bits(
                imvy * 4 + oyq - pmvy_f[i])
            preds.append(pred)
            costs.append(_satd(d) + _lam_cost(lam_satd, rate))
        k = jnp.argmin(jnp.stack(costs))
        return (imvx * 4 + offs[k, 0], imvy * 4 + offs[k, 1],
                jnp.stack(preds)[k], jnp.stack(costs)[k])

    def refine_list(banks, am, oy=0, ox=0, h=16, w=16):
        ref, ix, iy = am
        f = jax.vmap(lambda i: refine_u(
            banks, ref.reshape(-1)[i], ix.reshape(-1)[i],
            iy.reshape(-1)[i], i, oy, ox, h, w))
        return (ref.reshape(-1),) + tuple(f(jnp.arange(n_mb)))

    ref0, mv0x, mv0y, pred0, cost0 = refine_list(banks0, a0)
    ref1, mv1x, mv1y, pred1, cost1 = refine_list(banks1, a1)

    # ---- half-partition candidates (16x8 / 8x16, per-half pdir) ---------
    # (the B partition modes of mode_decision.c; mb_type covers every
    # (pdir_top/left, pdir_bot/right) combination — mbtables.B_PDIR_*)
    rbits0 = jnp.asarray(np.array(
        [1 if r == 0 else 2 * int(r + 1).bit_length() - 1
         for r in range(NR0)], np.int32))
    rbits0 = jnp.where(nref0 <= 1, 0, rbits0)

    def half_set(g0h, g1h, oy, ox, h, w):
        """One half geometry: L0/L1 argmin+refine, then per-half best of
        {L0, L1, BI}; returns dict of per-MB fields."""
        a0h = argmin16(g0h, nref0)
        a1h = argmin16(g1h)
        r0, x0, y0, p0, c0 = refine_list(banks0, a0h, oy, ox, h, w)
        r1, x1, y1, p1, c1 = refine_list(banks1, a1h, oy, ox, h, w)
        pbi = (p0 + p1 + 1) >> 1
        oh = jax.vmap(lambda i: jax.lax.dynamic_slice(
            cur_y, (mb_ys[i] + oy, mb_xs[i] + ox), (h, w)))(
            jnp.arange(n_mb))
        mvb0h = _mv_bits(x0 - pmvx_f) + _mv_bits(y0 - pmvy_f)
        mvb1h = _mv_bits(x1 - pmvx_f) + _mv_bits(y1 - pmvy_f)
        cbi = jax.vmap(_satd)(oh - pbi) + _lam_cost(
            lam_satd, mvb0h + mvb1h + rbits0[r0])
        costs = jnp.stack([c0 + _lam_cost(lam_satd, rbits0[r0]), c1, cbi])
        pd = jnp.argmin(costs, axis=0).astype(jnp.int32)  # 0 L0/1 L1/2 BI
        pred = jnp.where((pd == 0)[:, None, None], p0,
                         jnp.where((pd == 1)[:, None, None], p1, pbi))
        # header-rate contribution of this half (ref + mvds by pdir)
        hbits = jnp.where(pd == 0, rbits0[r0] + mvb0h,
                          jnp.where(pd == 1, mvb1h,
                                    rbits0[r0] + mvb0h + mvb1h))
        return dict(pd=pd, pred=pred, r0=r0, x0=x0, y0=y0,
                    x1=x1, y1=y1, bits=hbits)

    h168 = [half_set(h168_0[:, :, :, hf], h168_1[:, :, :, hf],
                     8 * hf, 0, 8, 16) for hf in range(2)]
    h816 = [half_set(h816_0[:, :, :, hf], h816_1[:, :, :, hf],
                     0, 8 * hf, 16, 8) for hf in range(2)]
    pred_168 = jnp.concatenate([h168[0]["pred"], h168[1]["pred"]], axis=1)
    pred_816 = jnp.concatenate([h816[0]["pred"], h816[1]["pred"]], axis=2)

    def b8_set(b8, pred_dir_all):
        """One 8x8 unit of the B P8x8 candidate: best of {direct 8x8,
        L0 8x8, L1 8x8, BI 8x8} (SUB_MB_B sub-types; JM evaluates the
        same set per unit in submacroblock_mode_decision for B)."""
        by, bx = b8 >> 1, b8 & 1
        a0u = argmin16(s8_0[:, :, by, :, bx], nref0)
        a1u = argmin16(s8_1[:, :, by, :, bx])
        r0, x0, y0, p0, c0 = refine_list(banks0, a0u, 8 * by, 8 * bx, 8, 8)
        r1, x1, y1, p1, c1 = refine_list(banks1, a1u, 8 * by, 8 * bx, 8, 8)
        pbi = (p0 + p1 + 1) >> 1
        pdir_u = pred_dir_all[:, 8 * by: 8 * by + 8, 8 * bx: 8 * bx + 8]
        ou = jax.vmap(lambda i: jax.lax.dynamic_slice(
            cur_y, (mb_ys[i] + 8 * by, mb_xs[i] + 8 * bx), (8, 8)))(
            jnp.arange(n_mb))
        mvb0u = _mv_bits(x0 - pmvx_f) + _mv_bits(y0 - pmvy_f)
        mvb1u = _mv_bits(x1 - pmvx_f) + _mv_bits(y1 - pmvy_f)
        cdir = jax.vmap(_satd)(ou - pdir_u) + _lam_cost(
            lam_satd, jnp.int32(1))
        if make_ref:
            cdir = cdir + jnp.int32(1 << 29)  # stored Bs: no direct
        cL0 = c0 + _lam_cost(lam_satd, rbits0[r0] + 3)
        cL1 = c1 + _lam_cost(lam_satd, jnp.int32(3))
        cbi = jax.vmap(_satd)(ou - pbi) + _lam_cost(
            lam_satd, mvb0u + mvb1u + rbits0[r0] + 3)
        costs = jnp.stack([cdir, cL0, cL1, cbi])
        k = jnp.argmin(costs, axis=0).astype(jnp.int32)  # 0 dir/1 L0/2 L1/3 BI
        pred = jnp.where((k == 0)[:, None, None], pdir_u,
                         jnp.where((k == 1)[:, None, None], p0,
                                   jnp.where((k == 2)[:, None, None],
                                             p1, pbi)))
        bits = jnp.where(
            k == 0, 1,
            jnp.where(k == 1, 3 + rbits0[r0] + mvb0u,
                      jnp.where(k == 2, 3 + mvb1u,
                                3 + rbits0[r0] + mvb0u + mvb1u)))
        return dict(k=k, pred=pred, r0=r0, x0=x0, y0=y0, x1=x1, y1=y1,
                    bits=bits)

    # ---- temporal direct derivation per 8x8 (spec §8.4.1.2.3) -----------
    b8oy = (0, 0, 8, 8)
    b8ox = (0, 8, 0, 8)
    # corner 4x4 per quadrant (direct_8x8_inference)
    cidx = jnp.arange(n_mb)
    y4o = (cidx // n_mx) * 4
    x4o = (cidx % n_mx) * 4

    def direct_b8(i, b8):
        cy = 0 if b8oy[b8] == 0 else 3
        cx = 0 if b8ox[b8] == 0 else 3
        ry = y4o[i] + cy
        rx = x4o[i] + cx
        col_i = col_intra4[ry, rx]
        rid = col_ref4[ry, rx]
        mcx = jnp.where(col_i, 0, col_mvx4[ry, rx])
        mcy = jnp.where(col_i, 0, col_mvy4[ry, rx])
        idx = jnp.where(col_i, 0, rid).astype(jnp.int32)
        dsf = dsf_tab[idx]
        eq = eq_tab[idx] | col_i
        l0x = jnp.where(eq, mcx, (dsf * mcx + 128) >> 8)
        l0y = jnp.where(eq, mcy, (dsf * mcy + 128) >> 8)
        l1x = jnp.where(eq, 0, l0x - mcx)
        l1y = jnp.where(eq, 0, l0y - mcy)
        return idx, l0x, l0y, l1x, l1y

    def direct_mb(i):
        parts = [direct_b8(i, b8) for b8 in range(4)]
        idx = jnp.stack([p[0] for p in parts])
        l0x = jnp.stack([p[1] for p in parts])
        l0y = jnp.stack([p[2] for p in parts])
        l1x = jnp.stack([p[3] for p in parts])
        l1y = jnp.stack([p[4] for p in parts])
        blocks = []
        for b8 in range(4):
            p0 = _dynfrac_mc(banks0, idx[b8], l0x[b8], l0y[b8],
                             mb_ys[i] + b8oy[b8], mb_xs[i] + b8ox[b8], 8, 8)
            p1 = _dynfrac_mc(banks1, jnp.int32(0), l1x[b8], l1y[b8],
                             mb_ys[i] + b8oy[b8], mb_xs[i] + b8ox[b8], 8, 8)
            blocks.append((p0 + p1 + 1) >> 1)
        top = jnp.concatenate(blocks[:2], axis=1)
        bot = jnp.concatenate(blocks[2:], axis=1)
        return jnp.concatenate([top, bot], axis=0), idx, l0x, l0y, l1x, l1y

    (pred_dir, dir_idx, dir_l0x, dir_l0y, dir_l1x, dir_l1y) = jax.vmap(
        direct_mb)(jnp.arange(n_mb))

    # B P8x8 candidate: per-unit best sub-mode, assembled
    bu = [b8_set(b8, pred_dir) for b8 in range(4)]
    pred_p8 = (jnp.stack([u["pred"] for u in bu], 1)
               .reshape(n_mb, 2, 2, 8, 8).transpose(0, 1, 3, 2, 4)
               .reshape(n_mb, 16, 16))
    p8_bits = sum(u["bits"] for u in bu)

    pred_bi = (pred0 + pred1 + 1) >> 1
    orig_mb = (cur_y.reshape(n_my, 16, n_mx, 16).transpose(0, 2, 1, 3)
               .reshape(n_mb, 16, 16))
    # L0-at-PMV candidate (see the P pipeline's C_P16PMV): 16x16 list-0
    # prediction at the median-PMV chain, mvd ~ 0
    pred_pm = jax.vmap(lambda i: _dynfrac_mc(
        banks0, jnp.int32(0), pmvx_f[i], pmvy_f[i],
        mb_ys[i], mb_xs[i], 16, 16))(jnp.arange(n_mb))
    preds = jnp.stack(
        [pred_dir, pred0, pred1, pred_bi, pred_pm,
         pred_168, pred_816, pred_p8])  # cands 0..7

    off_inter = jnp.int32(Q.default_offset4(qp, False))

    def tq_recon(pred, orig):
        res = orig - pred
        blk = res.reshape(*res.shape[:-2], 4, 4, 4, 4).swapaxes(-3, -2)
        co = TR.forward4x4(blk)
        lev = Q.quant4x4(co, qp, off_inter)
        lev = _rdoq4(blk, lev, qp, lam)
        deq = Q.dequant4x4(lev, qp)
        rr = TR.inverse4x4(deq.astype(jnp.int32))
        pb = pred.reshape(*pred.shape[:-2], 4, 4, 4, 4).swapaxes(-3, -2)
        rec_b = ((rr + (pb << 6) + 32) >> 6).clip(0, 255)
        rec = rec_b.swapaxes(-3, -2).reshape(*pred.shape)
        return _threshold_inter_luma(lev, rec, pred, orig)

    lev_i, rec_i, D_i, cb_i = tq_recon(preds, orig_mb[None])
    # rates: mb_type ue + mvd (+ te ref for list0 when NR0 > 1)
    mvb0 = _mv_bits(mv0x - pmvx_f) + _mv_bits(mv0y - pmvy_f)
    mvb1 = _mv_bits(mv1x - pmvx_f) + _mv_bits(mv1y - pmvy_f)
    refb0 = jnp.where(jnp.int32(NR0 > 1),
                      jnp.where(ref0 == 0, 1, 2 * _bitlen(ref0 + 1) - 1), 0)
    refb_pm = jnp.where(jnp.int32(NR0 > 1), 1, 0)
    R_c = jnp.stack([
        jnp.full((n_mb,), 1, jnp.int32),
        3 + mvb0 + refb0,
        3 + mvb1,
        5 + mvb0 + refb0 + mvb1,
        jnp.full((n_mb,), 5, jnp.int32) + refb_pm,
        7 + h168[0]["bits"] + h168[1]["bits"],
        7 + h816[0]["bits"] + h816[1]["bits"],
        9 + p8_bits,
    ])
    J_inter = D_i + _lam_cost(lam, R_c + (cb_i * _COEF_RSCALE) // 100)
    # direct-zero (B skip) candidate
    rec_dz = pred_dir.clip(0, 255)
    ddz = orig_mb - rec_dz
    J_dz = (ddz * ddz).sum((-1, -2))

    # I16
    up_rows = jnp.pad(cur_y, ((1, 0), (0, 0)))[:-1]
    up_mb = up_rows[::16][:n_my].reshape(n_my, n_mx, 16)
    left_cols = jnp.pad(cur_y, ((0, 0), (1, 0)))[:, :-1]
    left_mb = (left_cols[:, ::16][:, :n_mx].reshape(n_my, 16, n_mx)
               .transpose(0, 2, 1))
    ul = jnp.pad(cur_y, ((1, 0), (1, 0)))[:-1, :-1][::16, ::16]
    col = jnp.arange(n_mx)[None, :].repeat(n_my, 0)
    row = jnp.arange(n_my)[:, None].repeat(n_mx, 1)
    au = (row > 0).reshape(-1)
    al = (col > 0).reshape(-1)
    i16p, i16m, _ = _i16_pred_all(up_mb.reshape(n_mb, 16),
                                  left_mb.reshape(n_mb, 16),
                                  ul.reshape(n_mb), au, al, orig_mb)
    lev16, dc16, rec16, D_16, cb16 = _i16_tq(i16p, orig_mb, qp)
    J_i16 = D_16 + _lam_cost(lam, ((cb16 + 11) * _INTRA_RSCALE) // 100)
    if _NO_INTERINTRA:
        J_i16 = J_i16 + jnp.int32(1 << 29)

    # winner order: [DIRECT, L0, L1, BI, L0@PMV, 16x8, 8x16, P8x8,
    #                I16, DZ]
    J_all = jnp.concatenate([J_inter, J_i16[None], J_dz[None]], 0)
    if _NO_BHALF:
        BIGJ = jnp.int32(1 << 29)
        J_all = J_all.at[5].set(BIGJ).at[6].set(BIGJ).at[7].set(BIGJ)
    if make_ref:
        # stored-reference Bs never use direct modes: their motion must
        # stay mappable into the leaf Bs' lists for temporal direct, so
        # it may only reference this picture's own (prefix) lists
        BIGJ = jnp.int32(1 << 29)
        J_all = J_all.at[0].set(BIGJ).at[9].set(BIGJ)
    win6 = jnp.argmin(J_all, axis=0).astype(jnp.int32)
    is_pm = win6 == 4
    win = jnp.where(win6 == 9, B_DIRECT_ZERO,
                    jnp.where(win6 == 8, B_I16,
                              jnp.where(win6 == 7, B_P8X8,
                                        jnp.where(is_pm, B_L0, win6))))
    # the PMV winner is a plain L0 16x16 with mv = PMV, ref 0
    ref0 = jnp.where(is_pm, 0, ref0)
    mv0x = jnp.where(is_pm, pmvx_f, mv0x)
    mv0y = jnp.where(is_pm, pmvy_f, mv0y)
    is_intra = win == B_I16
    is_dz = win == B_DIRECT_ZERO
    win_i = jnp.where(is_dz, 0, jnp.minimum(win6, 7))
    take = lambda arr, w: jnp.take_along_axis(
        arr, w.reshape((1, n_mb) + (1,) * (arr.ndim - 2)), axis=0)[0]
    w_lev = take(lev_i, win_i)
    w_lev = jnp.where(is_dz[:, None, None, None, None], 0, w_lev)
    w_rec = take(rec_i, win_i)
    w_rec = jnp.where(is_dz[:, None, None], rec_dz, w_rec)

    # per-8x8 (unit) pdir + two-list winner motion.  Units of half
    # winners inherit their half's fields; 16x8 top = units {0,1},
    # 8x16 left = units {0,2}.
    is_h168 = win == B_L0_16x8
    is_h816 = win == B_L0_8x16
    hsel_168 = jnp.asarray([0, 0, 1, 1])   # unit -> 16x8 half
    hsel_816 = jnp.asarray([0, 1, 0, 1])   # unit -> 8x16 half

    def half_field(key):
        a168 = jnp.stack([h168[0][key], h168[1][key]], 1)[:, hsel_168]
        a816 = jnp.stack([h816[0][key], h816[1][key]], 1)[:, hsel_816]
        return a168, a816  # (n_mb, 4) each

    pd168, pd816 = half_field("pd")
    r0168, r0816 = half_field("r0")
    x0168, x0816 = half_field("x0")
    y0168, y0816 = half_field("y0")
    x1168, x1816 = half_field("x1")
    y1168, y1816 = half_field("y1")
    is_p8 = win == B_P8X8
    ku = jnp.stack([u["k"] for u in bu], 1)  # (n_mb, 4) 0dir/1L0/2L1/3BI
    # per-unit pdir: 0 L0 / 1 L1 / 2 BI / 3 per-unit direct (P8x8 only);
    # 16x16 direct + DZ ride BI; intra -1 applied on the host
    pd16 = jnp.where(win == B_L0, 0, jnp.where(win == B_L1, 1, 2))
    pd_p8 = jnp.where(ku == 0, 3, ku - 1)
    pdir8 = jnp.where(is_h168[:, None], pd168,
                      jnp.where(is_h816[:, None], pd816,
                                jnp.where(is_p8[:, None], pd_p8,
                                          pd16[:, None])))

    use0 = ((win == B_DIRECT) | (win == B_L0) | (win == B_BI)
            | is_dz)
    use1 = ((win == B_DIRECT) | (win == B_L1) | (win == B_BI)
            | is_dz)
    isdir = (win == B_DIRECT) | is_dz
    ishalf = is_h168 | is_h816
    hr0 = jnp.where(is_h168[:, None], r0168, r0816)
    hx0 = jnp.where(is_h168[:, None], x0168, x0816)
    hy0 = jnp.where(is_h168[:, None], y0168, y0816)
    hx1 = jnp.where(is_h168[:, None], x1168, x1816)
    hy1 = jnp.where(is_h168[:, None], y1168, y1816)
    # P8x8 units: explicit sub-mode fields, or the unit's direct motion
    pdir_u = ku == 0
    hr0 = jnp.where(is_p8[:, None],
                    jnp.where(pdir_u, dir_idx,
                              jnp.stack([u["r0"] for u in bu], 1)), hr0)
    hx0 = jnp.where(is_p8[:, None],
                    jnp.where(pdir_u, dir_l0x,
                              jnp.stack([u["x0"] for u in bu], 1)), hx0)
    hy0 = jnp.where(is_p8[:, None],
                    jnp.where(pdir_u, dir_l0y,
                              jnp.stack([u["y0"] for u in bu], 1)), hy0)
    hx1 = jnp.where(is_p8[:, None],
                    jnp.where(pdir_u, dir_l1x,
                              jnp.stack([u["x1"] for u in bu], 1)), hx1)
    hy1 = jnp.where(is_p8[:, None],
                    jnp.where(pdir_u, dir_l1y,
                              jnp.stack([u["y1"] for u in bu], 1)), hy1)
    ishalf8 = ishalf | is_p8
    hu0 = ishalf8[:, None] & ((pdir8 == 0) | (pdir8 >= 2))
    hu1 = ishalf8[:, None] & (pdir8 >= 1)
    w_idx0 = jnp.where(isdir[:, None], dir_idx,
                       jnp.where(hu0, hr0,
                                 jnp.where(use0[:, None], ref0[:, None], 0)))
    w_m0x = jnp.where(isdir[:, None], dir_l0x,
                      jnp.where(hu0, hx0,
                                jnp.where(use0[:, None], mv0x[:, None], 0)))
    w_m0y = jnp.where(isdir[:, None], dir_l0y,
                      jnp.where(hu0, hy0,
                                jnp.where(use0[:, None], mv0y[:, None], 0)))
    w_m1x = jnp.where(isdir[:, None], dir_l1x,
                      jnp.where(hu1, hx1,
                                jnp.where(use1[:, None], mv1x[:, None], 0)))
    w_m1y = jnp.where(isdir[:, None], dir_l1y,
                      jnp.where(hu1, hy1,
                                jnp.where(use1[:, None], mv1y[:, None], 0)))
    u0_8 = (jnp.repeat(use0[:, None], 4, 1) | hu0) & ~is_intra[:, None]
    u1_8 = (jnp.repeat(use1[:, None], 4, 1) | hu1) & ~is_intra[:, None]

    # ---- chroma ---------------------------------------------------------
    def chroma_pred_mb(i):
        blocks = []
        for b8 in range(4):
            yc = (mb_ys[i] >> 1) + (b8oy[b8] >> 1)
            xc = (mb_xs[i] >> 1) + (b8ox[b8] >> 1)
            c0p = _mc_chroma_unit(cpads0, w_idx0[i, b8], w_m0x[i, b8],
                                  w_m0y[i, b8], yc, xc, 4, 4)
            c1p = _mc_chroma_unit(cpads1, jnp.int32(0), w_m1x[i, b8],
                                  w_m1y[i, b8], yc, xc, 4, 4)
            both = u0_8[i, b8] & u1_8[i, b8]
            c = jnp.where(both, (c0p + c1p + 1) >> 1,
                          jnp.where(u0_8[i, b8], c0p, c1p))
            blocks.append(c)
        top = jnp.concatenate(blocks[:2], axis=2)
        bot = jnp.concatenate(blocks[2:], axis=2)
        return jnp.concatenate([top, bot], axis=1)

    pred_c_mb = jax.vmap(chroma_pred_mb)(jnp.arange(n_mb))
    orig_c = jnp.stack([cur_u, cur_v]).reshape(
        2, n_my, 8, n_mx, 8).transpose(1, 3, 0, 2, 4).reshape(n_mb, 2, 8, 8)
    levc, dcc, recc, _ = _chroma_tq(pred_c_mb, orig_c, qp_c, intra=False,
                                lam=lam)
    levc = jnp.where(is_dz[:, None, None, None, None, None], 0, levc)
    dcc = jnp.where(is_dz[:, None, None, None], 0, dcc)
    recc = jnp.where(is_dz[:, None, None, None],
                     pred_c_mb.clip(0, 255), recc)

    # ---- intra commit + deblock ------------------------------------------
    (rec_y, rec_u, rec_v, w_lev, lum_dc, i16mode, cip,
     levc, dcc, i4flag, ipm) = _intra_commit_scan(
        cur_y, cur_u, cur_v, w_rec, recc, is_intra, w_lev,
        levc, dcc, H, W, qp, qp_c, lam=lam)
    win = jnp.where(i4flag == 1, jnp.int32(B_I4), win)

    nz4 = (w_lev != 0).any((-1, -2))
    nz4 = nz4 | (is_intra[:, None, None] & (lum_dc != 0).any(
        (-1, -2))[:, None, None])
    nz4_pic = (nz4.reshape(n_my, n_mx, 4, 4).transpose(0, 2, 1, 3)
               .reshape(4 * n_my, 4 * n_mx))

    def to4(a8):
        p = (a8.reshape(n_my, n_mx, 2, 2).transpose(0, 2, 1, 3)
             .reshape(2 * n_my, 2 * n_mx))
        return jnp.repeat(jnp.repeat(p, 2, 0), 2, 1)

    intra4 = jnp.repeat(jnp.repeat(is_intra.reshape(n_my, n_mx), 4, 0), 4, 1)
    v0_4 = to4(u0_8) & ~intra4
    v1_4 = to4(u1_8) & ~intra4
    r0_4 = pocs0[jnp.clip(to4(w_idx0), 0, NR0 - 1)]
    r1_4 = jnp.broadcast_to(poc1, r0_4.shape)
    BSV, BSH = strengths_full_b(
        nz4_pic, intra4, v0_4, r0_4, to4(w_m0x), to4(w_m0y),
        v1_4, r1_4, to4(w_m1x), to4(w_m1y))
    dy_, du_, dv_ = deblock_device_full(
        rec_y, rec_u, rec_v, BSV, BSH, qp, qp_c)

    host_out = jnp.concatenate([
        win.reshape(-1), pdir8.reshape(-1), w_idx0.reshape(-1),
        w_m0x.reshape(-1), w_m0y.reshape(-1),
        w_m1x.reshape(-1), w_m1y.reshape(-1),
        i16mode.reshape(-1), cip.reshape(-1),
        w_lev.reshape(-1), lum_dc.reshape(-1),
        levc.reshape(-1), dcc.reshape(-1),
        ipm.reshape(-1),
    ])
    if not make_ref:
        return host_out, (dy_, du_, dv_)
    # reference entry for hierarchical GOPs (B used as reference,
    # lencod/src/explicit_gop.c:32 create_hierarchy): plane bank + a
    # colocated-motion snapshot in decoder L0-else-L1 fallback form.
    # col_ref encodes the L0 index, or NR0 (sentinel) for L1-only blocks
    # (the host maps it to the list-1 anchor's POC).
    Ypad2 = jnp.pad(dy_, PAD, mode="edge")
    new_bank = _bank_from_pad(Ypad2)
    new_cpad = jnp.stack([
        jnp.pad(du_, PAD, mode="edge"), jnp.pad(dv_, PAD, mode="edge")])
    c_intra = intra4 | (~(v0_4 | v1_4))
    c_ref = jnp.where(v0_4, to4(w_idx0), jnp.int32(NR0))
    c_mvx = jnp.where(v0_4, to4(w_m0x), to4(w_m1x))
    c_mvy = jnp.where(v0_4, to4(w_m0y), to4(w_m1y))
    col_out = (c_intra, c_ref, c_mvx, c_mvy)
    return host_out, (dy_, du_, dv_), (new_bank, new_cpad, col_out)


# ---------------------------------------------------------------------------
# Tile-row parallel P encode: row groups as independent slices
# (SURVEY.md §2.3 "tile-rows within frame across chips with halo exchange").
#
# Each group of MB rows is coded as its own slice with
# disable_deblocking_filter_idc=2 (no filtering across slice edges), which
# makes groups fully independent given the reference planes: intra
# prediction, PMV/skip and deblocking all stop at the slice boundary by
# construction when the group is encoded as a standalone sub-frame.  The
# reference "halo" is the PAD-row margin of the plane bank (search range +
# interpolation taps), so each group consumes only its slab of the bank.
# ---------------------------------------------------------------------------

def _row_slabs(banks, cpads, H: int, G: int):
    """Per-group reference slabs: rows [g*Hg, g*Hg + Hg + 2*PAD) of the
    padded planes — the tile-row halo."""
    Hg = H // G
    slabs = jnp.stack([
        banks[:, :, g * Hg : g * Hg + Hg + 2 * PAD, :] for g in range(G)
    ])
    cslabs = jnp.stack([
        cpads[:, :, g * (Hg // 2) : g * (Hg // 2) + Hg // 2 + 2 * PAD, :]
        for g in range(G)
    ])
    return slabs, cslabs


@functools.partial(jax.jit, static_argnames=("H", "W", "R", "G"))
def rd_p_rows_pipeline(cur_y8, cur_u8, cur_v8, banks, cpads,
                       H: int, W: int, R: int, qp, qp_c,
                       lam, lam_me, G: int, nref=None):
    """G row-group slices of one P frame, each through the full RD
    pipeline on its reference slab; recon and the next reference entry are
    reassembled full-frame.  Output host buffers are per group.

    qp/qp_c/lam/lam_me may be scalars or (G,) vectors — a per-group QP
    is the tile-row basic unit of rate control (rc_quadratic.c:2399
    rc_handle_mb restructured for batch execution)."""
    Hg = H // G
    subY = cur_y8.reshape(G, Hg, W)
    subU = cur_u8.reshape(G, Hg // 2, W // 2)
    subV = cur_v8.reshape(G, Hg // 2, W // 2)
    slabs, cslabs = _row_slabs(banks, cpads, H, G)
    qp_v = jnp.broadcast_to(jnp.asarray(qp, jnp.int32), (G,))
    qpc_v = jnp.broadcast_to(jnp.asarray(qp_c, jnp.int32), (G,))
    lam_v = jnp.broadcast_to(jnp.asarray(lam, jnp.int32), (G,))
    lme_v = jnp.broadcast_to(jnp.asarray(lam_me, jnp.int32), (G,))

    outs = jax.vmap(
        lambda cy, cu, cv, bk, cp, q, qc, lm, lme: rd_p_pipeline(
            cy, cu, cv, bk, cp, H=Hg, W=W, R=R, qp=q, qp_c=qc,
            lam=lm, lam_me=lme, nref=nref)
    )(subY, subU, subV, slabs, cslabs, qp_v, qpc_v, lam_v, lme_v)
    host_outs, recons, entries = outs
    Yf = recons[0].reshape(H, W)
    Uf = recons[1].reshape(H // 2, W // 2)
    Vf = recons[2].reshape(H // 2, W // 2)
    # full-frame next-ref entry (half-pel planes must span group edges)
    Ypad = jnp.pad(Yf, PAD, mode="edge")
    new_bank = _bank_from_pad(Ypad)
    new_cpad = jnp.stack([
        jnp.pad(Uf, PAD, mode="edge"), jnp.pad(Vf, PAD, mode="edge")])
    col = tuple(c.reshape(-1, c.shape[-1]) for c in entries[2])
    return host_outs, (Yf, Uf, Vf), (new_bank, new_cpad, col)


def rd_gop_rows_sharded(mesh, S: int, H: int, W: int, R: int, qp: int,
                        qp_c: int, lam: int):
    """Chained-GOP tile-row encoder over a (frame, row) mesh.

    The real multi-chip shape (SURVEY.md §2.3): the `frame` axis shards
    INDEPENDENT closed GOPs (the legal frame-level parallelism unit —
    lencod/src/lencod.c:299 idr_period); within each GOP the P-frame
    reference chain runs as an on-device lax.scan over S frames (no host
    round trips), and each frame is split into one tile-row slice per
    `row` shard.  Between frames, each row shard exchanges its recon
    slab's border rows with its neighbors via lax.ppermute — the
    search-range + interpolation-margin halo — and rebuilds its padded
    reference bank locally, instead of replicating full-frame banks.

    Returns a jitted fn(cy (F, S, G, Hg, W) u8, cu, cv, y0 (F, G, Hg, W)
    i32, u0, v0) -> (host_outs (F, S, G, L), recon_y (F, S, G, Hg, W)):
    y0/u0/v0 are the GOP-initial reference planes (the I-frame recon),
    row-sharded like the frames.  One row group per `row` shard
    (G == mesh row size); byte-exactness vs the single-device
    rd_p_rows_pipeline holds for R <= Hg - 7 (halo coverage).
    """
    import jax
    from jax.sharding import PartitionSpec as Pspec
    from jax.experimental.shard_map import shard_map

    n_row = mesh.shape["row"]
    G = n_row
    Hg = H // G
    Hcg = Hg // 2
    assert R + 7 <= Hg and R // 2 + 6 <= Hcg, "halo must cover the search"
    fwd = [(r, r + 1) for r in range(n_row - 1)]
    bwd = [(r, r - 1) for r in range(1, n_row)]

    def _exchange(plane, pad, hloc):
        """plane: (F, h, w) local recon slab; returns (F, h + 2*pad, w)
        extended with up to `hloc` true halo rows from the row
        neighbors (zeros beyond — never read for legal R)."""
        n = min(pad, hloc)
        bot = plane[:, -n:, :]
        top = plane[:, :n, :]
        from_above = jax.lax.ppermute(bot, "row", fwd)
        from_below = jax.lax.ppermute(top, "row", bwd)
        r_idx = jax.lax.axis_index("row")
        edge_top = jnp.repeat(plane[:, :1, :], n, 1)
        edge_bot = jnp.repeat(plane[:, -1:, :], n, 1)
        from_above = jnp.where(r_idx == 0, edge_top, from_above)
        from_below = jnp.where(r_idx == n_row - 1, edge_bot, from_below)
        zpad = jnp.zeros((plane.shape[0], pad - n, plane.shape[2]),
                         plane.dtype)
        return jnp.concatenate(
            [zpad, from_above, plane, from_below, zpad], axis=1)

    def local_step(cy, cu, cv, y0, u0, v0):
        # cy: (Fl, S, 1, Hg, W) — one row group per shard
        Fl = cy.shape[0]
        cy = cy[:, :, 0]
        cu = cu[:, :, 0]
        cv = cv[:, :, 0]

        def bank_of(Y, U, V):
            exty = _exchange(Y, PAD, Hg)
            extu = _exchange(U, PAD, Hcg)
            extv = _exchange(V, PAD, Hcg)
            Ypad = jnp.pad(exty, ((0, 0), (0, 0), (PAD, PAD)), mode="edge")
            bank = jax.vmap(_bank_from_pad)(Ypad)      # (Fl, 4, ., .)
            cpad = jnp.stack([
                jnp.pad(extu, ((0, 0), (0, 0), (PAD, PAD)), mode="edge"),
                jnp.pad(extv, ((0, 0), (0, 0), (PAD, PAD)), mode="edge"),
            ], axis=1)                                  # (Fl, 2, ., .)
            return bank, cpad

        def step(carry, xs):
            Yr, Ur, Vr = carry
            fy, fu, fv = xs  # (Fl, Hg, W) current source frame
            bank, cpad = bank_of(Yr, Ur, Vr)
            outs = jax.vmap(
                lambda a, b, c, bk, cp: rd_p_pipeline(
                    a, b, c, bk[None], cp[None],
                    H=Hg, W=W, R=R, qp=qp, qp_c=qp_c, lam=lam, lam_me=lam)
            )(fy, fu, fv, bank, cpad)
            host_out, recon, _ = outs
            return (recon[0], recon[1], recon[2]), (host_out, recon[0])

        (_, _, _), (host_outs, recon_y) = jax.lax.scan(
            step, (y0[:, 0], u0[:, 0], v0[:, 0]),
            (cy.swapaxes(0, 1), cu.swapaxes(0, 1), cv.swapaxes(0, 1)))
        # (S, Fl, L) -> (Fl, S, 1, L)
        return (host_outs.transpose(1, 0, 2)[:, :, None],
                recon_y.transpose(1, 0, 2, 3)[:, :, None])

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(Pspec("frame", None, "row"), Pspec("frame", None, "row"),
                  Pspec("frame", None, "row"), Pspec("frame", "row"),
                  Pspec("frame", "row"), Pspec("frame", "row")),
        out_specs=(Pspec("frame", None, "row"),
                   Pspec("frame", None, "row")),
        check_rep=False,
    )
    return jax.jit(step)


def rd_p_rows_sharded(mesh, H: int, W: int, R: int, qp: int, qp_c: int,
                      lam: int, G: int):
    """shard_map'd tile-row step over a (frame, row) mesh.

    Returns a jitted fn(cur_y (F,H,W) u8, cur_u, cur_v, banks (F,NR,4,..),
    cpads) -> (host_outs (F,G,L), recon planes, next entries); frames shard
    over `frame`, row groups over `row`, reference banks are replicated
    along `row` (the full-gather form of the halo exchange)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as Pspec
    from jax.experimental.shard_map import shard_map

    n_row = mesh.shape["row"]
    assert G % n_row == 0
    Hg = H // G

    def local_step(cy, cu, cv, banks, cpads):
        # cy: (Fl, Gl, Hg, W); banks: (Fl, NR, 4, Hp, Wp)
        Gl = cy.shape[1]
        r_idx = jax.lax.axis_index("row")
        g00 = r_idx * Gl  # first global group of this shard

        def per_frame(cyf, cuf, cvf, bk, cp):
            def per_group(gl, args):
                cyg, cug, cvg = args
                y0 = (g00 + gl) * Hg
                slab = jax.lax.dynamic_slice(
                    bk, (0, 0, y0, 0),
                    (bk.shape[0], 4, Hg + 2 * PAD, bk.shape[3]))
                cslab = jax.lax.dynamic_slice(
                    cp, (0, 0, y0 // 2, 0),
                    (cp.shape[0], 2, Hg // 2 + 2 * PAD, cp.shape[3]))
                return rd_p_pipeline(
                    cyg, cug, cvg, slab, cslab, H=Hg, W=W, R=R, qp=qp,
                    qp_c=qp_c, lam=lam, lam_me=lam)
            outs = jax.vmap(per_group, in_axes=(0, 0))(
                jnp.arange(Gl), (cyf, cuf, cvf))
            return outs
        outs = jax.vmap(per_frame)(cy, cu, cv, banks, cpads)
        host_outs, recons, entries = outs
        return host_outs, recons

    fspec = NamedSharding(mesh, Pspec("frame", "row"))

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(Pspec("frame", "row"), Pspec("frame", "row"),
                  Pspec("frame", "row"), Pspec("frame"), Pspec("frame")),
        out_specs=((Pspec("frame", "row")),
                   (Pspec("frame", "row"), Pspec("frame", "row"),
                    Pspec("frame", "row"))),
        check_rep=False,  # lax.cond branches mix varying/invariant consts
    )
    return jax.jit(step)
