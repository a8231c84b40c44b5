"""Quantization / dequantization with exact JM arithmetic.

The normative scale tables (spec §8.5.9, Tables for normAdjust4x4 /
normAdjust8x8 and the encoder MF tables) are generated from their
6-values-per-position-class structure rather than stored as matrices.
Dequant semantics match the reference decoder exactly
(ldecod/src/macroblock.c:3179/2699, block.c itrans_2, chroma-DC path
macroblock.c:3838-3857).

All batched functions accept (..., N, N) int32 arrays.
"""

from __future__ import annotations

import numpy as np

from .exact import rshift_rnd, rshift_rnd_sf

# ---------------------------------------------------------------------------
# table generation from position classes
# ---------------------------------------------------------------------------

# 4x4 position classes: 0 = both coords even, 1 = both odd, 2 = mixed
_CLASS4 = np.array(
    [[0 if (i % 2 == 0 and j % 2 == 0) else 1 if (i % 2 and j % 2) else 2
      for j in range(4)] for i in range(4)]
)

# normAdjust4x4 (dequant) per qp%6, per class
_V4 = np.array(
    [[10, 16, 13], [11, 18, 14], [13, 20, 16], [14, 23, 18], [16, 25, 20], [18, 29, 23]]
)
# encoder MF (quant) per qp%6, per class
_M4 = np.array(
    [
        [13107, 5243, 8066],
        [11916, 4660, 7490],
        [10082, 4194, 6554],
        [9362, 3647, 5825],
        [8192, 3355, 5243],
        [7282, 2893, 4559],
    ]
)


def _class8(i: int, j: int) -> int:
    if i % 4 == 0 and j % 4 == 0:
        return 0
    if i % 2 == 1 and j % 2 == 1:
        return 1
    if i % 4 == 2 and j % 4 == 2:
        return 2
    if (i % 4 == 0 and j % 2 == 1) or (i % 2 == 1 and j % 4 == 0):
        return 3
    if (i % 4 == 0 and j % 4 == 2) or (i % 4 == 2 and j % 4 == 0):
        return 4
    return 5


_CLASS8 = np.array([[_class8(i, j) for j in range(8)] for i in range(8)])

_V8 = np.array(
    [
        [20, 18, 32, 19, 25, 24],
        [22, 19, 35, 21, 28, 26],
        [26, 23, 42, 24, 33, 31],
        [28, 25, 45, 26, 35, 33],
        [32, 28, 51, 30, 40, 38],
        [36, 32, 58, 34, 46, 43],
    ]
)
_M8 = np.array(
    [
        [13107, 11428, 20972, 12222, 16777, 15481],
        [11916, 10826, 19174, 11058, 14980, 14290],
        [10082, 8943, 15978, 9675, 12710, 11985],
        [9362, 8228, 14913, 8931, 11984, 11259],
        [8192, 7346, 13159, 7740, 10486, 9777],
        [7282, 6428, 11570, 6830, 9118, 8640],
    ]
)

# (6, 4, 4) and (6, 8, 8) int32 tables
DEQUANT4 = _V4[:, _CLASS4].astype(np.int32)
QUANT4 = _M4[:, _CLASS4].astype(np.int32)
DEQUANT8 = _V8[:, _CLASS8].astype(np.int32)
QUANT8 = _M8[:, _CLASS8].astype(np.int32)

FLAT_SCALE_16 = np.full((4, 4), 16, dtype=np.int32)
FLAT_SCALE_64 = np.full((8, 8), 16, dtype=np.int32)

Q_BITS_4 = 15
Q_BITS_8 = 16


def _is_static(qp) -> bool:
    """True when qp is a plain Python/numpy integer (host numpy path);
    False for traced jax scalars (device path — tables become gathers,
    shifts become dynamic, so ONE executable serves every QP)."""
    return isinstance(qp, (int, np.integer))


def _gather6(table6, rem):
    """table6[rem] for static or traced rem (table6: (6, N, N) numpy)."""
    if _is_static(rem):
        return table6[rem]
    import jax.numpy as jnp

    return jnp.asarray(table6)[rem]


def inv_level_scale4(qp_rem: int, weight_scale: np.ndarray | None = None) -> np.ndarray:
    """InvLevelScale4x4 = normAdjust * weightScale (flat 16 by default)."""
    w = FLAT_SCALE_16 if weight_scale is None else np.asarray(weight_scale, np.int32)
    return _gather6(DEQUANT4, qp_rem) * w


def inv_level_scale8(qp_rem: int, weight_scale: np.ndarray | None = None) -> np.ndarray:
    w = FLAT_SCALE_64 if weight_scale is None else np.asarray(weight_scale, np.int32)
    return _gather6(DEQUANT8, qp_rem) * w


# ---------------------------------------------------------------------------
# decoder-side dequant (exact JM formulas)
# ---------------------------------------------------------------------------

def dequant4x4(levels, qp: int, weight_scale=None):
    """AC 4x4 dequant: rshift_rnd_sf((lev * ILS) << qp_per, 4).

    `levels`: (..., 4, 4) int32. Returns dequantized coefficients ready
    for inverse4x4.  (ldecod/src/macroblock.c:3179)"""
    per, rem = qp // 6, qp % 6
    ils = inv_level_scale4(rem, weight_scale)
    xp_ils = levels * 0 + ils  # broadcast to backend of `levels`
    return rshift_rnd_sf((levels * xp_ils) << per, 4)


def dequant8x8(levels, qp: int, weight_scale=None):
    """AC 8x8 dequant: rshift_rnd_sf((lev * ILS8) << qp_per, 6).
    (ldecod/src/macroblock.c:2699)"""
    per, rem = qp // 6, qp % 6
    ils = inv_level_scale8(rem, weight_scale)
    xp_ils = levels * 0 + ils
    return rshift_rnd_sf((levels * xp_ils) << per, 6)


def dequant_luma_dc(dc_hadamard, qp: int, weight_scale=None):
    """Luma 16x16 DC dequant applied AFTER the inverse 4x4 Hadamard:
    rshift_rnd((dc * ILS[0,0]) << qp_per, 6).  (ldecod/src/block.c itrans_2)"""
    per, rem = qp // 6, qp % 6
    ils00 = inv_level_scale4(rem, weight_scale)[0, 0]
    return rshift_rnd((dc_hadamard * ils00) << per, 6)


def dequant_chroma_dc(dc_hadamard, qp_c: int, weight_scale=None):
    """Chroma DC (4:2:0) dequant after the 2x2 Hadamard:
    (t * ILS[0,0]) >> (5 - per) if per < 5 else << (per - 5)   — truncating!
    (ldecod/src/macroblock.c:3844-3853)"""
    per, rem = qp_c // 6, qp_c % 6
    ils00 = inv_level_scale4(rem, weight_scale)[0, 0]
    t = dc_hadamard * ils00
    if _is_static(qp_c):
        if per < 5:
            return t >> (5 - per)
        return t << (per - 5)
    import jax.numpy as jnp

    return jnp.where(per < 5,
                     t >> jnp.maximum(5 - per, 0),
                     t << jnp.maximum(per - 5, 0))


# ---------------------------------------------------------------------------
# encoder-side quant (JM lencod/src/block.c:843 dct_4x4 semantics)
# ---------------------------------------------------------------------------

def quant4x4(coefs, qp: int, offset, weight_scale=None):
    """level = sign(c) * ((|c| * MF + offset) >> qbits).

    `offset` is the rounding offset matrix already scaled to qbits
    (JM LevelOffset4x4: base (intra ? 682 : 342) << (qbits - 11), i.e.
    ~1/3, ~1/6 of the step).  Returns int32 levels."""
    per, rem = qp // 6, qp % 6
    qbits = Q_BITS_4 + per
    mf = (_gather6(QUANT4, rem) if weight_scale is None
          else _gather6(_mf_weighted6(QUANT4, weight_scale, 4), rem))
    c = coefs
    ac = abs(c)
    lev = (ac * (c * 0 + mf) + offset) >> qbits
    return _copysign(lev, c)


def quant8x8(coefs, qp: int, offset, weight_scale=None):
    per, rem = qp // 6, qp % 6
    qbits = Q_BITS_8 + per
    mf = (_gather6(QUANT8, rem) if weight_scale is None
          else _gather6(_mf_weighted6(QUANT8, weight_scale, 8), rem))
    c = coefs
    ac = abs(c)
    lev = (ac * (c * 0 + mf) + offset) >> qbits
    return _copysign(lev, c)


def default_offset4(qp: int, intra: bool):
    """JM default rounding offset (q_offsets.c OffsetList defaults):
    intra 682/2048, inter 342/2048 of the quantization step, scaled to
    qbits = 15 + qp/6."""
    per = qp // 6
    base = 682 if intra else 342
    if _is_static(qp):
        return np.int32(base << (Q_BITS_4 + per - 11))
    import jax.numpy as jnp

    return jnp.int32(base) << (Q_BITS_4 + per - 11)


def default_offset8(qp: int, intra: bool):
    per = qp // 6
    base = 682 if intra else 342
    if _is_static(qp):
        return np.int32(base << (Q_BITS_8 + per - 11))
    import jax.numpy as jnp

    return jnp.int32(base) << (Q_BITS_8 + per - 11)


def quant_luma_dc(dc_hadamard, qp: int, intra: bool = True, weight_scale=None):
    """Quantize the 4x4 Hadamard of luma DC: (|c| * MF00 + 2*offset) >> (qbits+1)."""
    per, rem = qp // 6, qp % 6
    qbits = Q_BITS_4 + per
    mf6 = (QUANT4 if weight_scale is None
           else _mf_weighted6(QUANT4, weight_scale, 4))
    mf00 = _gather6(mf6, rem)[0, 0]
    offset = default_offset4(qp, intra) * 2
    c = dc_hadamard
    lev = (abs(c) * mf00 + offset) >> (qbits + 1)
    return _copysign(lev, c)


def quant_chroma_dc(dc_hadamard, qp_c: int, intra: bool, weight_scale=None):
    """Quantize 2x2 chroma DC Hadamard: (|c| * MF00 + 2*offset) >> (qbits+1)."""
    per, rem = qp_c // 6, qp_c % 6
    qbits = Q_BITS_4 + per
    mf6 = (QUANT4 if weight_scale is None
           else _mf_weighted6(QUANT4, weight_scale, 4))
    mf00 = _gather6(mf6, rem)[0, 0]
    offset = default_offset4(qp_c, intra) * 2
    c = dc_hadamard
    lev = (abs(c) * mf00 + offset) >> (qbits + 1)
    return _copysign(lev, c)


def _copysign(mag, src):
    """mag * sign(src) without importing a backend: works via arithmetic."""
    neg = src < 0
    return mag - (mag << 1) * neg  # mag or -mag


def _mf_weighted(mf_flat, weight_scale, n: int):
    """Encoder MF under a custom scaling matrix: MF = base*16 / w with
    truncating division, matching JM exactly (q_matrix.c
    CalculateQuantParam: LevelScale = (quant_coef<<4)/ScalingList)."""
    w = np.asarray(weight_scale, np.int64)
    return ((mf_flat.astype(np.int64) << 4) // w).astype(np.int32)


def _mf_weighted6(mf6, weight_scale, n: int):
    """All-rem weighted MF table (6, n, n) — weight_scale must be a
    concrete (config-time) matrix even when qp is traced."""
    return np.stack([_mf_weighted(mf6[r], weight_scale, n) for r in range(6)])
