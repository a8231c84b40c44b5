"""Exact-integer helpers shared by all pixel kernels.

Fixed-point discipline (SURVEY.md §7.1): every reconstruction-path kernel
is int32 with the precise C rounding/clipping semantics of the reference
(ldecod/inc/ifunctions.h rshift_rnd / rshift_rnd_sf / iClip1).  All
helpers are backend-agnostic: they use only operators and methods that
numpy and jax.numpy arrays share, so the same code is the host oracle and
the jitted device kernel.

Note on shifts: ``x >> n`` on int32 is an arithmetic shift in numpy, JAX
and C (for the compilers the reference targets) — negative values round
toward -inf, which is exactly the semantics the H.264 butterflies rely on.
"""

from __future__ import annotations


def rshift_rnd_sf(x, a: int):
    """(x + 2^(a-1)) >> a  — shift with round-half-up (a >= 1, static)."""
    return (x + (1 << (a - 1))) >> a


def rshift_rnd(x, a: int):
    """rshift_rnd_sf for a>0; left shift for a<=0 (a static)."""
    if a > 0:
        return (x + (1 << (a - 1))) >> a
    return x << (-a)


def clip1(x, max_val: int):
    """Clip to [0, max_val] (pixel clip; max_val = (1<<bitdepth)-1)."""
    return x.clip(0, max_val)


def clip3(x, lo, hi):
    return x.clip(lo, hi)


def qp_per_rem(qp: int) -> tuple[int, int]:
    """(qp/6, qp%6) — python ints, always non-negative in our use."""
    return qp // 6, qp % 6


# Chroma QP mapping, spec Table 8-15 (indices 30..51 are non-linear).
QP_SCALE_CR = (
    list(range(30))
    + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39]
)


def chroma_qp(qp_luma: int, chroma_qp_offset: int, bitdepth_chroma_qp_scale: int = 0) -> int:
    """Derive chroma QP from luma QP + PPS offset (spec §8.5.8)."""
    qp = max(-bitdepth_chroma_qp_scale, min(51, qp_luma + chroma_qp_offset))
    return qp if qp < 0 else QP_SCALE_CR[qp]


_QP_SCALE_CR_ARR = None


def chroma_qp_vec(qps, chroma_qp_offset: int):
    """Vectorized chroma_qp over an int array (8-bit depth)."""
    import numpy as np

    global _QP_SCALE_CR_ARR
    if _QP_SCALE_CR_ARR is None:
        _QP_SCALE_CR_ARR = np.asarray(QP_SCALE_CR, np.int32)
    q = np.minimum(51, np.asarray(qps) + chroma_qp_offset)
    return np.where(q < 0, q, _QP_SCALE_CR_ARR[np.maximum(q, 0)])
