"""Exact integer transforms (spec §8.5): 4x4/8x8 core, Hadamard DC.

All functions are batched: they accept arrays of shape (..., N, N) and
transform the trailing two axes, so a whole frame's blocks go through one
vectorized call (the TPU-native replacement for the reference's per-block
routines, lencod/src/transform.c:31-420 / ldecod/src/block.c itrans /
ldecod/src/transform8x8.c itrans8x8).  Backend-agnostic int32 code: runs
identically under numpy (host oracle) and jax.numpy (jitted device path).

Convention: axis -2 indexes rows (y), axis -1 columns (x).  A "1-D pass"
transforms along the last axis; rows are handled by swapping the trailing
axes, which is cheap under XLA and keeps one code path.
"""

from __future__ import annotations


def _swap(x):
    return x.swapaxes(-1, -2)


# ---------------------------------------------------------------------------
# 4x4 core transform
# ---------------------------------------------------------------------------

def _fwd4_1d(b):
    """Forward 4-point butterfly along last axis (len 4)."""
    p0, p1, p2, p3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    t0 = p0 + p3
    t1 = p1 + p2
    t2 = p1 - p2
    t3 = p0 - p3
    return _stack_last(t0 + t1, (t3 << 1) + t2, t0 - t1, t3 - (t2 << 1))


def _inv4_1d(b):
    """Inverse 4-point butterfly along last axis (len 4)."""
    w0, w1, w2, w3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    e0 = w0 + w2
    e1 = w0 - w2
    e2 = (w1 >> 1) - w3
    e3 = w1 + (w3 >> 1)
    return _stack_last(e0 + e3, e1 + e2, e1 - e2, e0 - e3)


def _had4_1d(b):
    w0, w1, w2, w3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    e0 = w0 + w2
    e1 = w0 - w2
    e2 = w1 - w3
    e3 = w1 + w3
    return _stack_last(e0 + e3, e1 + e2, e1 - e2, e0 - e3)


def _stack_last(*cols):
    """Stack scalars-per-position back into the last axis."""
    # works for numpy and jnp: all inputs share a namespace via __array_namespace__?
    # simplest portable route: expand + concatenate
    first = cols[0]
    xp = _np_of(first)
    return xp.stack(cols, axis=-1)


def _np_of(a):
    """Return the array module (numpy or jax.numpy) owning `a`."""
    mod = type(a).__module__
    if mod.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    import numpy as np

    return np


def forward4x4(block):
    """2-D forward core transform of (..., 4, 4) residuals.

    Row pass then column pass (order is irrelevant mathematically; the
    scaling is absorbed by quantization)."""
    rows = _fwd4_1d(block)  # transform x within each row
    cols = _fwd4_1d(_swap(rows))
    return _swap(cols)


def inverse4x4(coef):
    """2-D inverse core transform of (..., 4, 4) dequantized coefficients.

    Output is the scaled residual; caller adds prediction<<6 and applies
    rshift_rnd_sf(·, 6) + clip (see recon helpers)."""
    rows = _inv4_1d(coef)  # horizontal first, matching the JM order
    cols = _inv4_1d(_swap(rows))
    return _swap(cols)


def hadamard4x4(block):
    """4x4 Hadamard (both directions), used for luma-DC and SATD."""
    rows = _had4_1d(block)
    cols = _had4_1d(_swap(rows))
    return _swap(cols)


def hadamard2x2(block):
    """2x2 Hadamard of (..., 2, 2) chroma DC arrays (no normalization)."""
    a = block[..., 0, 0]
    b = block[..., 0, 1]
    c = block[..., 1, 0]
    d = block[..., 1, 1]
    xp = _np_of(a)
    top = xp.stack([a + b + c + d, a - b + c - d], axis=-1)
    bot = xp.stack([a + b - c - d, a - b - c + d], axis=-1)
    return xp.stack([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# 8x8 core transform (FRExt)
# ---------------------------------------------------------------------------

def _fwd8_1d(b):
    p = [b[..., i] for i in range(8)]
    s0 = p[0] + p[7]
    s1 = p[1] + p[6]
    s2 = p[2] + p[5]
    s3 = p[3] + p[4]
    b0 = s0 + s3
    b1 = s1 + s2
    b2 = s0 - s3
    b3 = s1 - s2
    d0 = p[0] - p[7]
    d1 = p[1] - p[6]
    d2 = p[2] - p[5]
    d3 = p[3] - p[4]
    b4 = d1 + d2 + ((d0 >> 1) + d0)
    b5 = d0 - d3 - ((d2 >> 1) + d2)
    b6 = d0 + d3 - ((d1 >> 1) + d1)
    b7 = d1 - d2 + ((d3 >> 1) + d3)
    return _stack_last(
        b0 + b1,
        b4 + (b7 >> 2),
        b2 + (b3 >> 1),
        b5 + (b6 >> 2),
        b0 - b1,
        b6 - (b5 >> 2),
        (b2 >> 1) - b3,
        (b4 >> 2) - b7,
    )


def _inv8_1d(m):
    p = [m[..., i] for i in range(8)]
    a0 = p[0] + p[4]
    a4 = p[0] - p[4]
    a2 = (p[2] >> 1) - p[6]
    a6 = p[2] + (p[6] >> 1)
    b0 = a0 + a6
    b2 = a4 + a2
    b4 = a4 - a2
    b6 = a0 - a6
    a1 = -p[3] + p[5] - p[7] - (p[7] >> 1)
    a3 = p[1] + p[7] - p[3] - (p[3] >> 1)
    a5 = -p[1] + p[7] + p[5] + (p[5] >> 1)
    a7 = p[3] + p[5] + p[1] + (p[1] >> 1)
    b1 = a1 + (a7 >> 2)
    b7 = a7 - (a1 >> 2)
    b3 = a3 + (a5 >> 2)
    b5 = (a3 >> 2) - a5
    return _stack_last(
        b0 + b7, b2 + b5, b4 + b3, b6 + b1, b6 - b1, b4 - b3, b2 - b5, b0 - b7
    )


def forward8x8(block):
    """2-D forward 8x8 transform of (..., 8, 8) residuals.

    Horizontal pass then vertical, matching the reference order
    (lencod/src/transform.c:229) — the internal >>1 make the passes
    non-commutative for the 8x8 forward."""
    rows = _fwd8_1d(block)
    cols = _fwd8_1d(_swap(rows))
    return _swap(cols)


def inverse8x8(coef):
    """2-D inverse 8x8 transform; horizontal pass then vertical."""
    rows = _inv8_1d(coef)
    cols = _inv8_1d(_swap(rows))
    return _swap(cols)
